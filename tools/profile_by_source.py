"""Join an existing /tmp/pcp_trace xplane with /tmp/train_step_hlo.txt to
aggregate device op self-time by SOURCE LOCATION — attributes the long
tail of sub-0.1 ms ops that per-op views hide.

Run tools/profile_ops.py (writes the trace) and tools/dump_hlo.py (writes
the HLO with metadata) first; this script is pure post-processing.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/profile_by_source.py [iters]
"""

from __future__ import annotations

import glob
import os
import re
import sys

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
TOP = 40


def main():
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    # op name -> (source, op_kind) from the HLO dump
    src = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\".*?source_line=(\d+))?")
    with open("/tmp/train_step_hlo.txt") as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, op_name, sf, sl = m.groups()
            if sf:
                loc = f"{sf.replace('/root/repo/', '')}:{sl}"
            else:
                loc = "(no source)"
            src[name] = (loc, op_name.split("/")[-1])

    agg = {}
    for path in glob.glob("/tmp/pcp_trace/**/*.xplane.pb", recursive=True):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if not ("TPU" in plane.name or "/device:" in plane.name
                    or "Device" in plane.name
                    or "axon" in plane.name.lower()):
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = (md.display_name or md.name) if md else "?"
                    loc, kind = src.get(
                        name.lstrip("%"), (f"(unmapped) {name[:40]}", ""))
                    e = agg.setdefault((loc, kind), [0, 0.0])
                    e[0] += 1
                    e[1] += ev.duration_ps / 1e9

    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    tot = sum(v[1] for v in agg.values())
    print(f"total XLA-op self ms/it {tot / ITERS:.2f}")
    for (loc, kind), (occ, ms) in rows[:TOP]:
        print(f"{ms / ITERS:8.3f} ms/it x{occ:<6} {loc:48} {kind[:40]}")


if __name__ == "__main__":
    main()
