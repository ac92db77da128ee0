"""Two-process jax.distributed dryrun of `auto_train --distributed`.

VERDICT round-2 item 7: the --distributed path had only unit-tested
mesh/slice arithmetic; this actually boots a TWO-PROCESS jax.distributed
runtime (CPU backend, localhost coordinator) and drives the real
auto_train CLI in both processes over a shared synthetic partition tree —
each process initializes the collective runtime, claims its disjoint
block slice, trains it, and the shared manifest ends fully 'done'.

Run (no chip needed): python tools/distributed_dryrun.py
Writes DISTRIBUTED_DRYRUN.json at the repo root.

Reference frame: the reference has no distributed backend at all
(SURVEY §2.4) — auto_train.py:45-48 shells out sequentially on one GPU;
this is the TPU-native multi-host generalisation (jax.distributed +
shared-filesystem hand-off).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 29817

_WORKER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

from pcp_tpu.cli import auto_train

auto_train.main([
    "--base_path", {visible!r},
    "--sequential", "--distributed",
    "--iterations", "60",
    "--capacity", "256", "--max_per_tile", "128",
    "--resolution", "1", "--no_appearance",
    "--densify_from_iter", "600",
])
print(json.dumps({{
    "process_id": jax.process_index(),
    "process_count": jax.process_count(),
    "global_devices": len(jax.devices()),
    "local_devices": len(jax.local_devices()),
}}))
"""


def main():
    import numpy as np

    sys.path.insert(0, REPO)
    from pcp_tpu.cli import partition
    from tests.synthetic import write_synthetic_scene

    scene = "/tmp/dist_dryrun_scene"
    if not os.path.isdir(os.path.join(scene, "sparse")):
        os.makedirs(scene, exist_ok=True)
        write_synthetic_scene(scene, np.random.default_rng(21),
                              n_points=900, n_cams=16, W=64, H=48)
    model_dir = os.path.join(scene, "model")
    if not os.path.exists(os.path.join(model_dir, "partition_data.pkl")):
        partition.main([scene, "--threshold", "220",
                        "--expansion_distance", "6",
                        "--visible_rate", "0.25", "--no_plots"])
    visible = os.path.join(model_dir, "split_result", "visible")
    manifest_path = os.path.join(visible, "train_status.json")
    if os.path.exists(manifest_path):
        os.remove(manifest_path)

    worker = _WORKER.format(repo=REPO, visible=visible)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # CPU-only children; no axon plugin
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{PORT}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    ok = True
    for pid, pr in enumerate(procs):
        out, err = pr.communicate(timeout=1200)
        ok &= pr.returncode == 0
        tail = [ln for ln in out.splitlines() if ln.strip()]
        info = next((json.loads(ln) for ln in reversed(tail)
                     if ln.startswith("{")), None)
        slice_line = next((ln for ln in tail if "owns blocks" in ln), "")
        outs.append({"process": pid, "returncode": pr.returncode,
                     "runtime": info, "slice": slice_line,
                     "stderr_tail": err.splitlines()[-3:]
                     if pr.returncode else []})
        print(f"proc {pid}: rc={pr.returncode} {slice_line} {info}")

    manifest = json.load(open(manifest_path))
    done = {k: v["status"] for k, v in manifest.items()}
    all_done = all(s == "done" for s in done.values())
    result = {
        "ok": bool(ok and all_done and len(done) >= 2
                   and all(o["runtime"] and o["runtime"]["process_count"] == 2
                           for o in outs)),
        "blocks": done,
        "processes": outs,
    }
    out_path = os.path.join(REPO, "DISTRIBUTED_DRYRUN.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"ok": result["ok"], "blocks": done,
                      "written": out_path}))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
