"""Per-stage FLOP/byte budget for the train step (VERDICT r3 item 7).

Gives `vs_baseline` an arithmetic footing beyond the 20 it/s CUDA
anecdote: for a given geometry (capacity, table slots, resolution) it
models the dominant memory streams and FLOP counts per stage, converts
them to speed-of-light times at v5e peaks, and reports measured/ideal so
the scale gap decomposes into irreducible traffic vs sizing-policy and
lowering overhead.

v5e peaks used (same constants as PERF_NOTES' roofline section):
  HBM   819 GB/s
  VPU   ~0.9 TFLOP/s f32 (8x128 lanes, vector ops)
  MXU   197 TFLOP/s bf16

The model intentionally counts only first-order streams (it reproduces
the PERF_NOTES hand analysis at bench scale); XLA's actual lowerings for
sort/gather/scatter run 10-100 ns per ELEMENT, far off these floors —
that structural distance, not the model's ~20% slack, is the story.

Usage:
    python tools/roofline.py            # table at canonical + scale points
    from tools.roofline import budget   # bench.py embeds the summary
"""

from __future__ import annotations

import json

HBM_BPS = 819e9
VPU_FLOPS = 0.9e12
MXU_FLOPS = 197e12

ATTRS = 59          # xyz 3 + f_dc 3 + f_rest 45 + scaling 3 + rot 4 + op 1
NA = 9              # composite attribute planes (mx,my,ca,cb,cc,r,g,b,op)
PIX_PER_TILE = 256  # 16x16
F = 4               # f32 bytes


def _ms(bytes_, vpu=0.0, mxu=0.0):
    return max(bytes_ / HBM_BPS, vpu / VPU_FLOPS, mxu / MXU_FLOPS) * 1e3


def budget(capacity: int, slots: int, key_slots: int, n_pairs: int,
           width: int, height: int) -> dict:
    """Per-stage {bytes, vpu_flops, mxu_flops, ideal_ms} for one train
    step at the given geometry.

    capacity   Gaussian slot capacity (params axis)
    slots      composite table slots (sum over levels of tiles_i * k_i)
    key_slots  binning expansion key slots (sorted length)
    n_pairs    true (tile, gaussian) pairs this view
    """
    n, s, ks = capacity, slots, key_slots
    pix = width * height
    slotpix = s * PIX_PER_TILE

    stages = {
        # read params fwd+bwd, write prep planes + param grads
        "preprocess": dict(
            bytes=n * ATTRS * F * 3 + n * 20 * F,
            vpu=n * 600.0),
        # expansion writes (key, payload) once; radix-ideal sort = 8
        # passes read+write (XLA's bitonic network measures ~3.5 ns/key,
        # ~10x this floor)
        "binning_sort": dict(
            bytes=ks * 8 * 2 + ks * 8 * 2 * 8,
            vpu=ks * 20.0),
        # att gather: write the (NA, slots) table, read 36 B rows
        # (gather-unit cost ~11-25 ns/index is the real limiter)
        "att_gather": dict(
            bytes=s * NA * F * 2,
            vpu=0.0),
        # per-slot-pixel op floors: fwd ~12 VPU flops (power, exp, blend;
        # the moment/scan matmuls ride the MXU at ~768 flops/slot-pixel),
        # bwd ~20 (suffix products, 9 plane grads; early-exit gating keeps
        # the executed count below the nominal 2x fwd). The measured Pallas
        # kernels sit ~1.2-1.5x above these floors (PERF_NOTES) — they are
        # the one stage family already near light speed.
        "kernel_fwd": dict(
            bytes=s * NA * F + pix * 5 * F,
            vpu=slotpix * 12.0,
            mxu=slotpix * 768.0),
        "kernel_bwd": dict(
            bytes=s * NA * F * 2 + pix * 8 * F,
            vpu=slotpix * 20.0,
            mxu=slotpix * 1536.0),
        # segsum grad reduction: (slots+capacity)-key sort + 9-plane
        # cumsum + boundary gathers
        "grad_reduce": dict(
            bytes=(s + n) * 8 * 2 * 8 + (s + n) * NA * F * 3 + n * NA * F,
            vpu=(s + n) * NA * 2.0),
        # appearance CNN (bf16 full-res tail) + SSIM shift-add convs + L1
        "appearance_loss": dict(
            bytes=int(pix * 16 * 2 * 4 + pix * 3 * F * 14),
            vpu=pix * 3 * 140.0,
            mxu=pix * 16 * 16 * 9 * 2 * 2.0),
        # Adam: read p,g,m,v; write p',m',v'
        "adam": dict(
            bytes=n * ATTRS * F * 7,
            vpu=n * ATTRS * 12.0),
    }
    out = {}
    for k, v in stages.items():
        b = float(v["bytes"])
        vp = float(v.get("vpu", 0.0))
        mx = float(v.get("mxu", 0.0))
        out[k] = {
            "MB": round(b / 1e6, 1),
            "gflop_vpu": round(vp / 1e9, 2),
            "gflop_mxu": round(mx / 1e9, 2),
            "ideal_ms": round(_ms(b, vp, mx), 3),
        }
    total = {
        "MB": round(sum(v["MB"] for v in out.values()), 1),
        "gflop_vpu": round(sum(v["gflop_vpu"] for v in out.values()), 2),
        "gflop_mxu": round(sum(v["gflop_mxu"] for v in out.values()), 2),
        "ideal_ms": round(sum(v["ideal_ms"] for v in out.values()), 2),
    }
    return {
        "stages": out,
        "speed_of_light_ms": total["ideal_ms"],
        "hbm_MB_per_step": total["MB"],
        "gflop_vpu": total["gflop_vpu"],
        "gflop_mxu": total["gflop_mxu"],
        "slots": s,
        "useful_pairs": n_pairs,
        "slot_efficiency": round(n_pairs / max(s, 1), 3),
        "peaks": {"hbm_GBps": HBM_BPS / 1e9, "vpu_TFLOPs": VPU_FLOPS / 1e12,
                  "mxu_TFLOPs_bf16": MXU_FLOPS / 1e12},
    }


def summarize(measured_ms: float, **kw) -> dict:
    b = budget(**kw)
    b["measured_ms"] = measured_ms
    b["sol_fraction"] = round(b["speed_of_light_ms"] / measured_ms, 3) \
        if measured_ms else None
    return b


if __name__ == "__main__":
    # canonical bench point (131k cap, ~80.7k live, 800x600, K=512-ish
    # two-level: slots ~1.0M, key slots 3.7M, pairs 726k, measured 41 ms)
    print("canonical 100k/800x600 (measured ~41 ms):")
    print(json.dumps(summarize(
        41.0, capacity=131072, slots=1_000_000, key_slots=3_700_000,
        n_pairs=726_000, width=800, height=600), indent=1))
    # reference scale point (2^21 cap, 719k live, 1280x800, fold-geometry
    # slots 2.84M, key slots 6.0M, pairs 1.87M, measured 428.5 ms segsum)
    print("\nscale 719k/1280x800/2^21 (measured 428.5 ms):")
    print(json.dumps(summarize(
        428.5, capacity=1 << 21, slots=2_838_528, key_slots=6_003_200,
        n_pairs=1_874_469, width=1280, height=800), indent=1))
