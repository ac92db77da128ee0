"""Babysitter for the scale quality run on a flaky chip tunnel.

The round-4 chip wedged repeatedly mid-run (client futex-stuck on a
device call that never returns; a fresh process then hangs on trivial
programs for ~10-20 min until the tunnel recovers). This wrapper makes
the long run survive that without attention:

  launch `quality_scale_run --phase <phase>` ->
  watch the newest train_log.jsonl under the block dir ->
  if no progress for --stall_s seconds: kill the child, probe the chip
  with a tiny program until it answers, relaunch (the train CLI resumes
  from the newest chkpnt*.npz automatically).

Exits when the child exits 0 (phase complete) or --deadline (HH:MM,
local) passes — at the deadline it touches STOP in the output dir so
the loop saves a resumable checkpoint + PLY and exits cleanly, then
waits for the child.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_watchdog.py \
           --phase train [--iters 30000] [--deadline 03:20] [--root /tmp/scale_scene]
"""

from __future__ import annotations

import argparse
import datetime as dt
import glob
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_log_mtime(root, phase="train"):
    """Newest progress artifact. Train/control phases write
    train_log.jsonl every 100 iters; other phases (scene/partition/
    eval) write no train log, so also watch their artifacts — without
    this the watchdog SIGKILLs a healthy eval child forever
    (ADVICE r4 #4)."""
    pats = [os.path.join(
        root, "model", "split_result", "visible", "*", "partition_*",
        "output_*", "train_log.jsonl")]
    if phase not in ("train", "control"):
        pats += [
            os.path.join(root, "*.npz"),
            os.path.join(root, "*.json"),
            os.path.join(root, "sparse", "0", "*.bin"),
            os.path.join(root, "images", "*.png"),
            os.path.join(root, "model", "partition_data.pkl"),
            os.path.join(root, "model", "split_result", "visible", "*",
                         "partition_*", "output_*", "*.json"),
            os.path.join(root, "model", "split_result", "visible", "*",
                         "partition_*", "output_*", "renders*", "*"),
            os.path.join(REPO, "QUALITY_*.json"),
        ]
    mt = 0.0
    for p in pats:
        mt = max(mt, max((os.path.getmtime(f) for f in glob.glob(p)),
                         default=0.0))
    return mt


def chip_ok(timeout=75):
    code = (
        "import jax, jax.numpy as jnp;"
        "print(int(jnp.sum(jnp.arange(1000))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout,
            capture_output=True, text=True,
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:/root/.axon_site"})
        return r.returncode == 0 and "499500" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def stop_files(root):
    return glob.glob(os.path.join(
        root, "model", "split_result", "visible", "*", "partition_*",
        "output_*"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="train")
    ap.add_argument("--root", default="/tmp/scale_scene")
    ap.add_argument("--iters", type=int, default=30_000)
    ap.add_argument("--control_iters", type=int, default=0)
    # must exceed the worst healthy gap between train_log writes: remote
    # compiles after a (re-)tune or fresh launch run 10-15 min
    ap.add_argument("--stall_s", type=float, default=960.0)
    ap.add_argument("--deadline", default="",
                    help="HH:MM local; touch STOP and wind down after this")
    args = ap.parse_args()

    deadline = None
    if args.deadline:
        hh, mm = map(int, args.deadline.split(":"))
        now = dt.datetime.now()
        deadline = now.replace(hour=hh, minute=mm, second=0, microsecond=0)
        if deadline < now:
            deadline += dt.timedelta(days=1)

    cmd = [sys.executable, "-u",
           os.path.join(REPO, "tools", "quality_scale_run.py"),
           "--phase", args.phase, "--root", args.root,
           "--iters", str(args.iters)]
    if args.control_iters:
        cmd += ["--control_iters", str(args.control_iters)]

    attempt = 0
    while True:
        attempt += 1
        # a leftover STOP from a previous wind-down would stop the
        # resumed run within 50 iters
        for d in stop_files(args.root):
            sp = os.path.join(d, "STOP")
            if os.path.exists(sp):
                os.remove(sp)
        child_start = time.time()
        print(f"[watchdog] attempt {attempt}: {' '.join(cmd[2:])}",
              flush=True)
        child = subprocess.Popen(
            cmd, env={**os.environ,
                      "PYTHONPATH": f"{REPO}:/root/.axon_site"})
        stopped = False
        while True:
            try:
                rc = child.wait(timeout=60)
                break
            except subprocess.TimeoutExpired:
                rc = None
            now = time.time()
            if deadline and dt.datetime.now() >= deadline and not stopped:
                print("[watchdog] deadline: touching STOP", flush=True)
                for d in stop_files(args.root):
                    open(os.path.join(d, "STOP"), "w").close()
                stopped = True
            stall = now - max(newest_log_mtime(args.root, args.phase),
                              child_start)
            if stall > args.stall_s:
                print(f"[watchdog] no progress for {stall:.0f}s: killing "
                      f"child {child.pid}", flush=True)
                child.send_signal(signal.SIGKILL)
                child.wait()
                rc = -9
                break
        if rc == 0:
            print("[watchdog] phase complete", flush=True)
            return
        if stopped:
            print("[watchdog] stopped at deadline", flush=True)
            return
        # wedged or crashed: wait for the chip to answer again
        print(f"[watchdog] child exited rc={rc}; probing chip", flush=True)
        while not chip_ok():
            print("[watchdog] chip not ready; waiting 150s", flush=True)
            time.sleep(150)
        print("[watchdog] chip ok; relaunching", flush=True)


if __name__ == "__main__":
    main()
