"""Opt-in real-TPU parity test (PCP_TPU_TESTS=1): the fused Mosaic kernel
must match the XLA composite on the actual chip. The main suite forces a
CPU backend (Pallas interpret mode), which cannot catch Mosaic-only
regressions — this runs tools/tpu_parity_check.py in a fresh process with
the TPU plugin visible."""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    not os.environ.get("PCP_TPU_TESTS"),
    reason="set PCP_TPU_TESTS=1 to run real-chip parity (needs TPU + ~2 min)",
)
def test_fused_kernel_matches_xla_on_tpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin register
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "tpu_parity_check.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PARITY OK" in out.stdout or "no TPU backend" in out.stdout
