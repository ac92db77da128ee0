"""Torch-free .pth ingestion for LPIPS weights.

Authors REAL torch zip checkpoints with torch.save (torch is available in
the test environment; the production reader must not import it), then
verifies eval/torch_pth.load_pth reproduces every tensor bit-exactly and
that the LPIPS pipeline (convert -> make_lpips -> metric) runs end to end
from the .pth files alone. Reference: lpipsPyTorch/__init__.py:6-30,
lpipsPyTorch/modules/lpips.py:1-36."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fake_alexnet_sd(rng):
    """torchvision-alexnet-shaped features state_dict (random weights)."""
    shapes = {  # conv position -> (O, I, k)
        0: (64, 3, 11),
        3: (192, 64, 5),
        6: (384, 192, 3),
        8: (256, 384, 3),
        10: (256, 256, 3),
    }
    sd = {}
    for ci, (o, i, k) in shapes.items():
        sd[f"features.{ci}.weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05)
        sd[f"features.{ci}.bias"] = torch.tensor(
            rng.standard_normal(o).astype(np.float32) * 0.05)
    return sd


def _fake_lins_sd(rng):
    chans = [64, 192, 384, 256, 256]
    return {
        f"lin{i}.model.1.weight": torch.tensor(
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32))
        for i, c in enumerate(chans)
    }


def test_load_pth_bit_exact(tmp_path):
    from pcp_tpu.eval.torch_pth import load_pth

    rng = np.random.default_rng(0)
    sd = _fake_alexnet_sd(rng)
    # add assorted dtypes + a non-contiguous tensor + a scalar
    sd["extra.double"] = torch.tensor(rng.standard_normal((5, 7)))
    sd["extra.long"] = torch.tensor(
        rng.integers(-(1 << 40), 1 << 40, (3, 4)))
    sd["extra.bool"] = torch.tensor(
        rng.integers(0, 2, (8,)).astype(bool))
    sd["extra.noncontig"] = torch.tensor(
        rng.standard_normal((6, 8)).astype(np.float32)).t()
    sd["extra.bf16"] = torch.tensor(
        rng.standard_normal((4, 4)).astype(np.float32)).to(torch.bfloat16)
    sd["extra.scalar"] = torch.tensor(3.25)
    p = str(tmp_path / "w.pth")
    torch.save(sd, p)

    flat = load_pth(p)
    for k, v in sd.items():
        got = flat[k]
        if v.dtype == torch.bfloat16:
            np.testing.assert_array_equal(got, v.float().numpy())
        else:
            np.testing.assert_array_equal(got, v.numpy())


def test_load_pth_rejects_arbitrary_globals(tmp_path):
    import pickle
    import zipfile

    from pcp_tpu.eval.torch_pth import load_pth

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    p = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(Exception) as e:
        load_pth(p)
    assert "refusing" in str(e.value) or "unpickl" in str(e.value).lower()


def test_lpips_from_pth_end_to_end(tmp_path):
    """convert_torch_weights + make_lpips on .pth files, no torchvision:
    identical images score ~0, different images score > 0."""
    from pcp_tpu.eval.lpips import convert_torch_weights, make_lpips

    rng = np.random.default_rng(1)
    alex_p = str(tmp_path / "alexnet.pth")
    lins_p = str(tmp_path / "alex_lins.pth")
    torch.save(_fake_alexnet_sd(rng), alex_p)
    torch.save(_fake_lins_sd(rng), lins_p)

    npz_p = str(tmp_path / "lpips.npz")
    convert_torch_weights(npz_p, alexnet_pth=alex_p, lpips_pth=lins_p)
    fn_npz = make_lpips(npz_p)
    assert fn_npz is not None

    # direct comma-joined .pth loading must agree with the converted npz
    fn_pth = make_lpips(f"{alex_p},{lins_p}")
    assert fn_pth is not None

    img1 = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.2, img1.shape), 0, 1).astype(
        np.float32)
    same = float(fn_pth(img1, img1))
    diff = float(fn_pth(img1, img2))
    assert abs(same) < 1e-6
    assert diff > 1e-5
    np.testing.assert_allclose(float(fn_npz(img1, img2)), diff, rtol=1e-5)


def test_lpips_incomplete_pth_returns_none(tmp_path, capsys):
    from pcp_tpu.eval.lpips import make_lpips

    rng = np.random.default_rng(2)
    lins_p = str(tmp_path / "only_lins.pth")
    torch.save(_fake_lins_sd(rng), lins_p)
    assert make_lpips(lins_p) is None
