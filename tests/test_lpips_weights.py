"""Torch-free .pth ingestion for LPIPS weights.

Fixtures are authored with the pure-stdlib zip+pickle writer in
tests/pth_writer.py (NOT torch.save), so eval/torch_pth.load_pth is
exercised in torch-free environments — the production constraint it exists
for. When a real torch is importable, an extra cross-check asserts
torch.load round-trips the stdlib-written file and load_pth round-trips a
torch.save-written one. Reference: lpipsPyTorch/__init__.py:6-30,
lpipsPyTorch/modules/lpips.py:1-36."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.pth_writer import Tensor, bf16_bits_to_f32, f32_to_bf16_bits, \
    save_pth


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
        sd[f"features.{ci}.weight"] = (
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05)
        sd[f"features.{ci}.bias"] = (
            rng.standard_normal(o).astype(np.float32) * 0.05)
    return sd


def _fake_lins_sd(rng):
    chans = [64, 192, 384, 256, 256]
    return {
        f"lin{i}.model.1.weight":
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate(chans)
    }


def test_load_pth_bit_exact(tmp_path):
    from pcp_tpu.eval.torch_pth import load_pth

    rng = np.random.default_rng(0)
    sd = {k: Tensor(v) for k, v in _fake_alexnet_sd(rng).items()}
    # assorted dtypes + a non-contiguous (transposed) tensor + a scalar
    expect = {k: v.array for k, v in sd.items()}

    sd["extra.double"] = Tensor(rng.standard_normal((5, 7)))
    expect["extra.double"] = sd["extra.double"].array
    sd["extra.long"] = Tensor(rng.integers(-(1 << 40), 1 << 40, (3, 4)))
    expect["extra.long"] = sd["extra.long"].array
    sd["extra.bool"] = Tensor(rng.integers(0, 2, (8,)).astype(bool))
    expect["extra.bool"] = sd["extra.bool"].array

    base = rng.standard_normal((6, 8)).astype(np.float32)
    # transpose serialized torch-style: contiguous storage, swapped strides
    sd["extra.noncontig"] = Tensor(base.T, buffer=base.reshape(-1),
                                   strides=(1, 8))
    expect["extra.noncontig"] = base.T.copy()

    bf_src = rng.standard_normal((4, 4)).astype(np.float32)
    sd["extra.bf16"] = Tensor(bf_src, bf16=True)
    expect["extra.bf16"] = bf16_bits_to_f32(f32_to_bf16_bits(bf_src))

    sd["extra.scalar"] = Tensor(np.float32(3.25).reshape(()))
    expect["extra.scalar"] = np.float32(3.25).reshape(())

    p = str(tmp_path / "w.pth")
    save_pth(sd, p)

    flat = load_pth(p)
    for k, v in expect.items():
        np.testing.assert_array_equal(flat[k], v, err_msg=k)


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
    save_pth(_fake_alexnet_sd(rng), alex_p)
    save_pth(_fake_lins_sd(rng), lins_p)

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
    save_pth(_fake_lins_sd(rng), lins_p)
    assert make_lpips(lins_p) is None


def test_synthetic_weights_tool(tmp_path):
    """tools/make_lpips_weights.py --synthetic produces a loadable bundle
    (clearly labeled; stands in until real torchvision weights exist)."""
    import subprocess
    import sys

    out = str(tmp_path / "lpips_synth.npz")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "tools", "make_lpips_weights.py"),
         "--synthetic", "--out", out],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    from pcp_tpu.eval.lpips import make_lpips

    fn = make_lpips(out)
    assert fn is not None
    rng = np.random.default_rng(3)
    img1 = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    img2 = np.clip(img1 + 0.3 * rng.standard_normal(img1.shape),
                   0, 1).astype(np.float32)
    assert abs(float(fn(img1, img1))) < 1e-6
    assert float(fn(img1, img2)) > 1e-5


def test_writer_torch_cross_check(tmp_path):
    """When a real torch exists: torch.load reads the stdlib-written file,
    and load_pth reads a torch.save-written one — byte-level compatibility
    in both directions."""
    torch = pytest.importorskip("torch")
    from pcp_tpu.eval.torch_pth import load_pth

    rng = np.random.default_rng(4)
    arrs = {
        "a.weight": rng.standard_normal((3, 5)).astype(np.float32),
        "b.bias": rng.standard_normal(7),
        "c.long": rng.integers(-9, 9, (2, 3)),
    }
    ours = str(tmp_path / "ours.pth")
    save_pth(arrs, ours)
    via_torch = torch.load(ours, map_location="cpu", weights_only=True)
    for k, v in arrs.items():
        np.testing.assert_array_equal(via_torch[k].numpy(), v, err_msg=k)

    theirs = str(tmp_path / "theirs.pth")
    torch.save({k: torch.tensor(v) for k, v in arrs.items()}, theirs)
    flat = load_pth(theirs)
    for k, v in arrs.items():
        np.testing.assert_array_equal(flat[k], v, err_msg=k)


def test_convert_torch_weights_golden(tmp_path):
    """Golden-checksum pin of the FULL real-weight conversion path
    (VERDICT r3 #8). Published torchvision-AlexNet/richzhang weights
    cannot enter this environment (zero egress, no torchvision), so the
    comparable-LPIPS blocker stands; this pins everything on our side of
    it: deterministic alexnet-SHAPED checkpoints are serialized in the
    REAL torch.save format (by torch itself when importable, else by the
    byte-compatible stdlib writer — cross-checked above), pushed through
    ``convert_torch_weights`` (zip+pickle reader, OIHW->HWIO transpose,
    head flatten), and every output array's SHA256 must match the digest
    recorded when the path was authored. Any reader/mapping drift fails
    here even in a torch-free environment."""
    import hashlib

    from pcp_tpu.eval.lpips import convert_torch_weights

    rng = np.random.default_rng(2026)
    alex = _fake_alexnet_sd(rng)
    lins = _fake_lins_sd(rng)
    ap = str(tmp_path / "alexnet.pth")
    lp = str(tmp_path / "alex.pth")
    out = str(tmp_path / "out.npz")
    try:
        import torch

        torch.save({k: torch.tensor(v) for k, v in alex.items()}, ap)
        torch.save({k: torch.tensor(v) for k, v in lins.items()}, lp)
    except ImportError:
        save_pth({k: Tensor(v) for k, v in alex.items()}, ap)
        save_pth({k: Tensor(v) for k, v in lins.items()}, lp)
    convert_torch_weights(out, alexnet_pth=ap, lpips_pth=lp)

    golden = {
        "conv0_b": "20c9f463a8b91965",
        "conv0_w": "ae273f7c4e0d25fb",
        "conv1_b": "8dac4bad069cb89d",
        "conv1_w": "7a8c7d4772276b75",
        "conv2_b": "2688679030044064",
        "conv2_w": "a160d20abd74ba99",
        "conv3_b": "3109287a7b31f673",
        "conv3_w": "f854260fc72727ce",
        "conv4_b": "92b1ee987eb0a3b9",
        "conv4_w": "261902fa45435f8b",
        "lin0_w": "aea33d5cbde5ea9e",
        "lin1_w": "3f6873bcfc8c8ded",
        "lin2_w": "517af5175ffddb6f",
        "lin3_w": "f8e4acd19be30b4d",
        "lin4_w": "786e122da5cd5b60",
    }
    z = dict(np.load(out))
    assert sorted(z) == sorted(golden)
    for k, want in golden.items():
        a = np.ascontiguousarray(z[k])
        got = hashlib.sha256(
            a.tobytes() + str(a.shape).encode() + str(a.dtype).encode()
        ).hexdigest()[:16]
        assert got == want, f"{k}: digest {got} != golden {want}"
