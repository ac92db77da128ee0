"""eval/ (LPIPS architecture, metrics driver artifacts) and viewer protocol."""

import json
import os
import socket
import struct
import threading

import numpy as np
import pytest


def _random_lpips_weights(path, rng):
    """Random-valued weights with the correct shapes (architecture test —
    real perceptual values require the converted torchvision weights)."""
    out = {}
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    for i, (ci, co, k) in enumerate(chans):
        out[f"conv{i}_w"] = rng.normal(size=(k, k, ci, co)).astype(np.float32) * 0.05
        out[f"conv{i}_b"] = np.zeros(co, np.float32)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        out[f"lin{i}_w"] = np.abs(rng.normal(size=c)).astype(np.float32)
    np.savez(path, **out)


def test_lpips_zero_on_identical_and_positive_on_different(tmp_path, rng):
    from pcp_tpu.eval.lpips import make_lpips

    p = str(tmp_path / "w.npz")
    _random_lpips_weights(p, rng)
    fn = make_lpips(p)
    assert fn is not None
    a = np.asarray(rng.uniform(size=(64, 96, 3)), np.float32)
    b = np.asarray(rng.uniform(size=(64, 96, 3)), np.float32)
    import jax.numpy as jnp

    same = float(fn(jnp.asarray(a), jnp.asarray(a)))
    diff = float(fn(jnp.asarray(a), jnp.asarray(b)))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > same


def test_lpips_unavailable_without_weights():
    from pcp_tpu.eval.lpips import make_lpips

    assert make_lpips("/nonexistent/weights.npz") is None


def test_evaluate_images_artifacts(tmp_path, rng):
    from pcp_tpu.eval.metrics import evaluate_images

    gt = rng.uniform(size=(4, 32, 48, 3)).astype(np.float32)
    # renders = gt with a global color cast: color_correct should undo most
    renders = np.clip(gt * 0.8 + 0.05, 0, 1)
    out = evaluate_images(list(renders), list(gt))
    assert out["mean"]["PSNR"] > 25.0  # cast removed by color solve
    assert out["mean"]["LPIPS"] is None
    raw = evaluate_images(list(renders), list(gt), use_color_correct=False)
    assert out["mean"]["PSNR"] > raw["mean"]["PSNR"]


def test_network_gui_roundtrip():
    from pcp_tpu.viewer import NetworkGUI

    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = {
            "resolution_x": 8, "resolution_y": 6,
            "fov_x": 1.0, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
            "train": True, "keep_alive": True, "scaling_modifier": 1.0,
            "shs_python": False, "rot_scale_python": False,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        blob = json.dumps(msg).encode()
        s.sendall(struct.pack("<I", len(blob)) + blob)
        img = b""
        want = 8 * 6 * 3
        while len(img) < want:
            img += s.recv(want - len(img))
        (vl,) = struct.unpack("<I", s.recv(4))
        received["verify"] = s.recv(vl).decode()
        received["img_len"] = len(img)
        s.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    # poll until connected (non-blocking accept; give the client time)
    import time

    for _ in range(500):
        if gui.try_connect():
            break
        time.sleep(0.01)
    assert gui.conn is not None, "client never connected"
    gui.conn.settimeout(10)
    cam = gui.receive()
    assert cam is not None and cam.width == 8 and cam.height == 6
    # Y/Z flip applied
    assert cam.world_view_transform[1, 1] == -1.0
    gui.send(np.zeros((6, 8, 3), np.uint8), "ok")
    t.join(timeout=5)
    gui.close()
    assert received["verify"] == "ok"
    assert received["img_len"] == 144


def test_lpips_full_graph_realistic_resolution(tmp_path, rng):
    """Exercise the whole conv stack (5 taps, 2 maxpools, 5 linear heads)
    at a reference-scale resolution so tap shapes and strides are validated
    end-to-end, not just at thumbnail size."""
    import jax.numpy as jnp

    from pcp_tpu.eval.lpips import make_lpips

    p = str(tmp_path / "w.npz")
    _random_lpips_weights(p, rng)
    fn = make_lpips(p)
    a = jnp.asarray(rng.uniform(size=(600, 800, 3)), jnp.float32)
    b = jnp.clip(a + 0.1, 0.0, 1.0)
    d = float(fn(a, b))
    assert np.isfinite(d) and d > 0.0
