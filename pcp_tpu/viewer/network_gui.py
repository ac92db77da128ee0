"""SIBR-compatible viewer socket server.

Reference: gaussian_renderer/network_gui.py:24-86 — a non-blocking TCP
listener (default 127.0.0.1:6009) speaking the original 3DGS viewer
protocol: length-prefixed JSON camera messages in, raw RGB bytes + a
verification string out. The train loop polls it each iteration
(train.py:67-84).

Message in (JSON): resolution_x/y, fov_y, fov_x, z_near, z_far,
shs_python, rot_scale_python, keep_alive, scaling_modifier,
view_matrix (16 floats), view_projection_matrix (16), plus a do_training
flag. The reference flips Y/Z columns of the matrices before use
(network_gui.py:55-64) — reproduced here.
"""

from __future__ import annotations

import json
import socket
import struct
import traceback
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ViewerCamera:
    width: int
    height: int
    fovx: float
    fovy: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray   # (4, 4)
    full_proj_transform: np.ndarray    # (4, 4)
    do_training: bool
    keep_alive: bool
    scaling_modifier: float
    shs_python: bool
    rot_scale_python: bool


class NetworkGUI:
    """Non-blocking accept/poll server (init/try_connect/receive/send)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            return True
        except Exception:
            return False

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        got = 0
        while got < n:
            b = self.conn.recv(n - got)
            if not b:
                raise ConnectionError("viewer disconnected")
            chunks.append(b)
            got += len(b)
        return b"".join(chunks)

    def receive(self) -> Optional[ViewerCamera]:
        """One camera message, or None on malformed input."""
        try:
            (length,) = struct.unpack("<I", self._read_exact(4))
            msg = json.loads(self._read_exact(length).decode("utf-8"))
        except Exception:
            self.close_conn()
            return None
        try:
            w = msg["resolution_x"]
            h = msg["resolution_y"]
            if w == 0 or h == 0:
                return None
            wvt = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            fpt = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
            # reference Y/Z flips (network_gui.py:55-64)
            wvt[:, 1] = -wvt[:, 1]
            wvt[:, 2] = -wvt[:, 2]
            fpt[:, 1] = -fpt[:, 1]
            return ViewerCamera(
                width=w, height=h,
                fovx=msg["fov_x"], fovy=msg["fov_y"],
                znear=msg["z_near"], zfar=msg["z_far"],
                world_view_transform=wvt, full_proj_transform=fpt,
                do_training=bool(msg.get("train", True)),
                keep_alive=bool(msg.get("keep_alive", True)),
                scaling_modifier=float(msg.get("scaling_modifier", 1.0)),
                shs_python=bool(msg.get("shs_python", False)),
                rot_scale_python=bool(msg.get("rot_scale_python", False)),
            )
        except KeyError:
            traceback.print_exc()
            return None

    def send(self, image_u8: Optional[np.ndarray], verify: str) -> None:
        """Raw RGB bytes + NUL-terminated verify string (network_gui.py:66-72)."""
        if self.conn is None:
            return
        try:
            if image_u8 is not None:
                self.conn.sendall(np.ascontiguousarray(image_u8).tobytes())
            self.conn.sendall(len(verify).to_bytes(4, "little"))
            self.conn.sendall(verify.encode("ascii"))
        except Exception:
            self.close_conn()

    def close_conn(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None

    def close(self) -> None:
        self.close_conn()
        self.listener.close()
