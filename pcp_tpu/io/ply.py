"""PLY I/O (no external deps) + the 3DGS Gaussian PLY schema.

Replaces the reference's use of the `plyfile` package. Supports the subset of
PLY the pipeline needs: a single `vertex` element with scalar properties, in
`binary_little_endian` or `ascii` encodings.

Gaussian schema parity (gaussian_model.py:189-220 save_ply/load_ply):
  x y z nx ny nz f_dc_0..2 f_rest_0..(3*(K-1)-1) opacity scale_0..2 rot_0..3
with f_rest laid out channel-major (all of channel 0's rest coeffs, then
channel 1's, then 2's) exactly as torch's `transpose(1, 2).flatten` produces.
All stored values are the *pre-activation* parameters (log scales, logit
opacities, unnormalized quaternions).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

_PLY_TYPES = {
    "char": "i1", "uchar": "u1", "short": "i2", "ushort": "u2",
    "int": "i4", "uint": "u4", "float": "f4", "double": "f8",
    "int8": "i1", "uint8": "u1", "int16": "i2", "uint16": "u2",
    "int32": "i4", "uint32": "u4", "float32": "f4", "float64": "f8",
}
_NP_TO_PLY = {"i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
              "i4": "int", "u4": "uint", "f4": "float", "f8": "double"}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a single-element-`vertex` PLY into {property_name: (N,) array}."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    assert header[0].strip() == "ply"
    fmt = None
    count = 0
    props: list = []
    element = None
    for line in header[1:]:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            element = parts[1]
            if element == "vertex":
                count = int(parts[2])
        elif parts[0] == "property" and element == "vertex":
            if parts[1] == "list":
                raise NotImplementedError("list properties unsupported")
            props.append((parts[2], _PLY_TYPES[parts[1]]))
    if fmt == "binary_little_endian":
        dtype = np.dtype([(name, "<" + t) for name, t in props])
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=end)
    elif fmt == "ascii":
        body = data[end:].decode("ascii").split()
        flat = np.array(body[: count * len(props)], dtype=np.float64).reshape(count, len(props))
        arr = np.rec.fromarrays(
            [flat[:, i].astype(t) for i, (_, t) in enumerate(props)],
            names=[name for name, _ in props],
        )
    else:
        raise NotImplementedError(f"PLY format {fmt}")
    return {name: np.ascontiguousarray(arr[name]) for name, _ in props}


def write_ply(path: str, fields: Dict[str, np.ndarray], fmt: str = "binary_little_endian") -> None:
    """Write {name: (N,) array} as a vertex-element PLY."""
    names = list(fields.keys())
    n = len(next(iter(fields.values())))
    dtype = np.dtype([(k, "<" + np.dtype(fields[k].dtype).str[1:]) for k in names])
    rec = np.empty(n, dtype=dtype)
    for k in names:
        assert len(fields[k]) == n, f"field {k} length mismatch"
        rec[k] = fields[k]
    header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    for k in names:
        header.append(f"property {_NP_TO_PLY[np.dtype(fields[k].dtype).str[1:]]} {k}")
    header.append("end_header")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if fmt == "binary_little_endian":
            f.write(rec.tobytes())
        else:
            for row in rec:
                f.write((" ".join(str(v) for v in row) + "\n").encode("ascii"))


# ---------------------------------------------------------------------------
# Point-cloud PLY (input scenes): x y z nx ny nz red green blue
# ---------------------------------------------------------------------------

def fetch_point_cloud(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read (points, colors01, normals) from a scene points3d.ply
    (shen_data_read.py fetchPly semantics)."""
    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], axis=-1).astype(np.float64)
    if "red" in v:
        cols = np.stack([v["red"], v["green"], v["blue"]], axis=-1).astype(np.float64) / 255.0
    else:
        cols = np.ones_like(pts) * 0.5
    if "nx" in v:
        nrm = np.stack([v["nx"], v["ny"], v["nz"]], axis=-1).astype(np.float64)
    else:
        nrm = np.zeros_like(pts)
    return pts, cols, nrm


def store_point_cloud(path: str, xyz: np.ndarray, rgb255: np.ndarray) -> None:
    """Write points + uint8 colors + zero normals (storePly semantics)."""
    n = len(xyz)
    normals = np.zeros((n, 3), np.float32)
    write_ply(path, {
        "x": xyz[:, 0].astype(np.float32), "y": xyz[:, 1].astype(np.float32), "z": xyz[:, 2].astype(np.float32),
        "nx": normals[:, 0], "ny": normals[:, 1], "nz": normals[:, 2],
        "red": rgb255[:, 0].astype(np.uint8), "green": rgb255[:, 1].astype(np.uint8), "blue": rgb255[:, 2].astype(np.uint8),
    })


# ---------------------------------------------------------------------------
# Gaussian PLY (trained models)
# ---------------------------------------------------------------------------

def save_gaussian_ply(path: str, xyz, f_dc, f_rest, opacity, scaling, rotation) -> None:
    """Write the 3DGS Gaussian schema.

    Shapes: xyz (N,3); f_dc (N,1,3) or (N,3); f_rest (N,K-1,3); opacity (N,)
    or (N,1); scaling (N,3); rotation (N,4). Values are raw parameters (pre-
    activation), matching gaussian_model.py:189-220.
    """
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    f_dc = np.asarray(f_dc, np.float32).reshape(n, -1, 3)
    f_rest = np.asarray(f_rest, np.float32).reshape(n, -1, 3)
    opacity = np.asarray(opacity, np.float32).reshape(n)
    scaling = np.asarray(scaling, np.float32).reshape(n, 3)
    rotation = np.asarray(rotation, np.float32).reshape(n, 4)

    fields: Dict[str, np.ndarray] = {}
    for i, k in enumerate("xyz"):
        fields[k] = xyz[:, i]
    for i, k in enumerate(("nx", "ny", "nz")):
        fields[k] = np.zeros(n, np.float32)
    # channel-major flatten: (N, K, 3) -> transpose to (N, 3, K) -> flatten
    dc_flat = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    for i in range(dc_flat.shape[1]):
        fields[f"f_dc_{i}"] = np.ascontiguousarray(dc_flat[:, i])
    rest_flat = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)
    for i in range(rest_flat.shape[1]):
        fields[f"f_rest_{i}"] = np.ascontiguousarray(rest_flat[:, i])
    fields["opacity"] = opacity
    for i in range(3):
        fields[f"scale_{i}"] = np.ascontiguousarray(scaling[:, i])
    for i in range(4):
        fields[f"rot_{i}"] = np.ascontiguousarray(rotation[:, i])
    write_ply(path, fields)


def load_gaussian_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the Gaussian schema back into a dict of arrays:
    {xyz (N,3), f_dc (N,1,3), f_rest (N,K-1,3), opacity (N,1),
     scaling (N,3), rotation (N,4)} (gaussian_model load_ply /
    merge_partitions.load_ply semantics)."""
    v = read_ply(path)
    n = len(v["x"])
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=-1)
    dc_names = sorted((k for k in v if k.startswith("f_dc_")), key=lambda s: int(s.split("_")[-1]))
    rest_names = sorted((k for k in v if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1]))
    dc = np.stack([v[k] for k in dc_names], axis=-1).reshape(n, 3, -1).transpose(0, 2, 1)
    if rest_names:
        rest = np.stack([v[k] for k in rest_names], axis=-1).reshape(n, 3, -1).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    scale = np.stack([v[f"scale_{i}"] for i in range(3)], axis=-1)
    rot = np.stack([v[f"rot_{i}"] for i in range(4)], axis=-1)
    return {
        "xyz": xyz.astype(np.float32),
        "f_dc": dc.astype(np.float32),
        "f_rest": rest.astype(np.float32),
        "opacity": v["opacity"].reshape(n, 1).astype(np.float32),
        "scaling": scale.astype(np.float32),
        "rotation": rot.astype(np.float32),
    }
