"""Minimal binary PLY point-cloud writer (no plyfile dependency).

Produces the same vertex layout the reference writes via plyfile
(test.py:458-472): float32 x/y/z + uchar red/green/blue, binary little endian.
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors, np.uint8).reshape(-1, 3)
        assert colors.shape[0] == n
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header.append("end_header")

    if colors is not None:
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                          ("red", "u1"), ("green", "u1"), ("blue", "u1")])
        rec = np.empty(n, dtype)
        rec["x"], rec["y"], rec["z"] = points.T
        rec["red"], rec["green"], rec["blue"] = colors.T
    else:
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        rec = np.empty(n, dtype)
        rec["x"], rec["y"], rec["z"] = points.T

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        rec.tofile(f)


def read_ply(path: str):
    """Reader for round-trip tests. Returns (points [N,3], colors [N,3]|None)."""
    with open(path, "rb") as f:
        props = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                props.append(tuple(line.split()[1:]))
            elif line == "end_header":
                break
        type_map = {"float": "<f4", "uchar": "u1"}
        dtype = np.dtype([(name, type_map[t]) for t, name in props])
        rec = np.fromfile(f, dtype=dtype, count=n)
    points = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1)
    colors = None
    if "red" in rec.dtype.names:
        colors = np.stack([rec["red"], rec["green"], rec["blue"]], axis=-1)
    return points, colors
