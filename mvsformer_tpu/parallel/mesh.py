"""Device mesh construction for multi-chip / multi-host MVS.

Mesh axes (SURVEY.md sections 2.8/5.7 — the TPU-native replacement for the
reference's DDP/NCCL data parallelism):

- "data":  batch sharding; gradient psum (the reference's only parallelism).
- "view":  source-view sharding of the plane-sweep correlation loop. The
  per-view weighted volume/weight running sums are associative, so each
  device warps+correlates its local source views and one psum reproduces the
  serial cost volume exactly (mvsformer_model.py:101-105's sums).
- "depth": depth-hypothesis-slab sharding of the cost volume (reserved axis;
  slab-parallel cost regularization lands on this axis).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code spans hosts — collectives ride ICI within a slice, DCN across.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "view", "depth")


def make_mesh(data: int = -1, view: int = 1, depth: int = 1, devices=None) -> Mesh:
    """Build a ("data","view","depth") mesh. data=-1 absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (view * depth) == 0, (n, view, depth)
        data = n // (view * depth)
    need = data * view * depth
    assert need <= n, (data, view, depth, n)
    if need < n:
        if jax.process_count() > 1:
            # Prefix subsetting is process-major: dropping devices in a
            # multi-host run can leave some process with ZERO mesh devices,
            # which fails obscurely at first dispatch (the process still
            # executes the jitted collective program). Fail loudly here.
            raise ValueError(
                f"mesh data{data}xview{view}xdepth{depth} needs {need} "
                f"devices but {n} are present across "
                f"{jax.process_count()} processes; in multi-host runs the "
                f"mesh must use every device — adjust the axis sizes")
        import warnings

        warnings.warn(
            f"mesh data{data}xview{view}xdepth{depth} uses {need} of {n} "
            f"devices; the remaining {n - need} idle", stacklevel=2)
    devices = devices[:need]
    arr = np.asarray(devices).reshape(data, view, depth)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
