"""Device mesh and sharding rules.

The reference has no distributed layer at all (single CUDA device,
`/root/reference/trainer.py:83`; SURVEY.md §2 parallelism census). This module
is the new first-class component: a 2-axis mesh

    ("data", "fsdp")

where the global batch is sharded over "data" (pure data parallelism — the
right strategy for these small CNNs) and, optionally, parameters are sharded
over "fsdp" on their widest divisible axis for memory scaling. Everything is
expressed as shardings on a single jitted train step: XLA inserts the gradient
all-reduces (psum over ICI) and any fsdp all-gathers — no hand-written
collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, fsdp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // fsdp
    if data * fsdp > n:
        raise ValueError(f"mesh {data}x{fsdp} needs more than {n} devices")
    # an explicit smaller mesh uses a device subset (e.g. --mesh_data 1 to
    # debug single-device on a multi-chip host)
    dev_array = np.asarray(devices[: data * fsdp]).reshape(data, fsdp)
    return Mesh(dev_array, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over the data axis; with fsdp > 1 the
    batch is also split over fsdp (flattened into the leading axis) so every
    device holds distinct examples."""
    if mesh.shape["fsdp"] > 1:
        return NamedSharding(mesh, P(("data", "fsdp")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Per-leaf sharding: replicate on "data"; if fsdp > 1, shard each leaf's
    largest fsdp-divisible axis (weight-sharded data parallelism — XLA emits
    the all-gathers where full parameters are consumed)."""
    fsdp = mesh.shape["fsdp"]

    def rule(leaf):
        if fsdp == 1 or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        sizes = list(leaf.shape)
        order = sorted(range(leaf.ndim), key=lambda i: -sizes[i])
        for axis in order:
            if sizes[axis] % fsdp == 0 and sizes[axis] >= fsdp:
                spec = [None] * leaf.ndim
                spec[axis] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
