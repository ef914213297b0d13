"""Device mesh and sharding rules.

The reference has no distributed layer at all (single CUDA device,
`/root/reference/trainer.py:83`; SURVEY.md §2 parallelism census). This module
is the new first-class component: a 3-axis mesh

    ("dcn", "data", "fsdp")

where the global batch is sharded over "dcn" x "data" (pure data parallelism —
the right strategy for these small CNNs) and, optionally, parameters are
sharded over "fsdp" on their widest divisible axis for memory scaling.
Everything is expressed as shardings on a single jitted train step: XLA
inserts the gradient all-reduces (psum over ICI, hierarchical over DCN for
the outer axis) and any fsdp all-gathers — no hand-written collectives.

Multi-slice: "dcn" is the across-slice axis. On real multi-slice TPU the
device array is built with `mesh_utils.create_hybrid_device_mesh` so the
outer axis maps onto the data-center network and the inner axes stay on ICI;
XLA then reduces gradients hierarchically (reduce-scatter on ICI, small
all-reduce over DCN). Combine with --grad_accum to keep the DCN all-reduce
amortized over larger effective batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dcn", "data", "fsdp")


def make_mesh(data: int = -1, fsdp: int = 1,
              devices: Optional[list] = None, dcn: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // (fsdp * dcn)
    if data * fsdp * dcn > n:
        raise ValueError(
            f"mesh {dcn}x{data}x{fsdp} needs more than {n} devices")
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if dcn > 1 and len(slice_ids) == dcn:
        # real multi-slice topology: outer axis over DCN, inner over ICI.
        # NB: create_hybrid_device_mesh uses ALL devices — explicit device
        # subsets are unsupported with dcn > 1.
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, data, fsdp), (dcn, 1, 1), devices=devices)
    else:
        if dcn > 1:
            # the flat reshape below cannot align the outer "dcn" axis with
            # slice boundaries, so gradient reduction would cross DCN on an
            # inner axis — a silent perf hazard on real hardware. Allowed
            # (virtual/CPU meshes have one slice id) but loudly flagged.
            import warnings

            warnings.warn(
                f"make_mesh: dcn={dcn} but devices span {len(slice_ids)} "
                f"slice(s); falling back to a flat reshape whose outer "
                f"'dcn' axis does NOT follow slice boundaries. On real "
                f"multi-slice hardware this puts gradient all-reduces on "
                f"the wrong network tier.", stacklevel=2)
        # single slice / virtual devices: an explicit smaller mesh uses a
        # device subset (e.g. --mesh_data 1 to debug single-device on a
        # multi-chip host)
        dev_array = np.asarray(devices[: data * fsdp * dcn]).reshape(
            dcn, data, fsdp)
    return Mesh(dev_array, axis_names=AXES)


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the global batch's leading dim is sharded over: always
    dcn x data; fsdp too when used (every device then holds distinct
    examples)."""
    axes = ["dcn", "data"]
    if mesh.shape["fsdp"] > 1:
        axes.append("fsdp")
    return tuple(axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Per-leaf sharding: replicate on "dcn"/"data"; if fsdp > 1, shard each
    leaf's largest fsdp-divisible axis (weight-sharded data parallelism — XLA
    emits the all-gathers where full parameters are consumed)."""
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
