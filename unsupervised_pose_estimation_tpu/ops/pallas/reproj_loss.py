"""Fused photometric reprojection loss (SSIM + L1) as a Pallas TPU kernel.

Computes the reference's per-pixel reprojection error
(`/root/reference/trainer.py:543-555`: 0.85 * SSIM + 0.15 * L1,
channel-meaned) in ONE pass over VMEM-resident channel-planar images: the
five 3x3 windowed moments, the SSIM rational, the L1 term, and the channel
reduction never round-trip HBM. The jnp reference implementation
(ops.losses.reprojection_loss) remains the semantic ground truth; an
interpret-mode test asserts agreement, and the backward pass is taken from
the jnp formulation via custom_vjp (forward fused, backward XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import losses as L

_SSIM_C1 = 0.01 ** 2
_SSIM_C2 = 0.03 ** 2


def _kernel(inv_c: float, pred_ref, target_ref, out_ref):
    """One (batch, channel) plane per grid step; pred/target blocks are
    (H+2, W+2) reflect-padded; the output block (H, W) is revisited across
    the channel grid dimension and accumulated (channel mean)."""
    p = pred_ref[:]
    t = target_ref[:]

    def win3(a):
        rows = a[0:-2, :] + a[1:-1, :] + a[2:, :]
        return (rows[:, 0:-2] + rows[:, 1:-1] + rows[:, 2:]) * (1.0 / 9.0)

    mu_p = win3(p)
    mu_t = win3(t)
    sigma_p = win3(p * p) - mu_p * mu_p
    sigma_t = win3(t * t) - mu_t * mu_t
    sigma_pt = win3(p * t) - mu_p * mu_t

    ssim_n = (2.0 * mu_p * mu_t + _SSIM_C1) * (2.0 * sigma_pt + _SSIM_C2)
    ssim_d = (mu_p * mu_p + mu_t * mu_t + _SSIM_C1) * (
        sigma_p + sigma_t + _SSIM_C2)
    dssim = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)

    l1 = jnp.abs(t[1:-1, 1:-1] - p[1:-1, 1:-1])
    partial = (0.85 * dssim + 0.15 * l1) * inv_c

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        out_ref[:] = partial

    @pl.when(c_idx != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _forward(pred, target, interpret=False):
    """pred/target NHWC (B, H, W, C) -> (B, H, W, 1)."""
    b, h, w, c = pred.shape
    p = jnp.moveaxis(pred.astype(jnp.float32), -1, 1)
    t = jnp.moveaxis(target.astype(jnp.float32), -1, 1)
    pad = [(0, 0), (0, 0), (1, 1), (1, 1)]
    p = jnp.pad(p, pad, mode="reflect")
    t = jnp.pad(t, pad, mode="reflect")

    out = pl.pallas_call(
        functools.partial(_kernel, 1.0 / c),
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((None, None, h + 2, w + 2),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, h + 2, w + 2),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(p, t)
    return out[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def reprojection_loss_pallas(pred, target, interpret=False):
    """Drop-in fused replacement for ops.losses.reprojection_loss
    (use_ssim=True path)."""
    return _forward(pred, target, interpret)


def _fwd(pred, target, interpret):
    return _forward(pred, target, interpret), (pred, target)


def _bwd(interpret, residuals, g):
    pred, target = residuals
    # gradient of the mathematically-identical jnp formulation
    _, vjp = jax.vjp(lambda p, t: L.reprojection_loss(p, t, use_ssim=True),
                     pred, target)
    return vjp(g)


reprojection_loss_pallas.defvjp(_fwd, _bwd)
