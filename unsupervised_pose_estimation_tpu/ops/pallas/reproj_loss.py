"""Fused photometric reprojection loss (SSIM + L1) as a Pallas TPU kernel.

Computes the reference's per-pixel reprojection error
(`/root/reference/trainer.py:543-555`: 0.85 * SSIM + 0.15 * L1,
channel-meaned) in ONE pass over VMEM-resident channel-planar images: the
five 3x3 windowed moments, the SSIM rational, the L1 term, and the channel
reduction never round-trip HBM. Reflect padding happens IN the kernel
(sublane concat for rows, lane rolls + edge masks for columns), so the
inputs arrive as plain (B, C, H, W) planes — no XLA pad materialisation of
(H+2, W+2) copies per call. The jnp reference implementation
(ops.losses.reprojection_loss_planar) remains the semantic ground truth; an
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


def _kernel(inv_c: float, w: int, pred_ref, target_ref, out_ref):
    """One (batch, channel) plane per grid step; pred/target blocks are
    plain (H, W); the output block (H, W) is revisited across the channel
    grid dimension and accumulated (channel mean)."""
    p = pred_ref[:]
    t = target_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)

    def win3(a):
        # rows: reflect pad top/bottom via sublane concat (row -1 = row 1)
        ap = jnp.concatenate([a[1:2], a, a[-2:-1]], axis=0)  # (H+2, W)
        rows = ap[0:-2] + ap[1:-1] + ap[2:]  # (H, W)
        # cols: circular lane rolls + reflect fix at the two edge columns
        left = pltpu.roll(rows, 1, axis=1)      # col j <- rows[j-1]
        right = pltpu.roll(rows, w - 1, axis=1)  # col j <- rows[j+1]
        colsum = left + rows + right
        colsum = jnp.where(col == 0, rows + 2.0 * right, colsum)
        colsum = jnp.where(col == w - 1, rows + 2.0 * left, colsum)
        return colsum * (1.0 / 9.0)

    mu_p = win3(p)
    mu_t = win3(t)
    sigma_p = win3(p * p) - mu_p * mu_p
    sigma_t = win3(t * t) - mu_t * mu_t
    sigma_pt = win3(p * t) - mu_p * mu_t

    ssim_n = (2.0 * mu_p * mu_t + _SSIM_C1) * (2.0 * sigma_pt + _SSIM_C2)
    ssim_d = (mu_p * mu_p + mu_t * mu_t + _SSIM_C1) * (
        sigma_p + sigma_t + _SSIM_C2)
    dssim = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)

    l1 = jnp.abs(t - p)
    partial = (0.85 * dssim + 0.15 * l1) * inv_c

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        out_ref[:] = partial

    @pl.when(c_idx != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _forward(pred_p, target_p, interpret=False):
    """pred/target channel-planar (B, C, H, W) -> (B, H, W, 1)."""
    b, c, h, w = pred_p.shape
    p = pred_p.astype(jnp.float32)
    t = target_p.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, 1.0 / c, w),
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((None, None, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(p, t)
    return out[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def reprojection_loss_pallas_planar(pred_p, target_p, interpret=False):
    """Fused replacement for ops.losses.reprojection_loss_planar
    (use_ssim=True path): channel-planar (B, C, H, W) in, (B, H, W, 1)
    out."""
    return _forward(pred_p, target_p, interpret)


def _fwd(pred_p, target_p, interpret):
    return _forward(pred_p, target_p, interpret), (pred_p, target_p)


def _bwd(interpret, residuals, g):
    pred_p, target_p = residuals
    # gradient of the mathematically-identical jnp formulation
    _, vjp = jax.vjp(
        lambda p, t: L.reprojection_loss_planar(p, t, use_ssim=True),
        pred_p, target_p)
    return vjp(g)


reprojection_loss_pallas_planar.defvjp(_fwd, _bwd)


def reprojection_loss_pallas(pred, target, interpret=False):
    """NHWC (B, H, W, C) compatibility wrapper."""
    return reprojection_loss_pallas_planar(jnp.moveaxis(pred, -1, 1),
                                           jnp.moveaxis(target, -1, 1),
                                           interpret)
