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
interpret-mode test asserts agreement for BOTH directions: the forward map
and the analytic Pallas backward (`_bwd_kernel`), which recomputes the five
moments in VMEM and applies the closed-form SSIM adjoint instead of
re-tracing the jnp graph through jax.vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SSIM_C1 = 0.01 ** 2
_SSIM_C2 = 0.03 ** 2

# Largest (H * W) plane the full-plane kernels hold without raising the
# Mosaic scoped-VMEM limit: the default 16 MiB budget fits the 192*640
# flagship (~0.49 MB/plane) with room, but the upstream monodepth2
# 1024x320 feed (1.31 MB/plane) needs 16.39 MiB of kernel stack (measured:
# the v5e compile OOMs by 400 KiB). Beyond this plane size the calls pass
# CompilerParams(vmem_limit_bytes=_VMEM_RAISED) — validated on v5e at
# 320x1024 by scripts/diag_grad_tpu.py (DIAG_H=320 DIAG_W=1024).
PLANE_DEFAULT_VMEM = 192 * 640
# v5e VMEM is 128 MiB/core; 48 MiB of scoped stack leaves ample room for
# the streamed refs while admitting ~3x the 1024x320 stack need.
_VMEM_RAISED = 48 * 1024 * 1024


def _params(h, w):
    """compiler_params raising the scoped-VMEM cap for large planes (None
    keeps Mosaic's default 16 MiB budget at canonical plane sizes)."""
    if h * w <= PLANE_DEFAULT_VMEM:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_RAISED)


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


def _bwd_kernel(inv_c: float, w: int, pred_ref, target_ref, g_ref,
                gp_ref, gt_ref):
    """Analytic adjoint of `_kernel` for one (batch, channel) plane.

    Instead of re-tracing the jnp formulation through `jax.vjp` (which
    rebuilds the whole SSIM forward graph in the backward pass — five
    padded window sums materialised per call), this recomputes the five
    3x3 moments in VMEM and applies the closed-form chain rule:

        d loss / d p = 0.15/C * sign(p - t) * g
                     + W*(c_mu_p) + 2p * W*(c_sq) + t * W*(c_pt)

    where W* is the adjoint of the reflect-padded 3x3 box mean and the
    coefficient planes come from differentiating the SSIM rational wrt the
    window moments S1=W(p), S3=W(p^2), S5=W(pt) (symmetrically for t).
    The adjoint of reflect-pad-then-box is zero-pad box plus an extra
    deposit on rows/cols 1 and n-2 from the two edge windows.
    """
    p = pred_ref[:]
    t = target_ref[:]
    g = g_ref[:]
    h = p.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)

    def win3(a):
        ap = jnp.concatenate([a[1:2], a, a[-2:-1]], axis=0)
        rows = ap[0:-2] + ap[1:-1] + ap[2:]
        left = pltpu.roll(rows, 1, axis=1)
        right = pltpu.roll(rows, w - 1, axis=1)
        colsum = left + rows + right
        colsum = jnp.where(col == 0, rows + 2.0 * right, colsum)
        colsum = jnp.where(col == w - 1, rows + 2.0 * left, colsum)
        return colsum * (1.0 / 9.0)

    def adj3(gy):
        # columns: out[j] = gy[j-1] + gy[j] + gy[j+1] (zero past edges),
        # then the reflect deposits: col 1 += gy[:, 0], col w-2 += gy[:, -1]
        nbr_r = pltpu.roll(gy, 1, axis=1)       # col j <- gy[j-1]
        nbr_l = pltpu.roll(gy, w - 1, axis=1)   # col j <- gy[j+1]
        s = gy + jnp.where(col == 0, 0.0, nbr_r) \
            + jnp.where(col == w - 1, 0.0, nbr_l)
        s = s + jnp.where(col == 1, gy[:, 0:1], 0.0)
        s = s + jnp.where(col == w - 2, gy[:, w - 1:w], 0.0)
        # rows: same with zero-padded sublane shifts + edge deposits
        zero = jnp.zeros_like(s[0:1])
        sz = jnp.concatenate([zero, s, zero], axis=0)  # (H+2, W)
        out = sz[0:-2] + sz[1:-1] + sz[2:]
        out = out + jnp.where(row == 1, s[0:1], 0.0)
        out = out + jnp.where(row == h - 2, s[h - 1:h], 0.0)
        return out * (1.0 / 9.0)

    mu_p = win3(p)
    mu_t = win3(t)
    wp2 = win3(p * p)
    wt2 = win3(t * t)
    wpt = win3(p * t)
    sigma_p = wp2 - mu_p * mu_p
    sigma_t = wt2 - mu_t * mu_t
    sigma_pt = wpt - mu_p * mu_t

    n1 = 2.0 * mu_p * mu_t + _SSIM_C1
    n2 = 2.0 * sigma_pt + _SSIM_C2
    d1 = mu_p * mu_p + mu_t * mu_t + _SSIM_C1
    d2 = sigma_p + sigma_t + _SSIM_C2
    nn = n1 * n2
    dd = d1 * d2

    raw = (1.0 - nn / dd) * 0.5
    live = jnp.logical_and(raw > 0.0, raw < 1.0)
    gl = jnp.where(live, g * (0.85 * inv_c), 0.0)

    inv_dd = 1.0 / dd
    dl_dn = -0.5 * gl * inv_dd                 # d loss / d N
    dl_dd = 0.5 * gl * nn * inv_dd * inv_dd    # d loss / d D

    c_mu_p = dl_dn * 2.0 * mu_t * (n2 - n1) + dl_dd * 2.0 * mu_p * (d2 - d1)
    c_mu_t = dl_dn * 2.0 * mu_p * (n2 - n1) + dl_dd * 2.0 * mu_t * (d2 - d1)
    c_sq = dl_dd * d1           # coefficient of W(p^2) and of W(t^2)
    c_pt = dl_dn * 2.0 * n1     # coefficient of W(pt)

    a_mu_p = adj3(c_mu_p)
    a_mu_t = adj3(c_mu_t)
    a_sq = adj3(c_sq)
    a_pt = adj3(c_pt)

    l1g = (0.15 * inv_c) * g * jnp.sign(p - t)
    gp_ref[:] = l1g + a_mu_p + 2.0 * p * a_sq + t * a_pt
    gt_ref[:] = -l1g + a_mu_t + 2.0 * t * a_sq + p * a_pt


def _backward(pred_p, target_p, g, interpret=False):
    """pred/target (B, C, H, W) f32, upstream g (B, H, W) f32 ->
    (g_pred, g_target) channel-planar (B, C, H, W) f32."""
    b, c, h, w = pred_p.shape
    plane = pl.BlockSpec((None, None, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    gp, gt = pl.pallas_call(
        functools.partial(_bwd_kernel, 1.0 / c, w),
        grid=(b, c),
        in_specs=[plane, plane,
                  pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, c, h, w), jnp.float32)),
        interpret=interpret,
        compiler_params=_params(h, w),
    )(pred_p, target_p, g)
    return gp, gt


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
        compiler_params=_params(h, w),
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
    gp, gt = _backward(pred_p.astype(jnp.float32),
                       target_p.astype(jnp.float32),
                       g[..., 0].astype(jnp.float32), interpret)
    return gp.astype(pred_p.dtype), gt.astype(target_p.dtype)


reprojection_loss_pallas_planar.defvjp(_fwd, _bwd)


def reprojection_loss_pallas(pred, target, interpret=False):
    """NHWC (B, H, W, C) compatibility wrapper."""
    return reprojection_loss_pallas_planar(jnp.moveaxis(pred, -1, 1),
                                           jnp.moveaxis(target, -1, 1),
                                           interpret)
