"""Fused view-synthesis warp + photometric reprojection loss (one kernel).

The hot nest of the reference trainer (`/root/reference/trainer.py:491-555`)
is warp-then-score: `F.grid_sample` resamples the source frame, then
0.85*SSIM + 0.15*L1 scores it against the target. Round 4 ran these as two
Pallas kernels per (scale, source-frame) site — the v8 warp kernel
(`warp_kernel._warp_lerp_kernel_v8`) wrote the warped image plus its two
coordinate-gradient planes to HBM, and the fused loss kernel
(`reproj_loss._kernel`) re-read the warped+target planes. This module fuses
the score into the warp kernel's epilogue so the warped image is consumed
for the loss while still in VMEM, and fuses the backward chain
(SSIM/L1 adjoint -> d loss/d warped -> contraction with the gradient
planes) into ONE kernel that emits the two (B, H, W) coordinate cotangents
directly — the (B, C, H, W) `d loss/d warped` tensor never exists in HBM,
and the per-site XLA multiply-reduce/transpose pass disappears.

Streaming structure of the forward kernel: grid (batch, row-block + 1).
Step r warps row-block r (same channel-packed 16-row miniband gathers as
v8) and scores row-block r-1 — the SSIM 3x3 window needs a one-row halo, so
the score of a block becomes computable only once the next block's first
warped row exists. Two small VMEM scratch tiles carry the previous block's
warped/target rows across grid steps; the +1 phantom step scores the last
block (bottom edge rows use the kernel-internal reflect rule, matching
`ops.losses._ssim_planar`'s reflect padding).

Numerical contract: identical f32 arithmetic to the unfused pair
(`warp_kernel.grid_sample_fast` -> `reproj_loss.reprojection_loss_pallas_
planar`), asserted by tests for both values and coordinate gradients.
Dispatch: the same v8 gates (uint8 source, 16-row y-minibands, |x-shift| <
128); when they fail the op falls back to the unfused ladder + loss kernel
inside `lax.cond` — large motion degrades to the exact path, never breaks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reproj_loss import (_SSIM_C1, _SSIM_C2, _forward as _loss_forward,
                          _params as _vmem_params)
from .warp_kernel import LANE, MB7, RBP, _sample_impl, _v8_inputs

__all__ = ["warp_reproj_loss"]


def _warp_loss_kernel_v9(h: int, w: int, c: int, mb: int, nb: int,
                         src_ref, x0_ref, yl_ref, ymin_ref, wx_ref, wy_ref,
                         target_ref, loss_ref, out_ref, dx_ref, dy_ref,
                         wcur_ref, wprev_ref, wpp_ref, tprev_ref, tpp_ref):
    """One grid step = (warp row-block r) + (score row-block r-1).

    src: (C*H, W) f32 raw-u8-valued full plane (constant across r);
    x0/yl/wx/wy: (RBP, W) blocks of row-block min(r, nb-1);
    ymin: (RBP, W//LANE) i32 SMEM; target: (C, RBP, W) f32 block;
    loss out: (RBP, W) f32 block max(r-1, 0); out/dx/dy: (C, RBP, W) f32
    blocks min(r, nb-1) — the warped image and its exact d/dwx, d/dwy
    planes (the custom-vjp residuals).
    Scratch: wcur/wprev (C, RBP, W) f32, wpp (C, 1, W) f32 (previous
    block's last row), tprev/tpp likewise for the target.
    """
    r = pl.program_id(1)
    n_groups = w // LANE
    cb = c * mb
    inv255 = 1.0 / 255.0
    inv_c = 1.0 / c

    # ---------------- phase 1: warp row-block r (v8 body) ----------------
    @pl.when(r < nb)
    def _warp():
        rows_local = jax.lax.broadcasted_iota(jnp.int32, (cb, LANE), 0) % mb
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RBP, LANE), 0)

        x0_blk = x0_ref[:]  # (RBP, W)
        yl_blk = yl_ref[:]
        wx_blk = wx_ref[:]
        wy_blk = wy_ref[:]

        for cc in range(n_groups):  # output column chunks
            cs = slice(cc * LANE, (cc + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RBP, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE

            zeros16 = jnp.zeros((RBP, LANE), jnp.float32)
            outs = [[zeros16] * c for _ in range(3)]  # warped, ddx, ddy
            for i in range(RBP):
                start = pl.multiple_of(ymin_ref[i, cc], 8)
                m0 = rows_local == ylc[i:i + 1]
                m1 = rows_local == ylc[i:i + 1] + 1
                w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE, (cb, LANE))
                w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE, (cb, LANE))
                acc = [jnp.zeros((c, LANE), jnp.float32) for _ in range(4)]
                for g in range(max(0, cc - 1), min(n_groups, cc + 2)):
                    band = jnp.concatenate(
                        [src_ref[pl.ds(ch * h + start, mb),
                                 g * LANE:(g + 1) * LANE]
                         for ch in range(c)], axis=0)  # (C*mb, 128)
                    part0 = jnp.take_along_axis(band, w0, axis=1)
                    part1 = jnp.take_along_axis(band, w1, axis=1)
                    s0 = jnp.broadcast_to(g0[i:i + 1] == g, (cb, LANE))
                    s1 = jnp.broadcast_to(g1[i:i + 1] == g, (cb, LANE))
                    acc[0] += jnp.sum(jnp.where(m0 & s0, part0, 0.0
                                                ).reshape(c, mb, LANE), 1)
                    acc[1] += jnp.sum(jnp.where(m0 & s1, part1, 0.0
                                                ).reshape(c, mb, LANE), 1)
                    acc[2] += jnp.sum(jnp.where(m1 & s0, part0, 0.0
                                                ).reshape(c, mb, LANE), 1)
                    acc[3] += jnp.sum(jnp.where(m1 & s1, part1, 0.0
                                                ).reshape(c, mb, LANE), 1)
                wxr = wx_blk[i:i + 1, cs]  # (1, LANE)
                wyr = wy_blk[i:i + 1, cs]
                dtop = acc[1] - acc[0]
                dbot = acc[3] - acc[2]
                top = acc[0] + wxr * dtop
                bot = acc[2] + wxr * dbot
                warped = top + wyr * (bot - top)
                ddx = dtop + wyr * (dbot - dtop)
                ddy = bot - top
                sel = sel_rows == i
                for ch in range(c):
                    outs[0][ch] = outs[0][ch] + jnp.where(
                        sel, warped[ch:ch + 1], 0.0)
                    outs[1][ch] = outs[1][ch] + jnp.where(
                        sel, ddx[ch:ch + 1], 0.0)
                    outs[2][ch] = outs[2][ch] + jnp.where(
                        sel, ddy[ch:ch + 1], 0.0)

            for ch in range(c):
                warped_chunk = outs[0][ch] * inv255
                out_ref[ch, :, cs] = warped_chunk
                wcur_ref[ch, :, cs] = warped_chunk
                dx_ref[ch, :, cs] = outs[1][ch] * inv255
                dy_ref[ch, :, cs] = outs[2][ch] * inv255

    # ------------- phase 2: score row-block r-1 (SSIM + L1) --------------
    @pl.when(r >= 1)
    def _score():
        col = jax.lax.broadcasted_iota(jnp.int32, (RBP, w), 1)
        is_top = r == 1        # block 0: row -1 reflects to row 1
        is_bot = r == nb       # last block: row H reflects to row H-2

        def win3(ext):
            # ext: (RBP+2, W) rows [top halo; block; bottom halo]
            rows = ext[0:-2] + ext[1:-1] + ext[2:]  # (RBP, W)
            left = pltpu.roll(rows, 1, axis=1)
            right = pltpu.roll(rows, w - 1, axis=1)
            colsum = left + rows + right
            colsum = jnp.where(col == 0, rows + 2.0 * right, colsum)
            colsum = jnp.where(col == w - 1, rows + 2.0 * left, colsum)
            return colsum * (1.0 / 9.0)

        acc = jnp.zeros((RBP, w), jnp.float32)
        for ch in range(c):
            p_blk = wprev_ref[ch]          # (RBP, W) block r-1 warped
            t_blk = tprev_ref[ch]
            p_top = jnp.where(is_top, p_blk[1:2], wpp_ref[ch])
            t_top = jnp.where(is_top, t_blk[1:2], tpp_ref[ch])
            p_bot = jnp.where(is_bot, p_blk[RBP - 2:RBP - 1],
                              wcur_ref[ch, 0:1])
            t_bot = jnp.where(is_bot, t_blk[RBP - 2:RBP - 1],
                              target_ref[ch, 0:1])
            p = jnp.concatenate([p_top, p_blk, p_bot], axis=0)  # (RBP+2, W)
            t = jnp.concatenate([t_top, t_blk, t_bot], axis=0)

            mu_p = win3(p)
            mu_t = win3(t)
            sigma_p = win3(p * p) - mu_p * mu_p
            sigma_t = win3(t * t) - mu_t * mu_t
            sigma_pt = win3(p * t) - mu_p * mu_t

            ssim_n = (2.0 * mu_p * mu_t + _SSIM_C1) * (
                2.0 * sigma_pt + _SSIM_C2)
            ssim_d = (mu_p * mu_p + mu_t * mu_t + _SSIM_C1) * (
                sigma_p + sigma_t + _SSIM_C2)
            dssim = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)
            l1 = jnp.abs(t[1:-1] - p[1:-1])
            acc = acc + (0.85 * dssim + 0.15 * l1) * inv_c
        loss_ref[:] = acc

    # ------------------- phase 3: rotate the carries ---------------------
    @pl.when(r < nb)
    def _rotate():
        for ch in range(c):
            wpp_ref[ch] = wprev_ref[ch, RBP - 1:RBP]
            tpp_ref[ch] = tprev_ref[ch, RBP - 1:RBP]
            wprev_ref[ch] = wcur_ref[ch]
            tprev_ref[ch] = target_ref[ch]


def _warp_loss_fused_v9(src, x0i, yl, ymin, wx, wy, target_p,
                        interpret=False):
    """src (B, C*H, W) raw-u8-valued f32; x0i/yl (B, H, W) i32;
    ymin (B, H, W//LANE) i32; wx/wy (B, H, W) f32; target_p (B, C, H, W)
    f32 -> (loss (B, H, W), warped, ddx, ddy each (B, C, H, W) f32)."""
    b, ch_, w = src.shape
    h = x0i.shape[1]
    c = ch_ // h
    nb = h // RBP
    kernel = functools.partial(_warp_loss_kernel_v9, h, w, c, MB7, nb)
    vm = pltpu.VMEM

    def clamp_r(i, r):
        return (i, jnp.minimum(r, nb - 1), 0)

    row_spec = pl.BlockSpec((None, RBP, w), clamp_r, memory_space=vm)
    plane_spec = pl.BlockSpec(
        (None, c, RBP, w), lambda i, r: (i, 0, jnp.minimum(r, nb - 1), 0),
        memory_space=vm)
    loss, warped, ddx, ddy = pl.pallas_call(
        kernel,
        grid=(b, nb + 1),
        in_specs=[
            pl.BlockSpec((None, ch_, w), lambda i, r: (i, 0, 0),
                         memory_space=vm),
            row_spec, row_spec,
            pl.BlockSpec((None, RBP, w // LANE), clamp_r,
                         memory_space=pltpu.SMEM),
            row_spec, row_spec,
            plane_spec,
        ],
        out_specs=(
            pl.BlockSpec((None, RBP, w),
                         lambda i, r: (i, jnp.maximum(r - 1, 0), 0),
                         memory_space=vm),
            plane_spec, plane_spec, plane_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, RBP, w), jnp.float32),   # wcur
            pltpu.VMEM((c, RBP, w), jnp.float32),   # wprev
            pltpu.VMEM((c, 1, w), jnp.float32),     # wpp (prev last row)
            pltpu.VMEM((c, RBP, w), jnp.float32),   # tprev
            pltpu.VMEM((c, 1, w), jnp.float32),     # tpp
        ],
        interpret=interpret,
        compiler_params=_vmem_params(h, w),
    )(src, x0i, yl, ymin, wx, wy, target_p)
    return loss, warped, ddx, ddy


def _bwd_kernel(inv_c: float, w: int, warped_ref, target_ref, dx_ref,
                dy_ref, g_ref, gx_ref, gy_ref):
    """Fused adjoint for one (batch, channel) plane: the closed-form
    SSIM+L1 cotangent wrt the warped image (same math as
    reproj_loss._bwd_kernel, with the dead target-side cotangent dropped —
    targets are raw input frames) contracted against the saved d/dwx, d/dwy
    planes in VMEM. Outputs accumulate over the channel grid dimension into
    the two (H, W) coordinate cotangents."""
    p = warped_ref[:]
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
        nbr_r = pltpu.roll(gy, 1, axis=1)
        nbr_l = pltpu.roll(gy, w - 1, axis=1)
        s = gy + jnp.where(col == 0, 0.0, nbr_r) \
            + jnp.where(col == w - 1, 0.0, nbr_l)
        s = s + jnp.where(col == 1, gy[:, 0:1], 0.0)
        s = s + jnp.where(col == w - 2, gy[:, w - 1:w], 0.0)
        zero = jnp.zeros_like(s[0:1])
        sz = jnp.concatenate([zero, s, zero], axis=0)
        out = sz[0:-2] + sz[1:-1] + sz[2:]
        out = out + jnp.where(row == 1, s[0:1], 0.0)
        out = out + jnp.where(row == h - 2, s[h - 1:h], 0.0)
        return out * (1.0 / 9.0)

    mu_p = win3(p)
    mu_t = win3(t)
    wp2 = win3(p * p)
    wpt = win3(p * t)
    sigma_p = wp2 - mu_p * mu_p
    sigma_t = win3(t * t) - mu_t * mu_t
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
    dl_dn = -0.5 * gl * inv_dd
    dl_dd = 0.5 * gl * nn * inv_dd * inv_dd

    c_mu_p = dl_dn * 2.0 * mu_t * (n2 - n1) + dl_dd * 2.0 * mu_p * (d2 - d1)
    c_sq = dl_dd * d1
    c_pt = dl_dn * 2.0 * n1

    l1g = (0.15 * inv_c) * g * jnp.sign(p - t)
    gp = l1g + adj3(c_mu_p) + 2.0 * p * adj3(c_sq) + t * adj3(c_pt)

    gx_part = gp * dx_ref[:]
    gy_part = gp * dy_ref[:]

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        gx_ref[:] = gx_part
        gy_ref[:] = gy_part

    @pl.when(c_idx != 0)
    def _():
        gx_ref[:] = gx_ref[:] + gx_part
        gy_ref[:] = gy_ref[:] + gy_part


def _warp_loss_bwd_call(warped, target_p, ddx, ddy, g, interpret=False):
    """warped/target/ddx/ddy (B, C, H, W) f32; g (B, H, W) f32 ->
    (gx, gy) each (B, H, W) f32."""
    b, c, h, w = warped.shape
    plane = pl.BlockSpec((None, None, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    bplane = pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, 1.0 / c, w),
        grid=(b, c),
        in_specs=[plane, plane, plane, plane, bplane],
        out_specs=(bplane, bplane),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.float32)),
        interpret=interpret,
        compiler_params=_vmem_params(h, w),
    )(warped, target_p, ddx, ddy, g)


def _impl(interpret, image, x, y, target_p):
    """-> (loss (B, H, W, 1), warped, ddx, ddy each (B, C, H, W) f32)."""
    b, h, w, c = image.shape
    tgt_f = target_p.astype(jnp.float32)
    if not (image.dtype == jnp.uint8 and h % RBP == 0 and h >= MB7
            and w % LANE == 0):
        # static shape/dtype gate of the channel-packed rungs (the fused
        # kernel's raw-value arithmetic assumes 0..255 uint8 sources)
        warped, ddx, ddy = _sample_impl(8, interpret, image, x, y)
        loss = _loss_forward(warped, tgt_f, interpret=interpret)
        return loss, warped, ddx, ddy

    x0 = jnp.minimum(jnp.floor(x), w - 2)
    y0 = jnp.minimum(jnp.floor(y), h - 2)
    wx = (x - x0).astype(jnp.float32)
    wy = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    col_group = (jnp.arange(w) // LANE)[None, None, :]
    gdiff = x0i // LANE - col_group
    shift_ok = jnp.logical_and(
        jnp.all(gdiff >= -1),
        jnp.all((x0i + 1) // LANE - col_group <= 1))
    ok, raw_img, yl7, m7 = _v8_inputs(image, x0i, y0i, shift_ok, h, w)

    def fused(_):
        loss, warped, ddx, ddy = _warp_loss_fused_v9(
            raw_img, x0i, yl7, m7, wx, wy, tgt_f, interpret=interpret)
        return loss[..., None], warped, ddx, ddy

    def unfused(_):
        # the v8 gate just failed, so _sample_impl lands on a lower rung
        # (v4 / v3 / wide-band / exact XLA) — large motion stays exact
        warped, ddx, ddy = _sample_impl(8, interpret, image, x, y)
        loss = _loss_forward(warped, tgt_f, interpret=interpret)
        return loss, warped, ddx, ddy

    return jax.lax.cond(ok, fused, unfused, operand=None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _warp_loss(interpret, image, x, y, target_p):
    return _impl(interpret, image, x, y, target_p)[0]


def _fwd(interpret, image, x, y, target_p):
    loss, warped, ddx, ddy = _impl(interpret, image, x, y, target_p)
    return loss, (image, target_p, warped, ddx, ddy)


def _bwd(interpret, residuals, g):
    image, target_p, warped, ddx, ddy = residuals
    gx, gy = _warp_loss_bwd_call(
        warped, target_p.astype(jnp.float32), ddx, ddy,
        g[..., 0].astype(jnp.float32), interpret=interpret)
    if jnp.issubdtype(image.dtype, jnp.integer):
        import numpy as np

        g_img = np.zeros(image.shape, jax.dtypes.float0)
    else:
        g_img = jnp.zeros_like(image)
    return g_img, gx, gy, jnp.zeros_like(target_p)


_warp_loss.defvjp(_fwd, _bwd)


def warp_reproj_loss(image, grid, target_p, interpret=False,
                     planar_grid=True):
    """Fused grid_sample(border, align_corners=True) + 0.85*SSIM + 0.15*L1
    against ``target_p``, channel-meaned -> (B, H, W, 1).

    image: (B, H, W, C) uint8 source frame; grid: (B, 2, H, W) planar (or
    (B, H, W, 2) with planar_grid=False) in [-1, 1]; target_p: (B, C, H, W)
    float target. Gradients flow to the grid coordinates only (exact, via
    the saved d/dwx, d/dwy planes) — sources and targets are raw input
    frames inside the training objective, matching grid_sample_fast's
    contract. Callers gate on the same shape rules as the unfused pair
    (W % 128 == 0, H % RBP == 0, plane small enough for the loss kernel's
    VMEM residency).
    """
    b, h, w, c = image.shape
    gx, gy = (grid[:, 0], grid[:, 1]) if planar_grid else (grid[..., 0],
                                                           grid[..., 1])
    x = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    y = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
    return _warp_loss(interpret, image, x, y, target_p)
