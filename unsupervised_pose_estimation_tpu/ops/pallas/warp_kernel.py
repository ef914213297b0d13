"""Banded bilinear-warp corner fetch as a Pallas TPU kernel.

XLA's TPU gather costs ~18 ns per index regardless of layout (measured:
row/patch/lane variants, u8/f32), which makes the view-synthesis warp the
single largest cost of the train step (~240 ms of 364 ms at 640x192 batch
12). This kernel exploits the structure of depth+pose warps: the source rows
needed by an 8-row output block span a narrow band. Per output row-block it

  1. dynamic-slices a BAND_H-row, 8-aligned band of the source plane (VMEM),
  2. fetches both x-taps per 128-wide output chunk with Mosaic lane gathers
     (jnp.take_along_axis along a 128 minor dim — the only gather Mosaic
     supports; verified on v5e), skipping source column-groups outside the
     chunk's x-range at runtime (@pl.when),
  3. resolves the y-taps with masked reductions over the band.

A scalar band-fits check computed in jnp picks between this kernel and the
exact XLA patch-gather fallback via lax.cond, so correctness never depends
on the band assumption.

Gradient contract: the returned corners are piecewise-constant in the
coordinates and independent of any trainable parameter, so
``grid_sample_fast`` wraps them in stop_gradient and carries coordinate
gradients exactly through the outside lerp. Gradients do NOT flow to the
source image (not needed by the training objective — sources are inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_H = 40   # source rows resident per output row-block (8-aligned start)
WIDE_BAND_H = 72  # tail-rung band (v3 kernel) for mid-training y-spreads;
#               184 KB/plane in VMEM — still far from the XLA-gather cliff
LANE = 128
RB = 8        # output rows per block (sublane alignment unit)


def _corner_kernel(h: int, w: int, band_h: int, src_ref, x0_ref, yl_ref,
                   ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """One (batch, channel) plane.

    src:  (H, W) f32 VMEM
    x0:   (H, W) i32 left-tap column per output pixel
    yl:   (H, W) i32 top-tap row local to the row-block's band
    ymin: (H//RB, 1) i32 SMEM 8-aligned band start per output row-block
    out:  4 corner planes (H, W) f32
    """
    n_groups = w // LANE

    def block_body(rb, _):
        r8 = pl.multiple_of(rb * RB, RB)
        band_start = pl.multiple_of(ymin_ref[rb, 0], 8)
        band = src_ref[pl.ds(band_start, band_h), :]  # (band_h, W)
        x0_blk = x0_ref[pl.ds(r8, RB), :]  # (RB, W)
        yl_blk = yl_ref[pl.ds(r8, RB), :]

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (band_h, LANE), 0)

        for c in range(n_groups):  # output column chunks
            cs = slice(c * LANE, (c + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RB, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE
            gmin = jnp.min(g0)
            gmax = jnp.max(g1)

            # per-output-row band samples at both x-taps, accumulated over
            # the <=2 source column groups a typical warp touches; the
            # group guard (scf.if) is hoisted OUT of the row loop — conds
            # are expensive in Mosaic
            b0s = [jnp.zeros((band_h, LANE), jnp.float32)
                   for _ in range(RB)]
            b1s = [jnp.zeros((band_h, LANE), jnp.float32)
                   for _ in range(RB)]
            for g in range(n_groups):  # source column groups
                def visit(ops, g=g):
                    b0s_, b1s_ = ops[:RB], ops[RB:]
                    grp = band[:, g * LANE:(g + 1) * LANE]
                    new0, new1 = [], []
                    for i in range(RB):
                        w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE,
                                              (band_h, LANE))
                        w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE,
                                              (band_h, LANE))
                        part0 = jnp.take_along_axis(grp, w0, axis=1)
                        part1 = jnp.take_along_axis(grp, w1, axis=1)
                        sel0 = jnp.broadcast_to(g0[i:i + 1] == g,
                                                (band_h, LANE))
                        sel1 = jnp.broadcast_to(g1[i:i + 1] == g,
                                                (band_h, LANE))
                        new0.append(jnp.where(sel0, part0, b0s_[i]))
                        new1.append(jnp.where(sel1, part1, b1s_[i]))
                    return tuple(new0 + new1)

                carry = jax.lax.cond(
                    jnp.logical_and(g >= gmin, g <= gmax), visit,
                    lambda ops: ops, tuple(b0s + b1s))
                b0s, b1s = list(carry[:RB]), list(carry[RB:])

            out00 = jnp.zeros((RB, LANE), jnp.float32)
            out01 = jnp.zeros((RB, LANE), jnp.float32)
            out10 = jnp.zeros((RB, LANE), jnp.float32)
            out11 = jnp.zeros((RB, LANE), jnp.float32)
            sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANE), 0)
            for i in range(RB):
                m0 = (rows_iota == ylc[i:i + 1]).astype(jnp.float32)
                m1 = (rows_iota == ylc[i:i + 1] + 1).astype(jnp.float32)
                row00 = jnp.sum(m0 * b0s[i], axis=0, keepdims=True)
                row01 = jnp.sum(m0 * b1s[i], axis=0, keepdims=True)
                row10 = jnp.sum(m1 * b0s[i], axis=0, keepdims=True)
                row11 = jnp.sum(m1 * b1s[i], axis=0, keepdims=True)
                sel_row = sel_rows == i
                out00 = jnp.where(sel_row, row00, out00)
                out01 = jnp.where(sel_row, row01, out01)
                out10 = jnp.where(sel_row, row10, out10)
                out11 = jnp.where(sel_row, row11, out11)

            sl = (pl.ds(r8, RB), cs)
            v00_ref[sl] = out00
            v01_ref[sl] = out01
            v10_ref[sl] = out10
            v11_ref[sl] = out11
        return 0

    jax.lax.fori_loop(0, h // RB, block_body, 0)


MB = 16  # mini-band rows per OUTPUT ROW (v2 kernel); 8-aligned start


def _corner_kernel_v2(h: int, w: int, src_ref, x0_ref, yl_ref, ymin_ref,
                      v00_ref, v01_ref, v10_ref, v11_ref):
    """v2: per-output-row 16-row mini-bands + transposed y-select.

    vs v1: (a) the x-tap lane gathers read a (MB=16, 128) mini-band sliced
    at each output row's own aligned start instead of one (BAND_H=40, 128)
    band per 8-row block — 2.5x fewer gathered elements; (b) the y-taps are
    resolved by transposing the gathered columns to (128, MB) and lane-
    gathering at yl/yl+1 — replacing the 4 masked (40,128) multiply-reduces
    per row. ymin here is per ROW (H, 1) in SMEM.
    """
    n_groups = w // LANE

    def block_body(rb, _):
        r8 = pl.multiple_of(rb * RB, RB)
        x0_blk = x0_ref[pl.ds(r8, RB), :]  # (RB, W)
        yl_blk = yl_ref[pl.ds(r8, RB), :]

        for c in range(n_groups):  # output column chunks
            cs = slice(c * LANE, (c + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RB, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE
            gmin = jnp.min(g0)
            gmax = jnp.max(g1)

            b0s = [jnp.zeros((MB, LANE), jnp.float32) for _ in range(RB)]
            b1s = [jnp.zeros((MB, LANE), jnp.float32) for _ in range(RB)]
            for g in range(n_groups):  # source column groups
                def visit(ops, g=g):
                    b0s_, b1s_ = ops[:RB], ops[RB:]
                    new0, new1 = [], []
                    for i in range(RB):
                        start = pl.multiple_of(ymin_ref[r8 + i, 0], 8)
                        grp = src_ref[pl.ds(start, MB),
                                      g * LANE:(g + 1) * LANE]
                        w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE,
                                              (MB, LANE))
                        w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE,
                                              (MB, LANE))
                        part0 = jnp.take_along_axis(grp, w0, axis=1)
                        part1 = jnp.take_along_axis(grp, w1, axis=1)
                        sel0 = jnp.broadcast_to(g0[i:i + 1] == g,
                                                (MB, LANE))
                        sel1 = jnp.broadcast_to(g1[i:i + 1] == g,
                                                (MB, LANE))
                        new0.append(jnp.where(sel0, part0, b0s_[i]))
                        new1.append(jnp.where(sel1, part1, b1s_[i]))
                    return tuple(new0 + new1)

                carry = jax.lax.cond(
                    jnp.logical_and(g >= gmin, g <= gmax), visit,
                    lambda ops: ops, tuple(b0s + b1s))
                b0s, b1s = list(carry[:RB]), list(carry[RB:])

            out00 = jnp.zeros((RB, LANE), jnp.float32)
            out01 = jnp.zeros((RB, LANE), jnp.float32)
            out10 = jnp.zeros((RB, LANE), jnp.float32)
            out11 = jnp.zeros((RB, LANE), jnp.float32)
            sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANE), 0)
            for i in range(RB):
                # both taps side by side: (128, 2*MB); Mosaic's lane gather
                # needs full-shape indices, so the 4 wanted corners occupy
                # the first 4 index columns and the rest are don't-cares
                bq = jnp.concatenate([b0s[i].T, b1s[i].T], axis=1)
                idx = ylc[i:i + 1].T  # (128, 1)
                idx4 = jnp.concatenate(
                    [idx, idx + MB, idx + 1, idx + MB + 1], axis=1)
                idx_full = jnp.concatenate(
                    [idx4] * (2 * MB // 4), axis=1)  # (128, 2*MB)
                quad = jnp.take_along_axis(bq, idx_full, axis=1)[:, :4]
                quad = quad.T  # (4, 128): v00, v01, v10, v11
                # sub-sublane row stores trip Mosaic; accumulate the block
                # and store (RB, LANE) once per chunk
                sel_row = sel_rows == i
                out00 = jnp.where(sel_row, quad[0:1], out00)
                out01 = jnp.where(sel_row, quad[1:2], out01)
                out10 = jnp.where(sel_row, quad[2:3], out10)
                out11 = jnp.where(sel_row, quad[3:4], out11)
            sl = (pl.ds(r8, RB), cs)
            v00_ref[sl] = out00
            v01_ref[sl] = out01
            v10_ref[sl] = out10
            v11_ref[sl] = out11
        return 0

    jax.lax.fori_loop(0, h // RB, block_body, 0)


def _corner_kernel_v3(h: int, w: int, band_h: int, src_ref, x0_ref, yl_ref,
                      ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """v3: v1's block bands, but the masked y-reduction happens INSIDE the
    per-group visit so the lax.cond carry is only the four (RB, LANE) output
    accumulators (64 KB -> 16 KB at band_h=40) instead of 2*RB full
    (band_h, LANE) tap buffers — the big carry forced VMEM spills on every
    group iteration. Contributions accumulate additively: each output pixel's
    tap lives in exactly one source column group, so cross-group sums never
    overlap."""
    n_groups = w // LANE

    def block_body(rb, _):
        r8 = pl.multiple_of(rb * RB, RB)
        band_start = pl.multiple_of(ymin_ref[rb, 0], 8)
        band = src_ref[pl.ds(band_start, band_h), :]  # (band_h, W)
        x0_blk = x0_ref[pl.ds(r8, RB), :]  # (RB, W)
        yl_blk = yl_ref[pl.ds(r8, RB), :]

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (band_h, LANE), 0)
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANE), 0)

        for c in range(n_groups):  # output column chunks
            cs = slice(c * LANE, (c + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RB, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE
            gmin = jnp.min(g0)
            gmax = jnp.max(g1)

            zeros = jnp.zeros((RB, LANE), jnp.float32)
            outs = (zeros, zeros, zeros, zeros)
            for g in range(n_groups):  # source column groups
                def visit(outs, g=g):
                    o00, o01, o10, o11 = outs
                    grp = band[:, g * LANE:(g + 1) * LANE]
                    for i in range(RB):
                        w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE,
                                              (band_h, LANE))
                        w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE,
                                              (band_h, LANE))
                        part0 = jnp.take_along_axis(grp, w0, axis=1)
                        part1 = jnp.take_along_axis(grp, w1, axis=1)
                        m0 = rows_iota == ylc[i:i + 1]
                        m1 = rows_iota == ylc[i:i + 1] + 1
                        s0 = jnp.broadcast_to(g0[i:i + 1] == g,
                                              (band_h, LANE))
                        s1 = jnp.broadcast_to(g1[i:i + 1] == g,
                                              (band_h, LANE))
                        r00 = jnp.sum(jnp.where(m0 & s0, part0, 0.0),
                                      axis=0, keepdims=True)
                        r01 = jnp.sum(jnp.where(m0 & s1, part1, 0.0),
                                      axis=0, keepdims=True)
                        r10 = jnp.sum(jnp.where(m1 & s0, part0, 0.0),
                                      axis=0, keepdims=True)
                        r11 = jnp.sum(jnp.where(m1 & s1, part1, 0.0),
                                      axis=0, keepdims=True)
                        sel = sel_rows == i
                        o00 = o00 + jnp.where(sel, r00, 0.0)
                        o01 = o01 + jnp.where(sel, r01, 0.0)
                        o10 = o10 + jnp.where(sel, r10, 0.0)
                        o11 = o11 + jnp.where(sel, r11, 0.0)
                    return (o00, o01, o10, o11)

                outs = jax.lax.cond(
                    jnp.logical_and(g >= gmin, g <= gmax), visit,
                    lambda o: o, outs)

            sl = (pl.ds(r8, RB), cs)
            v00_ref[sl], v01_ref[sl], v10_ref[sl], v11_ref[sl] = outs
        return 0

    jax.lax.fori_loop(0, h // RB, block_body, 0)


def _corner_kernel_v4(h: int, w: int, band_h: int, src_ref, x0_ref, yl_ref,
                      ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """v4: ZERO control flow in the chunk loop. The caller guarantees
    |x_tap - output_column| < LANE (checked at runtime outside, ladder
    fallback otherwise), so each output chunk c reads only the STATIC source
    column groups {c-1, c, c+1} — Python-unrolled slices, no scf.if. Mosaic
    conds cost ~100ns+ each and dominated v1/v3 (~5 per chunk x 4.3k chunks);
    here group selection folds into the masked y-reduction for free."""
    n_groups = w // LANE

    def block_body(rb, _):
        r8 = pl.multiple_of(rb * RB, RB)
        band_start = pl.multiple_of(ymin_ref[rb, 0], 8)
        band = src_ref[pl.ds(band_start, band_h), :]  # (band_h, W)
        x0_blk = x0_ref[pl.ds(r8, RB), :]  # (RB, W)
        yl_blk = yl_ref[pl.ds(r8, RB), :]

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (band_h, LANE), 0)
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANE), 0)

        for c in range(n_groups):  # output column chunks
            cs = slice(c * LANE, (c + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RB, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE

            out00 = jnp.zeros((RB, LANE), jnp.float32)
            out01 = jnp.zeros((RB, LANE), jnp.float32)
            out10 = jnp.zeros((RB, LANE), jnp.float32)
            out11 = jnp.zeros((RB, LANE), jnp.float32)
            for g in range(max(0, c - 1), min(n_groups, c + 2)):
                grp = band[:, g * LANE:(g + 1) * LANE]
                for i in range(RB):
                    w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE,
                                          (band_h, LANE))
                    w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE,
                                          (band_h, LANE))
                    part0 = jnp.take_along_axis(grp, w0, axis=1)
                    part1 = jnp.take_along_axis(grp, w1, axis=1)
                    m0 = rows_iota == ylc[i:i + 1]
                    m1 = rows_iota == ylc[i:i + 1] + 1
                    s0 = jnp.broadcast_to(g0[i:i + 1] == g, (band_h, LANE))
                    s1 = jnp.broadcast_to(g1[i:i + 1] == g, (band_h, LANE))
                    r00 = jnp.sum(jnp.where(m0 & s0, part0, 0.0),
                                  axis=0, keepdims=True)
                    r01 = jnp.sum(jnp.where(m0 & s1, part1, 0.0),
                                  axis=0, keepdims=True)
                    r10 = jnp.sum(jnp.where(m1 & s0, part0, 0.0),
                                  axis=0, keepdims=True)
                    r11 = jnp.sum(jnp.where(m1 & s1, part1, 0.0),
                                  axis=0, keepdims=True)
                    sel = sel_rows == i
                    out00 = out00 + jnp.where(sel, r00, 0.0)
                    out01 = out01 + jnp.where(sel, r01, 0.0)
                    out10 = out10 + jnp.where(sel, r10, 0.0)
                    out11 = out11 + jnp.where(sel, r11, 0.0)

            sl = (pl.ds(r8, RB), cs)
            v00_ref[sl] = out00
            v01_ref[sl] = out01
            v10_ref[sl] = out10
            v11_ref[sl] = out11
        return 0

    jax.lax.fori_loop(0, h // RB, block_body, 0)


def _corner_kernel_v5(h: int, w: int, band_h: int, src_ref, x0_ref, yl_ref,
                      ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """v5: v4's static 3-group window + both x-taps packed into ONE lane
    gather per (group, row) — the band is stacked twice vertically and the
    index tile carries w0 rows on top and w1 rows below, halving the gather
    op count (op issue, not data volume, is what the VPU pays for here)."""
    n_groups = w // LANE
    bh2 = 2 * band_h

    def block_body(rb, _):
        r8 = pl.multiple_of(rb * RB, RB)
        band_start = pl.multiple_of(ymin_ref[rb, 0], 8)
        band = src_ref[pl.ds(band_start, band_h), :]  # (band_h, W)
        band2 = jnp.concatenate([band, band], axis=0)  # (2*band_h, W)
        x0_blk = x0_ref[pl.ds(r8, RB), :]  # (RB, W)
        yl_blk = yl_ref[pl.ds(r8, RB), :]

        rows2 = jax.lax.broadcasted_iota(jnp.int32, (bh2, LANE), 0)
        top = rows2 < band_h           # tap-0 copy of the band
        rows_local = jnp.where(top, rows2, rows2 - band_h)
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANE), 0)

        for c in range(n_groups):  # output column chunks
            cs = slice(c * LANE, (c + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RB, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE

            out00 = jnp.zeros((RB, LANE), jnp.float32)
            out01 = jnp.zeros((RB, LANE), jnp.float32)
            out10 = jnp.zeros((RB, LANE), jnp.float32)
            out11 = jnp.zeros((RB, LANE), jnp.float32)
            for g in range(max(0, c - 1), min(n_groups, c + 2)):
                grp2 = band2[:, g * LANE:(g + 1) * LANE]  # (2*band_h, 128)
                for i in range(RB):
                    w01 = jnp.where(top, jnp.broadcast_to(x0c[i:i + 1],
                                                          (bh2, LANE)),
                                    jnp.broadcast_to(x1c[i:i + 1],
                                                     (bh2, LANE)))
                    part = jnp.take_along_axis(grp2, w01 % LANE, axis=1)
                    in_g0 = jnp.broadcast_to(g0[i:i + 1] == g, (bh2, LANE))
                    in_g1 = jnp.broadcast_to(g1[i:i + 1] == g, (bh2, LANE))
                    m_y0 = rows_local == ylc[i:i + 1]
                    m_y1 = rows_local == ylc[i:i + 1] + 1
                    s_tap0 = top & in_g0
                    s_tap1 = jnp.logical_not(top) & in_g1
                    r00 = jnp.sum(jnp.where(m_y0 & s_tap0, part, 0.0),
                                  axis=0, keepdims=True)
                    r01 = jnp.sum(jnp.where(m_y0 & s_tap1, part, 0.0),
                                  axis=0, keepdims=True)
                    r10 = jnp.sum(jnp.where(m_y1 & s_tap0, part, 0.0),
                                  axis=0, keepdims=True)
                    r11 = jnp.sum(jnp.where(m_y1 & s_tap1, part, 0.0),
                                  axis=0, keepdims=True)
                    sel = sel_rows == i
                    out00 = out00 + jnp.where(sel, r00, 0.0)
                    out01 = out01 + jnp.where(sel, r01, 0.0)
                    out10 = out10 + jnp.where(sel, r10, 0.0)
                    out11 = out11 + jnp.where(sel, r11, 0.0)

            sl = (pl.ds(r8, RB), cs)
            v00_ref[sl] = out00
            v01_ref[sl] = out01
            v10_ref[sl] = out10
            v11_ref[sl] = out11
        return 0

    jax.lax.fori_loop(0, h // RB, block_body, 0)


RBP = 16  # output rows per block in the channel-packed kernel (bf16 stores
# need 16-sublane alignment)


def _corner_kernel_v6(h: int, w: int, c: int, band_h: int, src_ref, x0_ref,
                      yl_ref, ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """v6: channel-packed v4. One program per BATCH element; the C channel
    bands stack vertically so each lane gather fetches ALL channels at once
    (3x fewer gather/mask ops than per-plane programs). Sources arrive as
    raw 0..255-valued f32; corners store as bf16, which represents those
    integers exactly (<= 2^8), quartering the corner write traffic.

    src: (C*H, W) f32 raw-u8-valued; x0/yl: (H, W) i32 shared by channels;
    ymin: (H//RBP, 1) SMEM; outs: 4x (C*H, W) bf16.
    """
    n_groups = w // LANE
    cb = c * band_h

    def block_body(rb, _):
        r16 = pl.multiple_of(rb * RBP, RBP)
        start = pl.multiple_of(ymin_ref[rb, 0], 8)
        band = jnp.concatenate(
            [src_ref[pl.ds(ch * h + start, band_h), :] for ch in range(c)],
            axis=0)  # (C*band_h, W)
        x0_blk = x0_ref[pl.ds(r16, RBP), :]  # (RBP, W)
        yl_blk = yl_ref[pl.ds(r16, RBP), :]

        rows2 = jax.lax.broadcasted_iota(jnp.int32, (cb, LANE), 0)
        rows_local = rows2 % band_h
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RBP, LANE), 0)

        for cc in range(n_groups):  # output column chunks
            cs = slice(cc * LANE, (cc + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RBP, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE

            zeros = jnp.zeros((RBP, LANE), jnp.float32)
            outs = [[zeros] * c for _ in range(4)]
            for g in range(max(0, cc - 1), min(n_groups, cc + 2)):
                grp = band[:, g * LANE:(g + 1) * LANE]  # (C*band_h, 128)
                for i in range(RBP):
                    w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE, (cb, LANE))
                    w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE, (cb, LANE))
                    part0 = jnp.take_along_axis(grp, w0, axis=1)
                    part1 = jnp.take_along_axis(grp, w1, axis=1)
                    m0 = rows_local == ylc[i:i + 1]
                    m1 = rows_local == ylc[i:i + 1] + 1
                    s0 = jnp.broadcast_to(g0[i:i + 1] == g, (cb, LANE))
                    s1 = jnp.broadcast_to(g1[i:i + 1] == g, (cb, LANE))
                    # per-channel one-hot row sums: (C, band_h, 128) -> (C, 128)
                    quads = [
                        jnp.sum(jnp.where(m0 & s0, part0, 0.0).reshape(
                            c, band_h, LANE), axis=1),
                        jnp.sum(jnp.where(m0 & s1, part1, 0.0).reshape(
                            c, band_h, LANE), axis=1),
                        jnp.sum(jnp.where(m1 & s0, part0, 0.0).reshape(
                            c, band_h, LANE), axis=1),
                        jnp.sum(jnp.where(m1 & s1, part1, 0.0).reshape(
                            c, band_h, LANE), axis=1),
                    ]
                    sel = sel_rows == i
                    for k in range(4):
                        for ch in range(c):
                            outs[k][ch] = outs[k][ch] + jnp.where(
                                sel, quads[k][ch:ch + 1], 0.0)

            for ch in range(c):
                sl = (pl.ds(ch * h + r16, RBP), cs)
                v00_ref[sl] = outs[0][ch].astype(jnp.bfloat16)
                v01_ref[sl] = outs[1][ch].astype(jnp.bfloat16)
                v10_ref[sl] = outs[2][ch].astype(jnp.bfloat16)
                v11_ref[sl] = outs[3][ch].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, h // RBP, block_body, 0)


MB7 = 16  # v7 miniband rows per (output row, column chunk); 8-aligned start


def _corner_kernel_v7(h: int, w: int, c: int, src_ref, x0_ref, yl_ref,
                      ymin_ref, v00_ref, v01_ref, v10_ref, v11_ref):
    """v7: v6's channel packing + per-(output row, column chunk) 16-row
    minibands. The masked y-reduction shrinks from (C*40, 128) tiles to
    (C*16, 128) — 2.5x less VPU work on the dominant ops — at the price of
    per-row dynamic slices of the source (scalar 8-aligned starts from
    SMEM). Group window is v4's static {c-1, c, c+1}; corner rows accumulate
    over groups on (C, 128) tiles and merge into the (RBP, LANE) output
    block once per row.

    src: (C*H, W) f32 raw-u8-valued; x0: (H, W) i32; yl: (H, W) i32 y-tap
    LOCAL to the row+chunk's miniband; ymin: (H, W//LANE) i32 SMEM;
    outs: 4x (C*H, W) bf16.
    """
    n_groups = w // LANE
    cb = c * MB7

    def block_body(rb, _):
        r16 = pl.multiple_of(rb * RBP, RBP)
        x0_blk = x0_ref[pl.ds(r16, RBP), :]  # (RBP, W)
        yl_blk = yl_ref[pl.ds(r16, RBP), :]

        rows_local = jax.lax.broadcasted_iota(
            jnp.int32, (cb, LANE), 0) % MB7
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (RBP, LANE), 0)

        for cc in range(n_groups):  # output column chunks
            cs = slice(cc * LANE, (cc + 1) * LANE)
            x0c = x0_blk[:, cs]  # (RBP, 128)
            ylc = yl_blk[:, cs]
            x1c = x0c + 1
            g0 = x0c // LANE
            g1 = x1c // LANE

            zeros16 = jnp.zeros((RBP, LANE), jnp.float32)
            outs = [[zeros16] * c for _ in range(4)]
            for i in range(RBP):
                start = pl.multiple_of(ymin_ref[r16 + i, cc], 8)
                m0 = rows_local == ylc[i:i + 1]
                m1 = rows_local == ylc[i:i + 1] + 1
                w0 = jnp.broadcast_to(x0c[i:i + 1] % LANE, (cb, LANE))
                w1 = jnp.broadcast_to(x1c[i:i + 1] % LANE, (cb, LANE))
                acc = [jnp.zeros((c, LANE), jnp.float32) for _ in range(4)]
                for g in range(max(0, cc - 1), min(n_groups, cc + 2)):
                    band = jnp.concatenate(
                        [src_ref[pl.ds(ch * h + start, MB7),
                                 g * LANE:(g + 1) * LANE]
                         for ch in range(c)], axis=0)  # (C*MB7, 128)
                    part0 = jnp.take_along_axis(band, w0, axis=1)
                    part1 = jnp.take_along_axis(band, w1, axis=1)
                    s0 = jnp.broadcast_to(g0[i:i + 1] == g, (cb, LANE))
                    s1 = jnp.broadcast_to(g1[i:i + 1] == g, (cb, LANE))
                    acc[0] += jnp.sum(jnp.where(m0 & s0, part0, 0.0
                                                ).reshape(c, MB7, LANE), 1)
                    acc[1] += jnp.sum(jnp.where(m0 & s1, part1, 0.0
                                                ).reshape(c, MB7, LANE), 1)
                    acc[2] += jnp.sum(jnp.where(m1 & s0, part0, 0.0
                                                ).reshape(c, MB7, LANE), 1)
                    acc[3] += jnp.sum(jnp.where(m1 & s1, part1, 0.0
                                                ).reshape(c, MB7, LANE), 1)
                sel = sel_rows == i
                for k in range(4):
                    for ch in range(c):
                        outs[k][ch] = outs[k][ch] + jnp.where(
                            sel, acc[k][ch:ch + 1], 0.0)

            for ch in range(c):
                sl = (pl.ds(ch * h + r16, RBP), cs)
                v00_ref[sl] = outs[0][ch].astype(jnp.bfloat16)
                v01_ref[sl] = outs[1][ch].astype(jnp.bfloat16)
                v10_ref[sl] = outs[2][ch].astype(jnp.bfloat16)
                v11_ref[sl] = outs[3][ch].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, h // RBP, block_body, 0)


def _warp_lerp_kernel_v8(h: int, w: int, c: int, mb: int, src_ref, x0_ref,
                         yl_ref, ymin_ref, wx_ref, wy_ref, out_ref, dx_ref,
                         dy_ref):
    """v8: v7's channel-packed miniband corner fetch + IN-KERNEL bilinear
    lerp. The four corner planes never leave VMEM: the kernel emits the
    warped image and the two exact coordinate-gradient planes
    (d out / d wx, d out / d wy) instead, killing the separate XLA lerp
    pass (which re-read all four corner planes from HBM) and shrinking the
    backward residuals from 4 corner planes to 2 gradient planes.

    Grid is (batch, row-block): the source plane block is constant across
    the row dimension (fetched once per batch element); coordinate/weight
    inputs and the three outputs stream in RBP-row blocks.

    ``mb`` is the miniband height (16, or 8 when every (row, chunk)'s
    y-span fits 8 rows): the masked y-reduction — the kernel's dominant
    VPU cost — runs on (C*mb, LANE) tiles, so halving mb halves it.

    src: (C*H, W) f32 raw-u8-valued (full plane); x0/yl/wx/wy: (RBP, W)
    blocks; ymin: (RBP, W//LANE) i32 SMEM; outs: 3x (C, RBP, W) f32 scaled
    to [0, 1] (x 1/255 folded in here).
    """
    n_groups = w // LANE
    cb = c * mb
    inv255 = 1.0 / 255.0

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
            # bilinear lerp on the VMEM-resident corners (c, LANE)
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
            out_ref[ch, :, cs] = outs[0][ch] * inv255
            dx_ref[ch, :, cs] = outs[1][ch] * inv255
            dy_ref[ch, :, cs] = outs[2][ch] * inv255


def _warp_lerp_fused_v8(src, x0i, yl, ymin, wx, wy, mb=MB7,
                        interpret=False):
    """src (B, C*H, W) raw-u8-valued f32; x0i/yl (B, H, W) i32;
    ymin (B, H, W//LANE) i32; wx/wy (B, H, W) f32
    -> (warped, ddx, ddy) each (B, C, H, W) f32 scaled to [0, 1]."""
    b, ch_, w = src.shape
    h = x0i.shape[1]
    c = ch_ // h
    kernel = functools.partial(_warp_lerp_kernel_v8, h, w, c, mb)
    vm = pltpu.VMEM
    row_spec = pl.BlockSpec((None, RBP, w), lambda i, r: (i, r, 0),
                            memory_space=vm)
    return pl.pallas_call(
        kernel,
        grid=(b, h // RBP),
        in_specs=[
            pl.BlockSpec((None, ch_, w), lambda i, r: (i, 0, 0),
                         memory_space=vm),
            row_spec,
            row_spec,
            pl.BlockSpec((None, RBP, w // LANE), lambda i, r: (i, r, 0),
                         memory_space=pltpu.SMEM),
            row_spec,
            row_spec,
        ],
        out_specs=tuple(
            pl.BlockSpec((None, c, RBP, w), lambda i, r: (i, 0, r, 0),
                         memory_space=vm)
            for _ in range(3)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, c, h, w), jnp.float32)
                        for _ in range(3)),
        interpret=interpret,
    )(src, x0i, yl, ymin, wx, wy)


def _fetch_corners_packed_v7(src, x0i, yl, ymin, interpret=False):
    """src (B, C*H, W) raw-u8-valued f32; x0i/yl (B, H, W) i32;
    ymin (B, H, W//LANE) i32 -> 4 corner arrays (B, C*H, W) bf16."""
    b, ch_, w = src.shape
    h = x0i.shape[1]
    c = ch_ // h
    kernel = functools.partial(_corner_kernel_v7, h, w, c)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, ch_, w), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h, w // LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((None, ch_, w), lambda i: (i, 0, 0),
                         memory_space=vm)
            for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, ch_, w), jnp.bfloat16)
                        for _ in range(4)),
        interpret=interpret,
    )(src, x0i, yl, ymin)


def _fetch_corners_packed(src, x0i, yl, ymin, band_h, interpret=False):
    """src (B, C*H, W) raw-u8-valued f32; x0i/yl (B, H, W) i32;
    ymin (B, H//RBP, 1) i32 -> 4 corner arrays (B, C*H, W) bf16."""
    b, ch_, w = src.shape
    h = x0i.shape[1]
    c = ch_ // h
    kernel = functools.partial(_corner_kernel_v6, h, w, c, band_h)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, ch_, w), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h // RBP, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((None, ch_, w), lambda i: (i, 0, 0),
                         memory_space=vm)
            for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, ch_, w), jnp.bfloat16)
                        for _ in range(4)),
        interpret=interpret,
    )(src, x0i, yl, ymin)
    return out


def _fetch_corners(src, x0i, yl, ymin, interpret=False, version=3,
                   band_h=None):
    """src (P, H, W) f32; x0i/yl (P, H, W) i32; ymin i32 (P, H, 1) for v2 /
    (P, H//RB, 1) for v1/v3 -> 4 corner arrays (P, H, W) f32.
    P = batch*channel planes."""
    p, h, w = src.shape
    band_h = band_h or BAND_H
    if version == 2:
        kernel = functools.partial(_corner_kernel_v2, h, w)
    else:
        kern = {1: _corner_kernel, 3: _corner_kernel_v3,
                4: _corner_kernel_v4, 5: _corner_kernel_v5}[version]
        kernel = functools.partial(kern, h, w, band_h)
    vm = pltpu.VMEM
    n_ymin = h if version == 2 else h // RB
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((None, n_ymin, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0), memory_space=vm)
            for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((p, h, w), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
    )(src, x0i, yl, ymin)
    return out


def _v8_inputs(image, x0i, y0i, shift_ok, h, w):
    """Predicate + kernel-layout inputs for the channel-packed miniband
    rungs (v7/v8/v9): returns (ok, raw_img (B, C*H, W) f32, yl7, m7).

    Shared by _sample_impl's top rungs and the fused warp+reproj-loss op
    (ops.pallas.warp_loss) so the dispatch gates can never drift apart."""
    b = image.shape[0]
    c = image.shape[-1]
    yb7 = y0i.reshape(b, h, w // LANE, LANE)
    y_mn = jnp.min(yb7, axis=3)  # (B, H, W//LANE)
    y_mx = jnp.max(yb7, axis=3)
    m7 = jnp.clip((y_mn // 8) * 8, 0, h - MB7)
    ok7 = jnp.all(y_mx + 1 - m7 <= MB7 - 1)
    ok7 = jnp.logical_and(ok7, shift_ok)
    yl7 = jnp.clip(y0i - jnp.repeat(m7, LANE, axis=2), 0, MB7 - 2)
    raw_img = jnp.moveaxis(image.astype(jnp.float32), -1, 1
                           ).reshape(b, c * h, w)
    return ok7, raw_img, yl7, m7


def _sample_impl(version, interpret, image, x, y):
    """Dispatch ladder; returns (warped, ddx, ddy), all (B, C, H, W) f32.

    ddx/ddy are the exact per-pixel coordinate gradients d warped / d wx
    and d warped / d wy of the bilinear lerp (piecewise in the corners,
    which are constants wrt the objective). Every rung returns the same
    triple so the whole ladder sits under ONE custom_vjp
    (grid_sample_fast): the backward pass is two multiply-reduces against
    the saved gradient planes instead of re-deriving the lerp from four
    corner planes.
    """
    b, h, w, c = image.shape
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img * (1.0 / 255.0)

    x0 = jnp.minimum(jnp.floor(x), w - 2)
    y0 = jnp.minimum(jnp.floor(y), h - 2)
    wxp = (x - x0)[:, None]  # (B, 1, H, W)
    wyp = (y - y0)[:, None]

    x0i = x0.astype(jnp.int32)  # (B, H, W)
    y0i = y0.astype(jnp.int32)

    def corners_to_triple(v00, v01, v10, v11):
        v00 = v00.astype(jnp.float32)
        v01 = v01.astype(jnp.float32)
        v10 = v10.astype(jnp.float32)
        v11 = v11.astype(jnp.float32)
        dtop = v01 - v00
        dbot = v11 - v10
        top = v00 + dtop * wxp
        bot = v10 + dbot * wxp
        warped = top + (bot - top) * wyp
        ddx = dtop + (dbot - dtop) * wyp
        ddy = bot - top
        return warped, ddx, ddy

    def make_fast(ymin, yl, yl_max, band_h, kern_version=None):
        def fast(_):
            planes = jnp.moveaxis(img, -1, 1).reshape(b * c, h, w)

            def rep(a):  # tile per-channel (plane index = b*C + ch)
                return jnp.repeat(a, c, axis=0)

            v = _fetch_corners(
                planes, rep(x0i), rep(jnp.clip(yl, 0, yl_max)),
                rep(ymin[..., None]), interpret=interpret,
                version=kern_version or min(version, 5), band_h=band_h)
            return corners_to_triple(*(a.reshape(b, c, h, w) for a in v))

        return fast

    def slow(_):
        # exact XLA patch-gather path (ops.warp.grid_sample internals)
        starts = jnp.stack([y0.reshape(b, -1), x0.reshape(b, -1)],
                           axis=-1).astype(jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))

        def gather_one(im, idx):
            return jax.lax.gather(im, idx, dnums, slice_sizes=(2, 2, c),
                                  mode=jax.lax.GatherScatterMode.CLIP)

        patches = jax.vmap(gather_one)(img, starts).reshape(
            b, h, w, 2, 2, c)
        return corners_to_triple(
            *(jnp.moveaxis(patches[..., i, j, :], -1, 1)
              for i in (0, 1) for j in (0, 1)))

    if version == 2:
        # 8-aligned mini-band start per output ROW; +1 y-tap must fit too
        ymin = (jnp.min(y0i, axis=2) // 8) * 8  # (B, H)
        ymin = jnp.clip(ymin, 0, h - MB)
        span = jnp.max(y0i, axis=2) + 1 - ymin
        band_ok = jnp.all(span <= MB - 1)
        fast = make_fast(ymin, y0i - ymin[..., None], MB - 2, None,
                         kern_version=2)
        return jax.lax.cond(band_ok, fast, slow, operand=None)

    # 8-aligned band start per output row-BLOCK; try narrow band, then
    # wide band, then the XLA fallback
    y_blk = y0i.reshape(b, h // RB, RB * w)
    blk_min = (jnp.min(y_blk, axis=2) // 8) * 8  # (B, H//RB)
    blk_max = jnp.max(y_blk, axis=2)
    if version >= 4:
        # v4+ additionally need every x-tap within one group of its
        # output column (|x - col| < LANE); otherwise fall back to the
        # cond-guarded v3 kernel before the XLA path
        col_group = (jnp.arange(w) // LANE)[None, None, :]
        gdiff = x0i // LANE - col_group
        shift_ok = jnp.logical_and(
            jnp.all(gdiff >= -1),
            jnp.all((x0i + 1) // LANE - col_group <= 1))
        rungs = [(4 if version >= 6 else version, True), (3, False)]
    else:
        rungs = [(version, False)]
    band_h = min(BAND_H, h)
    ymin = jnp.clip(blk_min, 0, h - band_h)
    band_ok = jnp.all(blk_max + 1 - ymin <= band_h - 1)
    yl = y0i - jnp.repeat(ymin, RB, axis=1)[..., None]
    tail = slow
    if h > WIDE_BAND_H >= band_h:
        # wide-band v3 rung between the 40-row rungs and the XLA gather:
        # mid-training flows (y-spread ~12-30 px inside a row-block, common
        # before pose converges) overflow the 40-row band but fit 72 rows —
        # without this they fell off the ~6 ms kernel cliff onto the ~31
        # ms/warp exact-XLA path (r4 bench root-cause, BASELINE.md)
        ymin_w = jnp.clip(blk_min, 0, h - WIDE_BAND_H)
        band_ok_w = jnp.all(blk_max + 1 - ymin_w <= WIDE_BAND_H - 1)
        yl_w = y0i - jnp.repeat(ymin_w, RB, axis=1)[..., None]
        fast_w = make_fast(ymin_w, yl_w, WIDE_BAND_H - 2, WIDE_BAND_H,
                           kern_version=3)
        tail = functools.partial(
            lambda ok_, fast_, tail_, _: jax.lax.cond(
                ok_, fast_, tail_, operand=None), band_ok_w, fast_w, tail)
    for kern_version, needs_shift in reversed(rungs):
        ok = (jnp.logical_and(band_ok, shift_ok) if needs_shift
              else band_ok)
        fast = make_fast(ymin, yl, band_h - 2, band_h, kern_version)
        tail = functools.partial(
            lambda ok_, fast_, tail_, _: jax.lax.cond(
                ok_, fast_, tail_, operand=None), ok, fast, tail)

    if (version >= 7 and image.dtype == jnp.uint8 and h % RBP == 0
            and h >= MB7 and w % LANE == 0):
        # per-(row, chunk) miniband top rungs: uint8 sources only (bf16
        # corners / raw-value arithmetic are exact for 0..255 values)
        ok7, raw_img, yl7, m7 = _v8_inputs(image, x0i, y0i, shift_ok, h, w)

        if version >= 8:
            wx_f = wxp[:, 0].astype(jnp.float32)
            wy_f = wyp[:, 0].astype(jnp.float32)

            def fast8(_):
                return _warp_lerp_fused_v8(raw_img, x0i, yl7, m7, wx_f,
                                           wy_f, interpret=interpret)
        else:
            def fast8(_):
                v = _fetch_corners_packed_v7(raw_img, x0i, yl7, m7,
                                             interpret=interpret)
                return corners_to_triple(
                    *(a.reshape(b, c, h, w).astype(jnp.float32)
                      * (1.0 / 255.0) for a in v))

        tail = functools.partial(
            lambda ok_, fast_, tail_, _: jax.lax.cond(
                ok_, fast_, tail_, operand=None), ok7, fast8, tail)

        # NOTE a narrower 8-row miniband rung (half the masked y-reduction
        # rows) was tried and removed: Mosaic requires 8-aligned sublane
        # starts for the f32 vector loads, and an 8-row band over an
        # 8-aligned start has ZERO slack, so a full-height warp (which
        # covers every y%8 phase) always has a 128-chunk whose 2-row span
        # crosses an 8-boundary — the all()-gated rung can never fire.
        # 4-aligned starts fix eligibility but fail Mosaic's alignment
        # proof ("index in dimension 1 is a multiple of 8").
    if (version == 6 and image.dtype == jnp.uint8 and h % RBP == 0
            and h >= band_h):
        # channel-packed top rung: uint8 sources only (bf16 corners are
        # exact for raw 0..255 values)
        yb6 = y0i.reshape(b, h // RBP, RBP * w)
        m6 = jnp.clip((jnp.min(yb6, axis=2) // 8) * 8, 0, h - band_h)
        ok6 = jnp.all(jnp.max(yb6, axis=2) + 1 - m6 <= band_h - 1)
        ok6 = jnp.logical_and(ok6, shift_ok)
        yl6 = jnp.clip(y0i - jnp.repeat(m6, RBP, axis=1)[..., None],
                       0, band_h - 2)

        def fast6(_):
            raw = jnp.moveaxis(image.astype(jnp.float32), -1, 1
                               ).reshape(b, c * h, w)
            v = _fetch_corners_packed(raw, x0i, yl6, m6[..., None],
                                      band_h, interpret=interpret)
            return corners_to_triple(
                *(a.reshape(b, c, h, w).astype(jnp.float32)
                  * (1.0 / 255.0) for a in v))

        tail = functools.partial(
            lambda ok_, fast_, tail_, _: jax.lax.cond(
                ok_, fast_, tail_, operand=None), ok6, fast6, tail)
    return tail(None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sample_planar(version, interpret, image, x, y):
    return _sample_impl(version, interpret, image, x, y)[0]


def _sample_planar_fwd(version, interpret, image, x, y):
    warped, ddx, ddy = _sample_impl(version, interpret, image, x, y)
    return warped, (image, ddx, ddy)


def _sample_planar_bwd(version, interpret, residuals, g):
    image, ddx, ddy = residuals
    gx = jnp.sum(g * ddx, axis=1)  # (B, H, W)
    gy = jnp.sum(g * ddy, axis=1)
    if jnp.issubdtype(image.dtype, jnp.integer):
        import numpy as np
        g_img = np.zeros(image.shape, jax.dtypes.float0)
    else:
        g_img = jnp.zeros_like(image)  # no image gradient (contract); DCEd
    return g_img, gx, gy


_sample_planar.defvjp(_sample_planar_fwd, _sample_planar_bwd)


def grid_sample_fast(image, grid, interpret=False, planar_out=False,
                     version=8, planar_grid=False):
    """Bilinear sample with torch grid_sample(border, align_corners=True)
    semantics; NO gradient to `image` (the corners are constants wrt the
    objective; exact coordinate gradients via saved d/dwx, d/dwy planes).

    image: (B, H, W, C) uint8 or float; grid: (B, H, W, 2) in [-1, 1], or
    (B, 2, H, W) with ``planar_grid`` (the layout ops.geometry.project emits
    with planar=True — skips the pathological 2-minor-dim tiling entirely).
    Requires W % 128 == 0, H % 8 == 0 and H >= 16; callers use
    ops.warp.grid_sample for other shapes. With ``planar_out`` the result
    stays channel-planar (B, C, H, W) — the loss pipeline consumes planar,
    so the NHWC round-trip is skipped entirely.

    Runtime dispatch ladder (default): the lerp-fused channel-packed
    miniband v8 kernel for uint8 sources when both the 16-row y-miniband
    and the |x-shift|<128 window fit (typical depth+pose warps), else the
    per-plane v4, else the cond-guarded v3 kernel for large motion (e.g.
    strong stereo disparity or fast vertical pans), else the exact XLA
    patch-gather — large motion degrades gracefully instead of falling off
    a cliff. Measured on 1x v5e at 640x192x12x3: XLA 42.6 ms, v1 8.7,
    v3 5.9, v4/v6 ~3.9, v7 2.84 ms/warp (corners + XLA lerp); v8 folds the
    lerp into the kernel and emits gradient planes directly.
    """
    b, h, w, c = image.shape
    gx, gy = (grid[:, 0], grid[:, 1]) if planar_grid else (grid[..., 0],
                                                           grid[..., 1])
    x = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    y = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
    out = _sample_planar(version, interpret, image, x, y)
    return out if planar_out else jnp.moveaxis(out, 1, -1)
