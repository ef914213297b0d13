"""Differentiable bilinear image sampling (view-synthesis warp).

TPU-native replacement for the reference's `F.grid_sample(...,
padding_mode="border", align_corners=True)` call on the training hot path
(`/root/reference/trainer.py:534-537`).

Implementation notes (profiled on a v5e, see BASELINE.md):
  * TPU gathers are per-index latency-bound, so the four separate corner
    gathers of the textbook formulation dominate the whole train step.
    `grid_sample` instead issues ONE `lax.gather` of a (2, 2, C) patch per
    output pixel (XLA clamps patch starts in-bounds for free) and lerps the
    four corners from the patch — 4x fewer gather indices.
  * Border clamping is folded into the weight computation: coordinates are
    clamped to [0, W-1], patch starts to [0, W-2], and the lerp weight is
    taken relative to the clamped start, which reproduces torch's border
    semantics exactly (including zero coordinate-gradient outside the
    image); verified against torch in tests/test_warp.py, gradients
    included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(image, grid, planar_grid: bool = False):
    """Bilinear sample `image` at normalized coordinates `grid`.

    Args:
      image: (B, H, W, C) source image (NHWC).
      grid: (B, Ho, Wo, 2) coords in [-1, 1]; grid[..., 0] is x (width axis),
        grid[..., 1] is y, align_corners=True convention (-1 -> pixel 0,
        +1 -> pixel W-1). Out-of-range coords are clamped (border padding).
        With ``planar_grid`` the layout is (B, 2, Ho, Wo) instead
        (ops.geometry.project's planar form — avoids the TPU-hostile
        trailing dim of 2).

    Returns:
      (B, Ho, Wo, C) sampled image, float32.
    """
    b, h, w, c = image.shape
    if planar_grid:
        gx, gy = grid[:, 0], grid[:, 1]
    else:
        gx, gy = grid[..., 0], grid[..., 1]
    ho, wo = gx.shape[1], gx.shape[2]

    # Unnormalize (align_corners=True) and clamp (padding_mode="border").
    x = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    y = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1)

    # Patch start, clamped so the 2x2 slice stays in bounds; weights are
    # relative to the clamped start (wx, wy in [0, 1]).
    x0 = jnp.minimum(jnp.floor(x), w - 2) if w > 1 else jnp.zeros_like(x)
    y0 = jnp.minimum(jnp.floor(y), h - 2) if h > 1 else jnp.zeros_like(y)
    wx = (x - x0).astype(jnp.float32)[..., None]
    wy = (y - y0).astype(jnp.float32)[..., None]

    starts = jnp.stack(
        [y0.reshape(b, -1), x0.reshape(b, -1)], axis=-1).astype(jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_one(img, idx):
        # img (H, W, C); idx (N, 2) -> (N, 2, 2, C) corner patches
        return jax.lax.gather(
            img, idx, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP)

    patches = jax.vmap(gather_one)(image, starts)  # (B, N, 2, 2, C)
    patches = patches.astype(jnp.float32).reshape(b, ho, wo, 2, 2, c)

    top = patches[..., 0, 0, :] + (patches[..., 0, 1, :] -
                                   patches[..., 0, 0, :]) * wx
    bot = patches[..., 1, 0, :] + (patches[..., 1, 1, :] -
                                   patches[..., 1, 0, :]) * wx
    return top + (bot - top) * wy


def grid_sample_takealong(image, grid):
    """Reference jnp formulation (four row gathers via take_along_axis).

    Kept for numerical cross-checks and for platforms where lax.gather
    patch slices lower poorly.
    """
    b, h, w, c = image.shape
    _, ho, wo, _ = grid.shape
    dtype = jnp.float32

    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)[..., None]
    wy = (y - y0).astype(dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = image.reshape(b, h * w, c).astype(dtype)

    def take(yy, xx):
        idx = (yy * w + xx).reshape(b, ho * wo)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(
            b, ho, wo, c)

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy
