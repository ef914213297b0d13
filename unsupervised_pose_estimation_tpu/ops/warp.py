"""Differentiable bilinear image sampling (view-synthesis warp).

TPU-native replacement for the reference's `F.grid_sample(...,
padding_mode="border", align_corners=True)` call on the training hot path
(`/root/reference/trainer.py:534-537`). Implemented as a batched gather +
lerp in pure jnp; XLA lowers the four corner reads to a single fused gather
per image and fuses the lerp arithmetic. Gradients flow both into the source
image (scatter-add) and into the sampling coordinates (through the lerp
weights); coordinates clamped at the border get zero coordinate-gradient,
matching torch's border padding semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(image, grid):
    """Bilinear sample `image` at normalized coordinates `grid`.

    Args:
      image: (B, H, W, C) source image (NHWC).
      grid: (B, Ho, Wo, 2) coords in [-1, 1]; grid[..., 0] is x (width axis),
        grid[..., 1] is y, align_corners=True convention (-1 -> pixel 0,
        +1 -> pixel W-1). Out-of-range coords are clamped (border padding).

    Returns:
      (B, Ho, Wo, C) sampled image.
    """
    b, h, w, c = image.shape
    _, ho, wo, _ = grid.shape
    dtype = image.dtype

    # Unnormalize (align_corners=True) and clamp (padding_mode="border").
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

    # Flatten spatial dims and gather the four corners per batch element.
    flat = image.reshape(b, h * w, c)

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
