"""Image resizing helpers with PyTorch-compatible semantics.

The reference uses `F.interpolate(mode="bilinear", align_corners=False)` to
bring multi-scale disparities to full resolution (`/root/reference/
trainer.py:500-501`) and PIL Lanczos for the host-side image pyramid
(`/root/reference/datasets/mono_dataset2.py:85-89`). We resize on device:
``jax.image.resize`` uses half-pixel centers, which is exactly PyTorch's
align_corners=False convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, height: int, width: int):
    """Bilinear resize of NHWC `x` to (height, width), half-pixel centers
    (== torch align_corners=False)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method="bilinear")


def resize_nearest(x, height: int, width: int):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method="nearest")


def upsample2x_nearest(x):
    """2x nearest upsample (upstream monodepth2 decoder variant,
    `/root/reference/layers.py:267-270`)."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


def image_pyramid(x, num_scales: int, method: str = "lanczos3"):
    """Device-side multi-scale pyramid: scale s has shape (H/2^s, W/2^s).

    Replaces the reference's per-item host-side PIL-ANTIALIAS resize chain
    (`/root/reference/datasets/mono_dataset2.py:110-115`); lanczos3 is the
    anti-aliased analogue. Successive scales are computed from the previous
    one, mirroring the reference's chained resize.
    """
    pyr = [x]
    for _ in range(1, num_scales):
        prev = pyr[-1]
        b, h, w, c = prev.shape
        pyr.append(jax.image.resize(prev, (b, h // 2, w // 2, c),
                                    method=method))
    return pyr
