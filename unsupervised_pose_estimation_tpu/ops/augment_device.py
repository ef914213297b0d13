"""Device-side photometric augmentation (jnp, elementwise — VPU work).

TPU-native replacement for the host PIL jitter pipeline
(`data/augment.py`, mirroring `/root/reference/datasets/mono_dataset2.py:
91-96,179-187`): the host ships uint8 ``color`` plus SIX floats per item
and the compiled train step synthesizes ``color_aug`` on device. Profiling
on the 1-core container showed PIL convert/blend at 86% of cache-fed item
cost (26.8 ms/item -> ~3 ms without it), i.e. the host-bound input regime
(BASELINE.md r4 pipeline row) is mostly augmentation, not decode.

Semantics follow PIL stage by stage (values kept on the 0..255 grid with a
round after every stage, like PIL's per-stage uint8 stores):
  brightness   x * b                      (ImageEnhance.Brightness)
  contrast     m + c * (x - m), m = round(mean(L))  per frame
  saturation   L + s * (x - L), L = PIL luma per pixel
  hue          HSV rotate by int(hue*255)/255 of a cycle (the host impl
               adds int(hue*255) to PIL's uint8 H channel)
  autocontrast per-channel (x - lo) * 255/(hi - lo)  (cutoff 0)
PIL's integer HSV conversion quantizes H/S to uint8, so the hue stage
matches within a few /255 rather than exactly; tests bound the error
against the host oracle (tests/test_data.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# PIL L-convert weights: (19595 R + 38470 G + 7471 B + 0x8000) >> 16
_LW = (19595.0 / 65536.0, 38470.0 / 65536.0, 7471.0 / 65536.0)

PARAM_FIELDS = ("enabled", "brightness", "contrast", "saturation", "hue",
                "autocontrast")


def _r8(x):
    # PIL's blend casts float -> uint8 by TRUNCATION (empirically: floor
    # matches ImageEnhance to 99%, round only to ~55%)
    return jnp.clip(jnp.floor(x), 0.0, 255.0)


def _lum(x):
    """PIL 'L' conversion of 0..255 float RGB, (..., 3) -> (..., 1)."""
    lum = x[..., 0] * _LW[0] + x[..., 1] * _LW[1] + x[..., 2] * _LW[2]
    return jnp.floor(lum + 0.5)[..., None]


def _hue_rotate(x, shift_u8):
    """Rotate hue by ``shift_u8`` (uint8 H-channel units, modulo 256),
    replicating PIL's RGB->HSV->RGB uint8 roundtrip exactly: H and S are
    TRUNCATED to the uint8 grid on the way in (convert.c rgb2hsv), the
    reconstruction rounds (+0.5) per channel (hsv2rgb), and S==0 pixels
    come back as gray(V) — quantization and all. x is (..., 3) float on
    the 0..255 grid."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    safe_mx = jnp.where(mx > 0, mx, 1.0)
    rc = (mx - r) / safe_c
    gc = (mx - g) / safe_c
    bc = (mx - b) / safe_c
    h = jnp.where(r == mx, bc - gc,
                  jnp.where(g == mx, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0 + 1.0) % 1.0
    uh = jnp.trunc(h * 255.0)
    us = jnp.where(c > 0, jnp.trunc(c / safe_mx * 255.0), 0.0)

    uh = (uh + shift_u8[..., 0]) % 256.0
    v = mx
    h6 = uh * 6.0 / 255.0
    i = jnp.floor(h6)
    f = h6 - i
    p = jnp.floor(v * (255.0 - us) / 255.0 + 0.5)
    q = jnp.floor(v * (255.0 - us * f) / 255.0 + 0.5)
    t = jnp.floor(v * (255.0 - us * (1.0 - f)) / 255.0 + 0.5)
    i = i.astype(jnp.int32) % 6
    sel = [i == k for k in range(6)]
    r2 = jnp.select(sel, [v, q, p, p, t, v])
    g2 = jnp.select(sel, [t, v, v, q, p, p])
    b2 = jnp.select(sel, [p, p, t, v, v, q])
    out = jnp.stack([r2, g2, b2], axis=-1)
    # s == 0 (after truncation) -> gray(v), PIL's degenerate branch
    return jnp.where((us == 0.0)[..., None], v[..., None], out)


def space_to_depth_frames(x):
    """(B, F, H, W, C) -> (B, F, H/2, W/2, 4C), channel layout (r, s, c) —
    the frame-stack form of ops.packed.space_to_depth."""
    b, f, h, w, c = x.shape
    x = x.reshape(b, f, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        b, f, h // 2, w // 2, 4 * c)


def batch_augment(color, params, packed: bool = False):
    """color: (B, F, H, W, 3) uint8 (or float [0,1]); params: (B, 6)
    float32 rows [enabled, brightness, contrast, saturation, hue,
    autocontrast] (AugmentParams.to_vector()). Returns float32 [0,1]
    augmented frames — identical factors across an item's frames, per the
    reference's once-per-item jitter draw.

    With ``packed`` the result is space-to-depth packed (B, F, H/2, W/2,
    12): the jitter is pointwise per pixel (and its reductions are over
    whole frames), so it commutes with the layout shuffle exactly — doing
    the shuffle HERE moves it onto the uint8 bytes (4x fewer than f32) and
    lets the packed ResNet stems consume color_aug with no s2d of their
    own."""
    if packed:
        color = space_to_depth_frames(color)
    x = color.astype(jnp.float32)
    if color.dtype != jnp.uint8:
        x = x * 255.0
    if packed:
        b, f, h2, w2, c4 = x.shape
        x = x.reshape(b, f, h2, w2, 4, c4 // 4)

    def bc(v):  # (B,) -> (B, 1, ..., 1) broadcast over frame/space/channel
        return v.reshape((-1,) + (1,) * (x.ndim - 1))

    enabled = bc((params[:, 0] > 0.5).astype(jnp.float32))
    bright = bc(params[:, 1])
    cont = bc(params[:, 2])
    sat = bc(params[:, 3])
    hue = params[:, 4]
    auto = bc((params[:, 5] > 0.5).astype(jnp.float32)) * enabled

    # reduction axes: everything after the frame dim is "this frame" —
    # (H, W, c) unpacked, (H/2, W/2, subpixel, c) packed; same element sets
    frame_axes = tuple(range(2, x.ndim))         # incl. channel (for mean)
    space_axes = tuple(range(2, x.ndim - 1))     # excl. channel (min/max)

    y = _r8(x * bright)
    # per-frame mean of the L image (ImageEnhance.Contrast computes its
    # degenerate gray per image, i.e. per frame here)
    mean = jnp.floor(jnp.mean(_lum(y), axis=frame_axes, keepdims=True) + 0.5)
    y = _r8(mean + cont * (y - mean))
    y = _r8(_lum(y) + sat * (y - _lum(y)))
    # int(hue*255) truncates toward zero (host impl); u8 H-channel units.
    # A zero shift SKIPS the stage (host: `if p.hue != 0`): the uint8 HSV
    # roundtrip itself perturbs pixels, so running it with shift 0 would
    # not be identity.
    shift = jnp.trunc(hue * 255.0)
    rotated = _r8(_hue_rotate(y, bc(shift)))
    y = jnp.where(bc(shift) != 0.0, rotated, y)
    # autocontrast, cutoff 0: per-channel per-frame min/max stretch
    lo = jnp.min(y, axis=space_axes, keepdims=True)
    hi = jnp.max(y, axis=space_axes, keepdims=True)
    stretch = jnp.clip(jnp.floor((y - lo) * 255.0 /
                                 jnp.maximum(hi - lo, 1.0)), 0.0, 255.0)
    y = jnp.where(hi > lo, stretch, y) * auto + y * (1.0 - auto)

    out = (y * enabled + x * (1.0 - enabled)) * (1.0 / 255.0)
    if packed:
        out = out.reshape(b, f, h2, w2, c4)
    return out
