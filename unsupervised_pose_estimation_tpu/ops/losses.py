"""Loss primitives: SSIM, photometric reprojection, edge-aware smoothness,
scale-invariant log (GAN prior), min-reprojection automasking.

Re-implements the reference loss semantics (`/root/reference/layers.py:286-332`,
`/root/reference/trainer.py:543-686`) in pure jnp over NHWC tensors. Everything
here is elementwise/windowed math that XLA fuses into the surrounding train
step; the 3x3 average pools lower to reduce-window ops on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SSIM_C1 = 0.01 ** 2
_SSIM_C2 = 0.03 ** 2


def _win3(x):
    """3x3/stride-1 windowed SUM over the last two dims of (..., H, W),
    expressed as 9 shifted adds (a separable 2-pass: rows then cols). On TPU
    this keeps W on the lane dimension — reduce_window over NHWC with C=3
    minor tiles catastrophically — and XLA fuses the shifted adds."""
    rows = x[..., 0:-2, :] + x[..., 1:-1, :] + x[..., 2:, :]
    return rows[..., 0:-2] + rows[..., 1:-1] + rows[..., 2:]


def _ssim_planar(x, y):
    """SSIM dissimilarity over channel-planar (N, C, H, W) inputs."""
    pad = [(0, 0), (0, 0), (1, 1), (1, 1)]
    x = jnp.pad(x, pad, mode="reflect")
    y = jnp.pad(y, pad, mode="reflect")

    ninth = 1.0 / 9.0
    mu_x = _win3(x) * ninth
    mu_y = _win3(y) * ninth
    sigma_x = _win3(x * x) * ninth - mu_x * mu_x
    sigma_y = _win3(y * y) * ninth - mu_y * mu_y
    sigma_xy = _win3(x * y) * ninth - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _SSIM_C1) * (2.0 * sigma_xy + _SSIM_C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def ssim(x, y):
    """Structural dissimilarity: clamp((1 - SSIM(x, y)) / 2, 0, 1).

    Matches the reference's 3x3 avg-pool SSIM with reflection padding
    (`/root/reference/layers.py:302-332`). Inputs/outputs are NHWC with the
    same spatial shape; internally computed channel-planar (N, C, H, W) so
    the windowed sums run along well-tiled lanes.
    """
    out = _ssim_planar(jnp.moveaxis(x, -1, 1), jnp.moveaxis(y, -1, 1))
    return jnp.moveaxis(out, 1, -1)


def reprojection_loss_planar(p, t, use_ssim: bool = True):
    """Per-pixel photometric error from channel-planar (N, C, H, W) inputs
    -> (N, H, W, 1); avoids any layout transpose on the hot path."""
    l1 = jnp.mean(jnp.abs(t - p), axis=1)  # (N, H, W)
    if not use_ssim:
        return l1[..., None]
    ssim_term = jnp.mean(_ssim_planar(p, t), axis=1)
    return (0.85 * ssim_term + 0.15 * l1)[..., None]


def reprojection_loss(pred, target, use_ssim: bool = True):
    """Per-pixel photometric error, (B, H, W, 1), NHWC inputs.

    0.85 * SSIM + 0.15 * L1 (channel-meaned), matching
    `/root/reference/trainer.py:543-555`; pure L1 when `use_ssim` is False
    (the reference's --no_ssim ablation). The whole pipeline runs
    channel-planar and reduces over C before returning to NHWC.
    """
    return reprojection_loss_planar(jnp.moveaxis(pred, -1, 1),
                                    jnp.moveaxis(target, -1, 1), use_ssim)


def smooth_loss(disp, img):
    """Edge-aware first-order smoothness, scalar.

    Matches `/root/reference/layers.py:286-299`. `disp` (B, H, W, 1) should be
    mean-normalized by the caller; `img` (B, H, W, 3) provides edges.
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]),
                          axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]),
                          axis=-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def normalized_disp(disp, eps: float = 1e-7):
    """Disparity divided by its per-image spatial mean
    (`/root/reference/trainer.py:676-677`)."""
    mean = jnp.mean(disp, axis=(1, 2), keepdims=True)
    return disp / (mean + eps)


def silog_loss(fake, real):
    """Scale-invariant log loss between a pseudo-disparity prior and a
    prediction, scalar.

    Matches the reference's SLlog (`/root/reference/layers.py:32-56`): pixels
    where either operand is <= 0 are excluded (set to 1 -> zero log-diff), N
    counts strictly-positive `real` pixels, and the loss is the std-dev form
    sqrt(E[d^2] - E[d]^2).
    """
    n = jnp.sum((real > 0).astype(real.dtype))
    invalid = (real <= 0) | (fake <= 0)
    real_v = jnp.where(invalid, 1.0, real)
    fake_v = jnp.where(invalid, 1.0, fake)
    d = jnp.log(real_v) - jnp.log(fake_v)
    n = jnp.maximum(n, 1.0)
    return jnp.sqrt(jnp.sum(d * d) / n - (jnp.sum(d) / n) ** 2)


def rmse_log_loss(fake, real, eps: float = 1e-8):
    """Log-RMSE over pixels where real < 1, scalar.

    Matches the reference's (unused) RMSE_log (`/root/reference/
    layers.py:58-72`): fake is offset by eps, the mask selects real < 1.
    """
    mask = real < 1.0
    n = jnp.maximum(jnp.sum(mask.astype(real.dtype)), 1.0)
    fake = fake + eps
    d = jnp.where(mask, jnp.log(jnp.maximum(real, eps)) -
                  jnp.log(jnp.maximum(fake, eps)), 0.0)
    return jnp.sqrt(jnp.sum(jnp.abs(d) ** 2) / n)


def min_reprojection(reproj, identity_reproj, rng, avg_reprojection=False):
    """Min-over-sources reprojection with identity automasking.

    Args:
      reproj: (B, H, W, S) per-source reprojection losses.
      identity_reproj: (B, H, W, S) identity (unwarped) losses, or None when
        automasking is disabled.
      rng: PRNG key for the reference's 1e-5 randn tie-break
        (`/root/reference/trainer.py:655-657`).

    Returns:
      (to_optimise (B, H, W), automask (B, H, W) or None) matching
      `/root/reference/trainer.py:649-670` (automask = 1 where a true
      reprojection, not an identity, won the min).
    """
    if avg_reprojection:
        reproj = jnp.mean(reproj, axis=-1, keepdims=True)

    if identity_reproj is None:
        if reproj.shape[-1] == 1:
            return reproj[..., 0], None
        return jnp.min(reproj, axis=-1), None

    if avg_reprojection:
        identity_reproj = jnp.mean(identity_reproj, axis=-1, keepdims=True)

    noise = jax.random.normal(rng, identity_reproj.shape,
                              identity_reproj.dtype) * 1e-5
    identity_reproj = identity_reproj + noise

    combined = jnp.concatenate([identity_reproj, reproj], axis=-1)
    to_optimise = jnp.min(combined, axis=-1)
    idxs = jnp.argmin(combined, axis=-1)
    automask = (idxs > identity_reproj.shape[-1] - 1).astype(reproj.dtype)
    return to_optimise, automask
