"""Torch-oracle and behavioural tests for ops.losses
(`/root/reference/layers.py:286-332`, `/root/reference/trainer.py:543-686`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from unsupervised_pose_estimation_tpu.ops import losses as L


def _torch_ssim(x_nhwc, y_nhwc):
    """Oracle: reference SSIM formulation (layers.py:302-332) via torch ops."""
    x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    y = torch.from_numpy(y_nhwc.transpose(0, 3, 1, 2))
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1).numpy().transpose(0, 2, 3, 1)


def test_ssim_matches_torch(rng_np):
    x = rng_np.uniform(size=(2, 16, 12, 3)).astype(np.float32)
    y = np.clip(x + rng_np.normal(scale=0.1, size=x.shape), 0, 1).astype(
        np.float32)
    ours = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, _torch_ssim(x, y), atol=1e-5)


def test_ssim_identical_images_is_zero(rng_np):
    x = rng_np.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_reprojection_loss_weighting(rng_np):
    pred = rng_np.uniform(size=(1, 10, 10, 3)).astype(np.float32)
    target = rng_np.uniform(size=(1, 10, 10, 3)).astype(np.float32)
    full = np.asarray(L.reprojection_loss(jnp.asarray(pred),
                                          jnp.asarray(target)))
    l1 = np.abs(target - pred).mean(-1, keepdims=True)
    ssim_term = _torch_ssim(pred, target).mean(-1, keepdims=True)
    np.testing.assert_allclose(full, 0.85 * ssim_term + 0.15 * l1, atol=1e-5)
    no_ssim = np.asarray(L.reprojection_loss(
        jnp.asarray(pred), jnp.asarray(target), use_ssim=False))
    np.testing.assert_allclose(no_ssim, l1, atol=1e-6)


def test_smooth_loss_matches_torch(rng_np):
    disp = rng_np.uniform(size=(2, 9, 11, 1)).astype(np.float32)
    img = rng_np.uniform(size=(2, 9, 11, 3)).astype(np.float32)
    ours = float(L.smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

    d = torch.from_numpy(disp.transpose(0, 3, 1, 2))
    i = torch.from_numpy(img.transpose(0, 3, 1, 2))
    gx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    ix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, True)
    iy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, True)
    oracle = (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_smooth_loss_zero_for_constant_disp():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.zeros((1, 8, 8, 3))
    assert float(L.smooth_loss(disp, img)) == 0.0


def test_silog_matches_reference_formula(rng_np):
    real = rng_np.uniform(-0.2, 2.0, size=(1, 8, 8, 1)).astype(np.float32)
    fake = rng_np.uniform(0.1, 2.0, size=(1, 8, 8, 1)).astype(np.float32)
    ours = float(L.silog_loss(jnp.asarray(fake), jnp.asarray(real)))

    # Oracle per layers.py:36-56
    r = torch.from_numpy(real.copy())
    f = torch.from_numpy(fake.copy())
    N = (r > 0).float().sum()
    mask = (r <= 0) | (f <= 0)
    f[mask] = 1.0
    r[mask] = 1.0
    d = torch.log(r) - torch.log(f)
    oracle = torch.sqrt((d ** 2).sum() / N - (d.sum() / N) ** 2)
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-4)


def test_min_reprojection_automask_semantics(rng_np):
    b, h, w, s = 2, 6, 6, 2
    rng = jax.random.PRNGKey(0)
    reproj = jnp.asarray(rng_np.uniform(0.5, 1.0, size=(b, h, w, s)),
                         dtype=jnp.float32)
    # identity losses much smaller in the first half -> automask 0 there
    ident = np.full((b, h, w, s), 2.0, np.float32)
    ident[:, : h // 2] = 0.01
    to_opt, mask = L.min_reprojection(reproj, jnp.asarray(ident), rng)
    assert to_opt.shape == (b, h, w)
    mask = np.asarray(mask)
    assert mask[:, : h // 2].mean() < 0.05  # identity wins -> masked out
    assert mask[:, h // 2:].mean() > 0.95  # reprojection wins


def test_min_reprojection_no_automask(rng_np):
    reproj = jnp.asarray(rng_np.uniform(size=(1, 4, 4, 2)), jnp.float32)
    to_opt, mask = L.min_reprojection(reproj, None, jax.random.PRNGKey(0))
    assert mask is None
    np.testing.assert_allclose(np.asarray(to_opt),
                               np.asarray(reproj).min(-1), atol=1e-7)


def test_min_reprojection_avg_mode(rng_np):
    reproj = jnp.asarray(rng_np.uniform(size=(1, 4, 4, 2)), jnp.float32)
    to_opt, _ = L.min_reprojection(reproj, None, jax.random.PRNGKey(0),
                                   avg_reprojection=True)
    np.testing.assert_allclose(np.asarray(to_opt),
                               np.asarray(reproj).mean(-1), atol=1e-6)


def test_rmse_log_matches_reference_formula(rng_np):
    real = rng_np.uniform(0.05, 2.0, size=(1, 8, 8, 1)).astype(np.float32)
    fake = rng_np.uniform(0.05, 2.0, size=(1, 8, 8, 1)).astype(np.float32)
    ours = float(L.rmse_log_loss(jnp.asarray(fake), jnp.asarray(real)))

    # Oracle per layers.py:64-72
    r = torch.from_numpy(real)
    f = torch.from_numpy(fake) + 1e-8
    mask = r < 1.0
    N = int(mask.sum())
    oracle = torch.sqrt(
        (torch.abs(torch.log(r[mask]) - torch.log(f[mask])) ** 2).sum() / N)
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)
