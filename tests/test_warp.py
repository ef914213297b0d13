"""Torch-oracle tests for ops.warp.grid_sample against
F.grid_sample(padding_mode='border', align_corners=True) — the reference's
hot warp op (`/root/reference/trainer.py:534-537`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from unsupervised_pose_estimation_tpu.ops.warp import grid_sample


def _oracle(img_nhwc, grid):
    img = torch.from_numpy(img_nhwc.transpose(0, 3, 1, 2))
    g = torch.from_numpy(grid)
    out = F.grid_sample(img, g, mode="bilinear", padding_mode="border",
                        align_corners=True)
    return out.numpy().transpose(0, 2, 3, 1)


def test_identity_grid_returns_image(rng_np):
    b, h, w, c = 2, 8, 10, 3
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    xs, ys = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h),
                         indexing="xy")
    grid = np.stack([xs, ys], -1)[None].repeat(b, 0).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_matches_torch_random_grid(rng_np):
    b, h, w, c = 2, 12, 9, 3
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    grid = rng_np.uniform(-1.3, 1.3, size=(b, h, w, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    oracle = _oracle(img, grid)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_planar_grid_matches_channel_last(rng_np):
    """planar_grid=True consumes (B, 2, Ho, Wo) — the hot path's layout —
    with bit-identical results (values and grid gradients)."""
    b, h, w, c = 2, 10, 11, 3
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    grid = rng_np.uniform(-1.4, 1.4, size=(b, h, w, 2)).astype(np.float32)
    gp = jnp.asarray(grid.transpose(0, 3, 1, 2))
    ref = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    out = grid_sample(jnp.asarray(img), gp, planar_grid=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    ga = jax.grad(lambda g: jnp.sum(
        grid_sample(jnp.asarray(img), g) ** 2))(jnp.asarray(grid))
    gb = jax.grad(lambda g: jnp.sum(
        grid_sample(jnp.asarray(img), g, planar_grid=True) ** 2))(gp)
    np.testing.assert_array_equal(
        np.asarray(gb), np.asarray(ga).transpose(0, 3, 1, 2))


def test_matches_torch_far_out_of_bounds(rng_np):
    b, h, w, c = 1, 6, 6, 2
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    grid = rng_np.uniform(-4, 4, size=(b, h, w, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(ours, _oracle(img, grid), atol=1e-5)


def test_different_output_size(rng_np):
    b, h, w, c = 1, 8, 8, 3
    ho, wo = 5, 7
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    grid = rng_np.uniform(-1, 1, size=(b, ho, wo, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    assert ours.shape == (b, ho, wo, c)
    np.testing.assert_allclose(ours, _oracle(img, grid), atol=1e-5)


def test_gradients_match_torch(rng_np):
    """Training parity needs matching gradients through both image and grid
    (SURVEY.md §7 'hard parts' (a))."""
    b, h, w, c = 1, 7, 7, 2
    img = rng_np.uniform(size=(b, h, w, c)).astype(np.float32)
    grid = rng_np.uniform(-1.2, 1.2, size=(b, h, w, 2)).astype(np.float32)

    def loss_jax(i, g):
        return jnp.sum(grid_sample(i, g) ** 2)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img),
                                                jnp.asarray(grid))

    ti = torch.from_numpy(img.transpose(0, 3, 1, 2)).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(ti, tg, mode="bilinear", padding_mode="border",
                        align_corners=True)
    (out ** 2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gi), ti.grad.numpy().transpose(0, 2, 3, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(), atol=1e-4)
