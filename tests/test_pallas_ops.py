"""Interpret-mode tests for the Pallas TPU kernels against their jnp
reference implementations (the semantic ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_pose_estimation_tpu.ops import losses as L
from unsupervised_pose_estimation_tpu.ops.pallas import \
    reprojection_loss_pallas


def test_reproj_loss_kernel_matches_jnp(rng_np):
    pred = rng_np.uniform(size=(2, 16, 24, 3)).astype(np.float32)
    target = rng_np.uniform(size=(2, 16, 24, 3)).astype(np.float32)
    ours = reprojection_loss_pallas(jnp.asarray(pred), jnp.asarray(target),
                                    True)  # interpret mode
    ref = L.reprojection_loss(jnp.asarray(pred), jnp.asarray(target))
    assert ours.shape == ref.shape == (2, 16, 24, 1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


def test_reproj_loss_kernel_gradients(rng_np):
    pred = rng_np.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    target = rng_np.uniform(size=(1, 8, 8, 3)).astype(np.float32)

    def loss_k(p, t):
        return jnp.sum(reprojection_loss_pallas(p, t, True) ** 2)

    def loss_r(p, t):
        return jnp.sum(L.reprojection_loss(p, t) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(jnp.asarray(pred),
                                          jnp.asarray(target))
    gr = jax.grad(loss_r, argnums=(0, 1))(jnp.asarray(pred),
                                          jnp.asarray(target))
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
