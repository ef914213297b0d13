"""Training-variant coverage: every ablation/config family of the reference
(`/root/reference/options.py` ablations, GAN prior, shared/posecnn pose paths,
v1 multiscale, stereo)."""

import numpy as np
import pytest

import jax

from tests.test_train import make_all, synth_batch, tiny_cfg
from unsupervised_pose_estimation_tpu.train.step import build_train_step


def _one_step(cfg):
    bundle, state = make_all(cfg)
    step = build_train_step(bundle, donate=False)
    state, losses = step(state, synth_batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"])), losses
    return state, losses


def test_variant_shared_encoder():
    _, losses = _one_step(tiny_cfg(pose_model_type="shared"))
    assert "loss/0" in losses


def test_variant_pose_input_all():
    _, losses = _one_step(tiny_cfg(pose_model_input="all"))
    assert np.isfinite(float(losses["loss"]))


def test_variant_posecnn_all():
    _, losses = _one_step(tiny_cfg(pose_model_type="posecnn",
                                   pose_model_input="all"))
    assert np.isfinite(float(losses["loss"]))


def test_variant_v1_multiscale():
    _, losses = _one_step(tiny_cfg(v1_multiscale=True))
    assert np.isfinite(float(losses["loss"]))


def test_variant_ablations():
    _, losses = _one_step(tiny_cfg(avg_reprojection=True, no_ssim=True,
                                   disable_automasking=True))
    assert np.isfinite(float(losses["loss"]))


def test_variant_predictive_mask():
    cfg = tiny_cfg(predictive_mask=True, disable_automasking=True)
    _, losses = _one_step(cfg)
    assert np.isfinite(float(losses["loss"]))


def test_variant_gan_prior():
    cfg = tiny_cfg(pre_trained_generator=True)
    state, losses = _one_step(cfg)
    # silog term present per scale (trainer.py:573-583)
    assert "gan_loss/0" in losses
    assert np.isfinite(float(losses["gan_loss/0"]))
    # generator is frozen: lives outside the trainable tree
    assert "pre_trained_generator" in state.frozen
    assert "pre_trained_generator" not in state.params


def test_variant_fewer_scales():
    _, losses = _one_step(tiny_cfg(scales=(0, 2)))
    assert "loss/2" in losses and "loss/1" not in losses


def test_discriminator_step():
    from unsupervised_pose_estimation_tpu.train.step import build_disc_step

    cfg = tiny_cfg(adversarial_prior=True, pre_trained_generator=True)
    bundle, state = make_all(cfg)
    assert state.disc_params is not None
    dstep = build_disc_step(bundle)
    new_state, dlosses = dstep(state, synth_batch(cfg),
                               jax.random.PRNGKey(0))
    assert np.isfinite(float(dlosses["disc_loss"]))
    before = jax.tree_util.tree_leaves(state.disc_params)
    after = jax.tree_util.tree_leaves(new_state.disc_params)
    assert any(not np.allclose(a, b) for a, b in zip(before, after))
