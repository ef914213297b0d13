"""Shape/dtype tests for the Flax model zoo (reference layer L2,
`/root/reference/networks/`) plus torch-oracle parity for the custom
transposed-conv upsampler."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from unsupervised_pose_estimation_tpu.models import (
    DepthDecoder, GeneratorResNet, PatchGANDiscriminator, PoseCNN,
    PoseDecoder, ResNetEncoder)
from unsupervised_pose_estimation_tpu.models.layers import Deconv2x
from unsupervised_pose_estimation_tpu.models.resnet import encoder_channels


def _init_and_run(model, *args, train=False, rngs=None):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, *args, train) if _takes_train(model) else \
        model.init(rngs, *args)
    if _takes_train(model):
        out = model.apply(variables, *args, train,
                          mutable=["batch_stats"] if train else False)
        return (out[0], variables) if train else (out, variables)
    return model.apply(variables, *args), variables


def _takes_train(model):
    return isinstance(model, (ResNetEncoder, DepthDecoder))


def test_resnet18_pyramid_shapes():
    x = jnp.zeros((2, 192, 192, 3))
    feats, _ = _init_and_run(ResNetEncoder(num_layers=18), x)
    widths = encoder_channels(18)
    assert len(feats) == 5
    for i, f in enumerate(feats):
        s = 2 ** (i + 1)
        assert f.shape == (2, 192 // s, 192 // s, widths[i]), (i, f.shape)


def test_resnet50_pyramid_widths():
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_and_run(ResNetEncoder(num_layers=50), x)
    assert tuple(f.shape[-1] for f in feats) == encoder_channels(50) \
        == (64, 256, 512, 1024, 2048)


def test_resnet_multi_image_input():
    # pose encoder consumes 2 stacked frames (resnet_encoder.py:18-41)
    x = jnp.zeros((1, 96, 96, 6))
    feats, _ = _init_and_run(ResNetEncoder(num_layers=18,
                                           num_input_images=2), x)
    assert feats[0].shape == (1, 48, 48, 64)


def test_resnet_packed_input_matches_unpacked():
    """packed_in=True consumes space-to-depth color_aug (the train step's
    layout) with the SAME parameters and bit-identical features."""
    from unsupervised_pose_estimation_tpu.ops.packed import space_to_depth

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, 32, 48, 6)).astype(np.float32))
    model = ResNetEncoder(num_layers=18, num_input_images=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    ref = model.apply(variables, x, False)
    packed = model.apply(variables, space_to_depth(x), False,
                         packed_in=True)
    for a, b in zip(ref, packed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_decoder_shapes_fork_variant():
    b, h, w = 2, 96, 96
    widths = encoder_channels(18)
    feats = [jnp.zeros((b, h // 2 ** (i + 1), w // 2 ** (i + 1), widths[i]))
             for i in range(5)]
    model = DepthDecoder(scales=(0, 1, 2, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    # BatchNorm must be registered (fixes reference defect, SURVEY.md §8.3)
    assert "batch_stats" in variables
    assert any(k.startswith("bn_") for k in variables["params"])
    out = model.apply(variables, feats, False)
    for s in range(4):
        assert out[s].shape == (b, h // 2 ** s, w // 2 ** s, 1)
        v = np.asarray(out[s])
        assert v.min() >= 0.0 and v.max() <= 1.0  # sigmoid output


def test_depth_decoder_upstream_variant():
    b, h, w = 1, 64, 64
    widths = encoder_channels(18)
    feats = [jnp.zeros((b, h // 2 ** (i + 1), w // 2 ** (i + 1), widths[i]))
             for i in range(5)]
    model = DepthDecoder(variant="upstream")
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert "batch_stats" not in variables
    out = model.apply(variables, feats, False)
    assert out[0].shape == (b, h, w, 1)


def test_depth_decoder_multi_channel_output():
    # predictive_mask uses num_output_channels = num_source_frames
    b, h, w = 1, 32, 32
    widths = encoder_channels(18)
    feats = [jnp.zeros((b, h // 2 ** (i + 1), w // 2 ** (i + 1), widths[i]))
             for i in range(5)]
    model = DepthDecoder(num_output_channels=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    out = model.apply(variables, feats, False)
    assert out[0].shape == (b, h, w, 2)


def test_deconv2x_matches_torch_convtranspose(rng_np):
    """Deconv2x must equal ConvTranspose2d(k=3, s=2, p=1, op=1)
    (depth_decoder.py:33) for imported weights."""
    b, h, w, cin, cout = 2, 7, 9, 4, 5
    x = rng_np.normal(size=(b, h, w, cin)).astype(np.float32)
    weight = rng_np.normal(size=(cin, cout, 3, 3)).astype(np.float32) * 0.2
    bias = rng_np.normal(size=(cout,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(weight),
        torch.from_numpy(bias), stride=2, padding=1, output_padding=1)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    model = Deconv2x(cout)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch weight (in, out, kh, kw) -> ours (kh, kw, out, in)
    params = {"kernel": jnp.asarray(weight.transpose(2, 3, 1, 0)),
              "bias": jnp.asarray(bias)}
    out = model.apply({"params": params}, jnp.asarray(x))
    assert out.shape == (b, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_pose_decoder_output():
    feats = [jnp.zeros((3, 6, 6, 512))]
    model = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    (aa, t), _ = _init_and_run(model, [feats])
    assert aa.shape == (3, 2, 1, 3)
    assert t.shape == (3, 2, 1, 3)


def test_pose_cnn_output():
    x = jnp.zeros((2, 192, 192, 6))
    (aa, t), _ = _init_and_run(PoseCNN(num_input_frames=2), x)
    assert aa.shape == (2, 1, 1, 3)
    assert t.shape == (2, 1, 1, 3)


def test_generator_resnet_grayscale_shape():
    x = jnp.zeros((1, 192, 192, 1))
    out, _ = _init_and_run(GeneratorResNet(channels=1,
                                           num_residual_blocks=2), x)
    # kernel-6/pad-2 asymmetry is intentional (SURVEY.md §8.8): dims are
    # only self-consistent for the C=1 grayscale use, where 192 -> 192.
    assert out.shape == (1, 192, 192, 1)
    v = np.asarray(out)
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_patchgan_discriminator_shape():
    x = jnp.zeros((2, 192, 192, 1))
    out, _ = _init_and_run(PatchGANDiscriminator(), x)
    assert out.shape == (2, 12, 12, 1)  # (H/16, W/16)


def test_resnet_encoder_train_mode_updates_stats():
    x = jnp.ones((2, 64, 64, 3)) * 0.5
    model = ResNetEncoder(num_layers=18)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    _, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_depth_decoder_packed_tail_matches_unpacked(rng_np):
    """The packed (space-to-depth) level-0 tail is a pure layout change:
    same parameter tree, same outputs as the plain path (f32 reduction-order
    tolerance). Guards the MXU-packing optimization (ops.packed)."""
    b, h, w = 2, 64, 96
    widths = encoder_channels(18)
    feats = [jnp.asarray(rng_np.normal(
        size=(b, h // 2 ** (i + 1), w // 2 ** (i + 1), widths[i])),
        jnp.float32) for i in range(5)]
    plain = DepthDecoder(packed_tail=False)
    packed = DepthDecoder(packed_tail=True)
    variables = plain.init({"params": jax.random.PRNGKey(0)}, feats, False)
    v2 = packed.init({"params": jax.random.PRNGKey(0)}, feats, False)
    # identical tree (paths AND shapes) -> checkpoints are interchangeable
    flat1 = jax.tree_util.tree_leaves_with_path(variables)
    flat2 = jax.tree_util.tree_leaves_with_path(v2)
    assert [(p, l.shape) for p, l in flat1] == [(p, l.shape) for p, l in flat2]
    out_p = plain.apply(variables, feats, False)
    out_k = packed.apply(variables, feats, False)
    for s in range(4):
        np.testing.assert_allclose(out_k[s], out_p[s], atol=2e-5)
    # train mode: BatchNorm stats must match too (per-original-channel)
    o1, m1 = plain.apply(variables, feats, True, mutable=["batch_stats"])
    o2, m2 = packed.apply(variables, feats, True, mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(a, b_, atol=2e-5),
        m1["batch_stats"], m2["batch_stats"])
    np.testing.assert_allclose(o2[0], o1[0], atol=2e-5)


def test_conv3x3_packed_zero_pad_falls_back_gracefully():
    """packed=True with use_refl=False (non-reflect padding) must not crash:
    it unpacks, runs the plain zero-pad conv with the SAME params, and
    repacks — bit-compatible with the unpacked path (VERDICT r3 weak #7)."""
    from unsupervised_pose_estimation_tpu.models.layers import Conv3x3
    from unsupervised_pose_estimation_tpu.ops.packed import (depth_to_space,
                                                             space_to_depth)

    m = Conv3x3(6, use_refl=False)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 12, 4)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    got = depth_to_space(m.apply(params, space_to_depth(x), packed=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_skip_conv_matches_s2d_concat():
    """packed_skip_conv3x3(skip, K_s) + packed_conv3x3(xp, K_x) must equal
    the concatenated-input packed conv (and the full-res reflect conv): the
    skip's slice of the kernel runs as a stride-2 4x4 conv on the FULL-RES
    skip, emitting packed output directly — the decoder's skip-join seam
    (r5 VERDICT #2: the s2d transpose pair was the largest copy seam)."""
    from unsupervised_pose_estimation_tpu.ops.packed import (
        depth_to_space, packed_conv3x3, packed_skip_conv3x3, space_to_depth)

    rng = np.random.default_rng(3)
    b, h, w, cx, cs, co = 2, 16, 24, 5, 7, 6
    x = jnp.asarray(rng.normal(size=(b, h, w, cx)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(b, h, w, cs)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, cx + cs, co)), jnp.float32)

    # reference: full-res reflect-pad conv on the channel concat
    full = jnp.pad(jnp.concatenate([x, skip], -1),
                   [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    ref = jax.lax.conv_general_dilated(
        full, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = packed_conv3x3(space_to_depth(x), k[:, :, :cx, :]) \
        + packed_skip_conv3x3(skip, k[:, :, cx:, :])
    np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)
