"""End-to-end numerical parity of the .pth import shim: torch oracle nets
(reference state_dict layout, tests/torch_oracle.py) -> torch.save -> import
-> flax forward must match the torch forward."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_oracle import (RefDepthDecoder, RefGenerator, RefPoseCNN,
                                RefPoseDecoder, RefResnetEncoder,
                                _TorchResNet18)
from unsupervised_pose_estimation_tpu.models import (DepthDecoder,
                                                     GeneratorResNet, PoseCNN,
                                                     PoseDecoder,
                                                     ResNetEncoder)
from unsupervised_pose_estimation_tpu.train import checkpoint as ck


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    return module


def test_resnet_encoder_import_matches_torch(tmp_path, rng_np):
    torch_net = _randomize(RefResnetEncoder()).eval()
    path = str(tmp_path / "encoder.pth")
    sd = torch_net.state_dict()
    sd["height"], sd["width"], sd["use_stereo"] = 96, 96, False
    torch.save(sd, path)

    tree = ck.import_resnet_encoder(path, 18)
    assert tree["meta"]["height"] == 96

    x = rng_np.uniform(size=(2, 96, 96, 3)).astype(np.float32)
    model = ResNetEncoder(num_layers=18)
    ours = model.apply({"params": tree["params"],
                        "batch_stats": tree["batch_stats"]},
                       jnp.asarray(x), False)
    with torch.no_grad():
        theirs = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4)


def _fake_imagenet_pth(tmp_path, seed=0):
    """torchvision-zoo-layout resnet18 .pth (un-prefixed keys + fc head)."""
    net = _randomize(_TorchResNet18(), seed=seed)
    sd = net.state_dict()
    g = torch.Generator().manual_seed(seed + 1)
    sd["fc.weight"] = torch.randn(1000, 512, generator=g)
    sd["fc.bias"] = torch.randn(1000, generator=g)
    path = str(tmp_path / "resnet18-imagenet.pth")
    torch.save(sd, path)
    return path, sd


def test_torchvision_import_matches_torch(tmp_path, rng_np):
    """weights_init=pretrained conversion: zoo-layout .pth -> flax encoder."""
    path, sd = _fake_imagenet_pth(tmp_path)
    tree = ck.import_torchvision_resnet(path, 18, num_input_images=1)

    oracle = RefResnetEncoder().eval()
    oracle.load_state_dict({f"encoder.{k}": v for k, v in sd.items()
                            if not k.startswith("fc.")})
    x = rng_np.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    ours = ResNetEncoder(num_layers=18).apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), False)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4)


def test_torchvision_conv1_averaging_matches_reference(tmp_path, rng_np):
    """Multi-image conv1 init == the reference's tile-and-divide
    (`/root/reference/networks/resnet_encoder.py:56-59`), checked both on the
    raw kernel and end-to-end on a 2-frame forward."""
    path, sd = _fake_imagenet_pth(tmp_path)
    tree = ck.import_torchvision_resnet(path, 18, num_input_images=2)

    ref_conv1 = (torch.cat([sd["conv1.weight"]] * 2, 1) / 2).numpy()
    np.testing.assert_allclose(
        tree["params"]["stem"]["conv"]["kernel"],
        ref_conv1.transpose(2, 3, 1, 0), atol=1e-7)

    oracle = RefResnetEncoder(num_input_images=2).eval()
    ref_sd = {f"encoder.{k}": v for k, v in sd.items()
              if not k.startswith("fc.")}
    ref_sd["encoder.conv1.weight"] = torch.from_numpy(ref_conv1)
    oracle.load_state_dict(ref_sd)
    x = rng_np.uniform(size=(2, 64, 64, 6)).astype(np.float32)
    ours = ResNetEncoder(num_layers=18, num_input_images=2).apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), False)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4)


def test_locate_imagenet_weights(tmp_path, monkeypatch):
    from unsupervised_pose_estimation_tpu.train.checkpoint import \
        locate_imagenet_weights

    # explicit path wins
    path, _ = _fake_imagenet_pth(tmp_path)
    assert locate_imagenet_weights(18, path) == path
    with pytest.raises(FileNotFoundError):
        locate_imagenet_weights(18, str(tmp_path / "missing.pth"))
    # offline, empty cache -> actionable error
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch_home"))
    monkeypatch.setattr(torch.hub, "load_state_dict_from_url",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("net")))
    with pytest.raises(FileNotFoundError, match="weights_init scratch"):
        locate_imagenet_weights(18)


def test_depth_decoder_import_matches_torch(tmp_path, rng_np):
    torch_net = _randomize(RefDepthDecoder())  # BNs stay train-mode (defect)
    path = str(tmp_path / "depth.pth")
    torch.save(torch_net.state_dict(), path)

    tree = ck.import_depth_decoder(path, (0, 1, 2, 3))
    assert tree["variant"] == "fork"

    widths = (64, 64, 128, 256, 512)
    h = w = 64
    feats_np = [rng_np.normal(size=(2, h // 2 ** (i + 1), w // 2 ** (i + 1),
                                    widths[i])).astype(np.float32) * 0.5
                for i in range(5)]

    model = DepthDecoder()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           [jnp.asarray(f) for f in feats_np], False)
    params = {**variables["params"], **tree["params"]}
    # train=True: imported fork checkpoints carry no BN state (never saved by
    # the reference), and the reference's unregistered BNs always run in
    # batch-stats mode
    ours, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        [jnp.asarray(f) for f in feats_np], True, mutable=["batch_stats"])

    with torch.no_grad():
        theirs = torch_net([torch.from_numpy(f.transpose(0, 3, 1, 2))
                            for f in feats_np])
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(ours[s]), theirs[s].numpy().transpose(0, 2, 3, 1),
            atol=5e-4)


def test_pose_decoder_import_matches_torch(tmp_path, rng_np):
    torch_net = _randomize(RefPoseDecoder()).eval()
    path = str(tmp_path / "pose.pth")
    torch.save(torch_net.state_dict(), path)
    tree = ck.import_pose_decoder(path)

    feat = rng_np.normal(size=(3, 6, 6, 512)).astype(np.float32)
    model = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    aa, tt = model.apply({"params": tree["params"]},
                         [[jnp.asarray(feat)]])
    with torch.no_grad():
        taa, ttt = torch_net(torch.from_numpy(feat.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(aa), taa.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), ttt.numpy(), atol=1e-5)


def test_pose_decoder_shared_two_features_matches_torch(tmp_path, rng_np):
    """pose_model_type='shared': TWO input feature stacks through the ONE
    shared squeeze conv (reference networks/pose_decoder.py:38); a reference
    .pth (single 'squeeze' key) must populate the whole flax decoder."""
    torch_net = _randomize(
        RefPoseDecoder(num_frames=1, num_input_features=2)).eval()
    path = str(tmp_path / "pose.pth")
    torch.save(torch_net.state_dict(), path)
    tree = ck.import_pose_decoder(path)

    f0 = rng_np.normal(size=(3, 6, 6, 512)).astype(np.float32)
    f1 = rng_np.normal(size=(3, 6, 6, 512)).astype(np.float32)
    model = PoseDecoder(num_input_features=2, num_frames_to_predict_for=1)
    aa, tt = model.apply({"params": tree["params"]},
                         [[jnp.asarray(f0)], [jnp.asarray(f1)]])
    with torch.no_grad():
        taa, ttt = torch_net([torch.from_numpy(f0.transpose(0, 3, 1, 2)),
                              torch.from_numpy(f1.transpose(0, 3, 1, 2))])
    np.testing.assert_allclose(np.asarray(aa), taa.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), ttt.numpy(), atol=1e-5)


def test_pose_cnn_import_matches_torch(tmp_path, rng_np):
    torch_net = _randomize(RefPoseCNN()).eval()
    path = str(tmp_path / "pose.pth")
    torch.save(torch_net.state_dict(), path)
    tree = ck.import_pose_cnn(path)

    x = rng_np.uniform(size=(2, 64, 64, 6)).astype(np.float32)
    model = PoseCNN(num_input_frames=2)
    aa, tt = model.apply({"params": tree["params"]}, jnp.asarray(x))
    with torch.no_grad():
        taa, ttt = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(aa), taa.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), ttt.numpy(), atol=1e-5)


def test_generator_import_matches_torch(tmp_path, rng_np):
    torch_net = _randomize(RefGenerator(n_res=2)).eval()
    path = str(tmp_path / "gen.pth")
    torch.save(torch_net.state_dict(), path)
    tree = ck.import_generator(path)

    x = rng_np.uniform(-1, 1, size=(1, 64, 64, 1)).astype(np.float32)
    model = GeneratorResNet(channels=1, num_residual_blocks=2)
    out = model.apply({"params": tree["params"]}, jnp.asarray(x))
    with torch.no_grad():
        theirs = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4)
