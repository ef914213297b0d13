"""Step-for-step training-trajectory parity against a PyTorch oracle.

Both sides start from IDENTICAL weights (torch modules randomized, saved in
the reference .pth layout, imported through the checkpoint shims) and train
on the SAME fixed batch with Adam. The torch step reproduces the reference's
per-batch math (`/root/reference/trainer.py:370-403,491-686`) with the two
documented intent deviations this framework makes:

  * both pose pairs are stacked on the batch axis through ONE pose-encoder
    forward (train/step.py predict_poses) — BN batch statistics see 2B rows;
  * the fork decoder's BatchNorms are REGISTERED (trained + stats tracked),
    reference defect §8.3 intent-fixed.

With automasking disabled the trajectory is fully deterministic on both
sides; the losses must track within float tolerance across several
optimizer steps — this is the VERDICT r1 "quality parity evidence" gate.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from tests.torch_oracle import (RefDepthDecoder, RefPoseDecoder,
                                RefResnetEncoder)
from unsupervised_pose_estimation_tpu.config import Options
from unsupervised_pose_estimation_tpu.train import checkpoint as ck
from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
from unsupervised_pose_estimation_tpu.train.state import create_train_state
from unsupervised_pose_estimation_tpu.train.step import build_train_step

H, W, B = 64, 64, 2
LR = 1e-4
MIN_D, MAX_D = 0.1, 150.0
SMOOTH_W = 1e-4


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


# --- exact reference loss pieces (trainer.py:491-686, layers.py) ------------


def _ssim(x, y):
    pad = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = pad(x), pad(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def _reprojection_loss(pred, target):
    l1 = torch.abs(target - pred).mean(1, True)
    return 0.85 * _ssim(pred, target).mean(1, True) + 0.15 * l1


def _smooth_loss(disp, img):
    # layers.py:286-299 on mean-normalized disparity
    gx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    ix = torch.mean(torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1, True)
    iy = torch.mean(torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1, True)
    gx = gx * torch.exp(-ix)
    gy = gy * torch.exp(-iy)
    return gx.mean() + gy.mean()


def _rot_from_axisangle(vec):
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros(vec.shape[0], 4, 4)
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def _transformation(aa, t, invert):
    R = _rot_from_axisangle(aa)
    t = t.clone().view(-1, 3, 1)
    if invert:
        R = R.transpose(1, 2)
        t = -1 * torch.matmul(R[:, :3, :3], t)
    T = torch.eye(4).repeat(aa.shape[0], 1, 1)
    T[:, :3, 3:] = t
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def _torch_step_factory(nets, frames, K, inv_K, pyramid):
    enc, dec, pose_enc, pose_dec = nets
    params = (list(enc.parameters()) + list(dec.parameters()) +
              list(pose_enc.parameters()) + list(pose_dec.parameters()))
    # intent-fix §8.3: the decoder BNs train too (plain dict in the oracle,
    # registered in the flax decoder)
    for bn in dec.bn.values():
        params += list(bn.parameters())
    opt = torch.optim.Adam(params, lr=LR, betas=(0.9, 0.999), eps=1e-8)

    mesh = torch.meshgrid(torch.arange(W), torch.arange(H), indexing="xy")
    pix = torch.stack([mesh[0].reshape(-1), mesh[1].reshape(-1),
                       torch.ones(H * W)], 0).float()  # (3, HW)

    def step():
        opt.zero_grad()
        feats = enc(frames[0])
        disps = dec(feats)

        # pose pairs STACKED through one forward (framework semantics)
        pairs = torch.cat([
            torch.cat([frames[-1], frames[0]], 1),
            torch.cat([frames[0], frames[1]], 1)], 0)  # (2B, 6, H, W)
        aa, t = pose_dec(pose_enc(pairs)[-1])
        poses = {
            -1: _transformation(aa[:B, 0], t[:B, 0], True),
            1: _transformation(aa[B:, 0], t[B:, 0], False),
        }

        total = 0.0
        scale_losses = []
        for s in (0, 1, 2, 3):
            disp = disps[s]
            disp_full = F.interpolate(disp, (H, W), mode="bilinear",
                                      align_corners=False)
            # disp_to_depth (layers.py:85-94)
            scaled = 1 / MAX_D + (1 / MIN_D - 1 / MAX_D) * disp_full
            depth = 1.0 / scaled

            cam = torch.matmul(inv_K[:, :3, :3], pix.unsqueeze(0))
            cam = depth.view(B, 1, -1) * cam
            cam = torch.cat([cam, torch.ones(B, 1, H * W)], 1)

            reprojs = []
            for f_i in (-1, 1):
                P = torch.matmul(K, poses[f_i])[:, :3, :]
                p2 = torch.matmul(P, cam)
                xy = p2[:, :2, :] / (p2[:, 2, :].unsqueeze(1) + 1e-7)
                xy = xy.view(B, 2, H, W).permute(0, 2, 3, 1)
                xy[..., 0] /= W - 1
                xy[..., 1] /= H - 1
                xy = (xy - 0.5) * 2
                warped = F.grid_sample(frames[f_i], xy,
                                       padding_mode="border",
                                       align_corners=True)
                reprojs.append(_reprojection_loss(warped, frames[0]))
            to_opt, _ = torch.min(torch.cat(reprojs, 1), dim=1)

            loss = to_opt.mean()
            norm_disp = disp / (disp.mean((2, 3), True) + 1e-7)
            loss = loss + SMOOTH_W * _smooth_loss(norm_disp,
                                                  pyramid[s]) / (2 ** s)
            scale_losses.append(float(loss))
            total = total + loss
        total = total / 4
        total.backward()
        opt.step()
        return float(total), scale_losses

    return step


@pytest.fixture(scope="module")
def oracle_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    torch.manual_seed(0)
    enc = _randomize(RefResnetEncoder(), 1).train()
    dec = RefDepthDecoder()
    _randomize(dec, 2).train()
    pose_enc = _randomize(RefResnetEncoder(num_input_images=2), 3).train()
    pose_dec = _randomize(RefPoseDecoder(num_frames=2), 4).train()

    torch.save(enc.state_dict(), tmp / "encoder.pth")
    torch.save(dec.state_dict(), tmp / "depth.pth")
    torch.save(pose_enc.state_dict(), tmp / "pose_encoder.pth")
    torch.save(pose_dec.state_dict(), tmp / "pose.pth")
    return str(tmp), (enc, dec, pose_enc, pose_dec)


def test_training_trajectory_matches_torch_oracle(oracle_setup, rng_np):
    tmp, nets = oracle_setup
    steps = 4

    # shared fixed batch: smooth-ish random frames
    base = rng_np.uniform(0.2, 0.8, size=(B, 3, H + 4, W + 4)
                          ).astype(np.float32)
    frames_np = {f: base[:, :, 2 + f:H + 2 + f, 2:W + 2].copy()
                 for f in (0, -1, 1)}

    # --- torch side --------------------------------------------------------
    frames_t = {f: torch.from_numpy(v) for f, v in frames_np.items()}
    K = torch.eye(4).repeat(B, 1, 1)
    K[:, 0, 0], K[:, 1, 1] = 0.635 * W, 0.634 * H
    K[:, 0, 2], K[:, 1, 2] = 0.48 * W, 0.5 * H
    inv_K = torch.inverse(K)
    # feed the oracle the SAME pyramid the framework computes on device
    # (lanczos3; ops.resize.image_pyramid) — the pyramid is input data to
    # the smoothness term, not part of the compute path under test
    from unsupervised_pose_estimation_tpu.ops.resize import image_pyramid

    pyr_jax = image_pyramid(
        np.transpose(frames_np[0], (0, 2, 3, 1)), 4)
    pyramid = {s: torch.from_numpy(
        np.transpose(np.asarray(p), (0, 3, 1, 2))) for s, p in
        enumerate(pyr_jax)}
    torch_step = _torch_step_factory(nets, frames_t, K, inv_K, pyramid)
    torch_losses = []
    for _ in range(steps):
        total, _ = torch_step()
        torch_losses.append(total)

    # --- jax side -----------------------------------------------------------
    cfg = Options(height=H, width=W, batch_size=B, compute_dtype="float32",
                  learning_rate=LR, disable_automasking=True,
                  weights_init="scratch").validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    enc_t = ck.import_resnet_encoder(f"{tmp}/encoder.pth", 18)
    params["encoder"], stats["encoder"] = enc_t["params"], enc_t["batch_stats"]
    dec_t = ck.import_depth_decoder(f"{tmp}/depth.pth", cfg.scales)
    params["depth"] = {**params["depth"], **dec_t["params"]}
    pe_t = ck.import_resnet_encoder(f"{tmp}/pose_encoder.pth", 18)
    params["pose_encoder"] = pe_t["params"]
    stats["pose_encoder"] = pe_t["batch_stats"]
    params["pose"] = ck.import_pose_decoder(f"{tmp}/pose.pth")["params"]
    state = state.replace(params=params, batch_stats=stats)

    batch = {
        "color": np.stack([frames_np[0], frames_np[-1], frames_np[1]],
                          axis=1).transpose(0, 1, 3, 4, 2),  # (B,F,H,W,3)
        "color_aug": np.stack([frames_np[0], frames_np[-1], frames_np[1]],
                              axis=1).transpose(0, 1, 3, 4, 2),
        "K_norm": np.tile(np.asarray(
            [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 1, 1)),
    }
    step = build_train_step(bundle, donate=False)
    jax_losses = []
    for _ in range(steps):
        state, losses = step(state, batch, jax.random.PRNGKey(0))
        jax_losses.append(float(losses["loss"]))

    print("\ntorch:", [f"{v:.6f}" for v in torch_losses])
    print("jax:  ", [f"{v:.6f}" for v in jax_losses])
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                               atol=2e-4)
    # the first-step loss (pure forward parity) should be much tighter
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=2e-4)
