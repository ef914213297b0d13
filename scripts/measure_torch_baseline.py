"""Measure the PyTorch-CPU reference-equivalent training throughput.

The reference cannot run as-shipped in this image (it imports torchvision,
which is absent), so this harness rebuilds the same training step with plain
torch modules: ResNet-18 depth encoder, fork depth decoder
(ConvTranspose2d + BatchNorm, `/root/reference/networks/depth_decoder.py`),
ResNet-18 pose encoder over frame pairs + PoseDecoder, multi-scale view
synthesis with F.grid_sample, SSIM+L1 min-reprojection automasking loss with
edge-aware smoothness, backward, and an Adam step — the per-batch work of
`/root/reference/trainer.py:305-313,370-686`.

Prints a JSON line: {"frames_per_sec": ..., "config": {...}}.
The result is recorded in BASELINE.md and used as bench.py's vs_baseline
denominator.
"""

import argparse
import json
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


# --- minimal torchvision-free resnet18 --------------------------------------
class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride,
                                                bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class ResNet18Encoder(nn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.pool = nn.MaxPool2d(3, 2, 1)
        def stage(cin, cout, stride):
            return nn.Sequential(BasicBlock(cin, cout, stride),
                                 BasicBlock(cout, cout))
        self.layer1 = stage(64, 64, 1)
        self.layer2 = stage(64, 128, 2)
        self.layer3 = stage(128, 256, 2)
        self.layer4 = stage(256, 512, 2)

    def forward(self, x):
        feats = [F.relu(self.bn1(self.conv1(x)))]
        feats.append(self.layer1(self.pool(feats[-1])))
        feats.append(self.layer2(feats[-1]))
        feats.append(self.layer3(feats[-1]))
        feats.append(self.layer4(feats[-1]))
        return feats


class ConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return F.elu(self.conv(self.pad(x)))


class DepthDecoder(nn.Module):
    """Fork variant: ConvBlock -> ConvTranspose2d 2x -> skip -> ConvBlock ->
    BN -> sigmoid dispconv per scale."""

    CH = [16, 32, 64, 128, 256]

    def __init__(self, enc_ch=(64, 64, 128, 256, 512), scales=(0, 1, 2, 3)):
        super().__init__()
        self.scales = scales
        self.up0, self.deconv, self.up1, self.bn = (nn.ModuleDict(),
                                                    nn.ModuleDict(),
                                                    nn.ModuleDict(),
                                                    nn.ModuleDict())
        self.dispconv = nn.ModuleDict()
        for i in range(4, -1, -1):
            cin = enc_ch[-1] if i == 4 else self.CH[i + 1]
            self.up0[str(i)] = ConvBlock(cin, self.CH[i])
            self.deconv[str(i)] = nn.ConvTranspose2d(
                self.CH[i], self.CH[i], 3, 2, 1, output_padding=1)
            skip = enc_ch[i - 1] if i > 0 else 0
            self.up1[str(i)] = ConvBlock(self.CH[i] + skip, self.CH[i])
            self.bn[str(i)] = nn.BatchNorm2d(self.CH[i])
        for s in scales:
            self.dispconv[str(s)] = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(self.CH[s], 1, 3))

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = self.up0[str(i)](x)
            x = self.deconv[str(i)](x)
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.bn[str(i)](self.up1[str(i)](x))
            if i in self.scales:
                out[i] = torch.sigmoid(self.dispconv[str(i)](x))
        return out


class PoseDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.squeeze = nn.Conv2d(512, 256, 1)
        self.c0 = nn.Conv2d(256, 256, 3, 1, 1)
        self.c1 = nn.Conv2d(256, 256, 3, 1, 1)
        self.c2 = nn.Conv2d(256, 12, 1)

    def forward(self, f):
        x = F.relu(self.squeeze(f))
        x = F.relu(self.c0(x))
        x = F.relu(self.c1(x))
        x = self.c2(x).mean(3).mean(2)
        out = 0.01 * x.view(-1, 2, 1, 6)
        return out[..., :3], out[..., 3:]


def rot_from_axisangle(vec):
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x, y, z = (axis[..., i].unsqueeze(1) for i in range(3))
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    rot = torch.zeros(vec.shape[0], 4, 4)
    rot[:, 0, 0] = (x * xC + ca).squeeze()
    rot[:, 0, 1] = (x * yC - zs).squeeze()
    rot[:, 0, 2] = (z * xC + ys).squeeze()
    rot[:, 1, 0] = (x * yC + zs).squeeze()
    rot[:, 1, 1] = (y * yC + ca).squeeze()
    rot[:, 1, 2] = (y * zC - xs).squeeze()
    rot[:, 2, 0] = (z * xC - ys).squeeze()
    rot[:, 2, 1] = (y * zC + xs).squeeze()
    rot[:, 2, 2] = (z * zC + ca).squeeze()
    rot[:, 3, 3] = 1
    return rot


def pose_to_T(aa, t, invert):
    R = rot_from_axisangle(aa)
    t = t.clone()
    if invert:
        R = R.transpose(1, 2)
        t = -t
    T = torch.eye(4).repeat(aa.shape[0], 1, 1)
    T[:, :3, 3] = t.view(-1, 3)
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def ssim(x, y):
    refl = nn.ReflectionPad2d(1)
    pool = nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x ** 2) - mu_x ** 2
    sy = pool(y ** 2) - mu_y ** 2
    sxy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sx + sy + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()
    torch.manual_seed(0)
    H, W, B = args.height, args.width, args.batch

    enc = ResNet18Encoder()
    dec = DepthDecoder()
    pose_enc = ResNet18Encoder(in_ch=6)
    pose_dec = PoseDecoder()
    params = (list(enc.parameters()) + list(dec.parameters()) +
              list(pose_enc.parameters()) + list(pose_dec.parameters()))
    opt = torch.optim.Adam(params, lr=1e-4)

    frames = {f: torch.rand(B, 3, H, W) for f in (0, -1, 1)}
    K = torch.eye(4).repeat(B, 1, 1)
    K[:, 0, 0], K[:, 1, 1] = 0.635 * W, 0.634 * H
    K[:, 0, 2], K[:, 1, 2] = 0.48 * W, 0.5 * H
    inv_K = torch.inverse(K)

    mesh = torch.meshgrid(torch.arange(W), torch.arange(H), indexing="xy")
    pix = torch.stack([mesh[0].reshape(-1), mesh[1].reshape(-1),
                       torch.ones(H * W)], 0).float()  # (3, HW)

    def step():
        opt.zero_grad()
        feats = enc(frames[0])
        disps = dec(feats)
        poses = {}
        for f_i in (-1, 1):
            pair = (torch.cat([frames[f_i], frames[0]], 1) if f_i < 0
                    else torch.cat([frames[0], frames[f_i]], 1))
            aa, t = pose_dec(pose_enc(pair)[-1])
            poses[f_i] = pose_to_T(aa[:, 0], t[:, 0], f_i < 0)
        total = 0.0
        for s in (0, 1, 2, 3):
            disp = F.interpolate(disps[s], (H, W), mode="bilinear",
                                 align_corners=False)
            depth = 1.0 / (1 / 150.0 + (10.0 - 1 / 150.0) * disp)
            cam = torch.matmul(inv_K[:, :3, :3], pix.unsqueeze(0))
            cam = depth.view(B, 1, -1) * cam
            cam = torch.cat([cam, torch.ones(B, 1, H * W)], 1)
            reproj, ident = [], []
            for f_i in (-1, 1):
                P = torch.matmul(K, poses[f_i])[:, :3, :]
                p2 = torch.matmul(P, cam)
                xy = p2[:, :2] / (p2[:, 2:3] + 1e-7)
                xy = xy.view(B, 2, H, W).permute(0, 2, 3, 1)
                xy = 2 * xy / torch.tensor([W - 1, H - 1]) - 1
                warped = F.grid_sample(frames[f_i], xy,
                                       padding_mode="border",
                                       align_corners=True)
                for tgt, buf in ((warped, reproj), (frames[f_i], ident)):
                    l1 = (tgt - frames[0]).abs().mean(1, True)
                    sv = ssim(tgt, frames[0]).mean(1, True)
                    buf.append(0.85 * sv + 0.15 * l1)
            ident_t = torch.cat(ident, 1) + torch.randn(B, 2, H, W) * 1e-5
            combined = torch.cat([ident_t, torch.cat(reproj, 1)], 1)
            to_opt, _ = torch.min(combined, 1)
            loss = to_opt.mean()
            nd = disps[s] / (disps[s].mean((2, 3), True) + 1e-7)
            gx = (nd[..., :-1] - nd[..., 1:]).abs().mean()
            gy = (nd[..., :-1, :] - nd[..., 1:, :]).abs().mean()
            loss = loss + 1e-4 * (gx + gy) / 2 ** s
            total = total + loss
        total = total / 4
        total.backward()
        opt.step()
        return float(total)

    for _ in range(args.warmup):
        step()
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = time.time() - t0
    fps = args.steps * B / dt
    print(json.dumps({"frames_per_sec": round(fps, 3),
                      "sec_per_step": round(dt / args.steps, 3),
                      "config": {"height": H, "width": W, "batch": B,
                                 "device": "cpu",
                                 "threads": torch.get_num_threads()}}))


if __name__ == "__main__":
    main()
