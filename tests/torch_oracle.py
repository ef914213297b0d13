"""Torch modules whose ``state_dict`` layouts match the reference's saved
checkpoints, used as numerical oracles for the .pth import shim.

These re-create the reference architectures' *parameter layouts* (torchvision
resnet naming under ``encoder.``; ModuleList orderings of the decoders) with
independent implementations, so ``torch.save(module.state_dict())`` produces
files bit-compatible with what `/root/reference/trainer.py:778-796` writes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class _TorchResNet18(nn.Module):
    """torchvision-resnet18-compatible state_dict layout."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(cin, cout, stride):
            return nn.Sequential(_BasicBlock(cin, cout, stride),
                                 _BasicBlock(cout, cout))

        self.layer1 = stage(64, 64, 1)
        self.layer2 = stage(64, 128, 2)
        self.layer3 = stage(128, 256, 2)
        self.layer4 = stage(256, 512, 2)


class RefResnetEncoder(nn.Module):
    """Reference ResnetEncoder: pyramid forward, weights under `encoder.`."""

    def __init__(self, num_input_images=1):
        super().__init__()
        self.encoder = _TorchResNet18(3 * num_input_images)

    def forward(self, x):
        e = self.encoder
        feats = [e.relu(e.bn1(e.conv1(x)))]
        feats.append(e.layer1(e.maxpool(feats[-1])))
        feats.append(e.layer2(feats[-1]))
        feats.append(e.layer3(feats[-1]))
        feats.append(e.layer4(feats[-1]))
        return feats


class _Conv3x3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = _Conv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class RefDepthDecoder(nn.Module):
    """Fork decoder: ModuleList order = 5 ConvTranspose2d, 10 ConvBlock,
    dispconvs; BatchNorms deliberately UNregistered (plain dict), matching
    reference defect §8.3 (they stay in train mode and never checkpoint)."""

    CH = [16, 32, 64, 128, 256]

    def __init__(self, enc_ch=(64, 64, 128, 256, 512), scales=(0, 1, 2, 3)):
        super().__init__()
        self.scales = scales
        mods = []
        for i in range(4, -1, -1):
            mods.append(nn.ConvTranspose2d(self.CH[i], self.CH[i], 3, 2, 1,
                                           output_padding=1))
        for i in range(4, -1, -1):
            cin = enc_ch[-1] if i == 4 else self.CH[i + 1]
            mods.append(_ConvBlock(cin, self.CH[i]))
            skip = enc_ch[i - 1] if i > 0 else 0
            mods.append(_ConvBlock(self.CH[i] + skip, self.CH[i]))
        for s in sorted(scales):
            mods.append(_Conv3x3(self.CH[s], 1))
        self.decoder = nn.ModuleList(mods)
        self.bn = {i: nn.BatchNorm2d(self.CH[i]) for i in range(5)}

    def forward(self, feats):
        out = {}
        x = feats[-1]
        disp_base = 15
        for j, i in enumerate(range(4, -1, -1)):
            x = self.decoder[5 + 2 * j](x)       # upconv (i, 0)
            x = self.decoder[j](x)               # deconv 2x
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[5 + 2 * j + 1](x)   # upconv (i, 1)
            x = self.bn[i](x)                    # train-mode BN (defect)
            if i in self.scales:
                k = sorted(self.scales).index(i)
                out[i] = torch.sigmoid(self.decoder[disp_base + k](x))
        return out


class RefPoseDecoder(nn.Module):
    """Reference PoseDecoder layout: ONE squeeze conv shared across every
    input feature stack (networks/pose_decoder.py:26,38); pose_0 consumes the
    num_input_features*256-channel concat."""

    def __init__(self, num_frames=2, num_input_features=1):
        super().__init__()
        self.num_frames = num_frames
        self.net = nn.ModuleList([
            nn.Conv2d(512, 256, 1),
            nn.Conv2d(num_input_features * 256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 6 * num_frames, 1),
        ])

    def forward(self, feats):
        if torch.is_tensor(feats):
            feats = [feats]
        x = torch.cat([F.relu(self.net[0](f)) for f in feats], 1)
        x = F.relu(self.net[1](x))
        x = F.relu(self.net[2](x))
        x = self.net[3](x).mean(3).mean(2)
        out = 0.01 * x.view(-1, self.num_frames, 1, 6)
        return out[..., :3], out[..., 3:]


class RefPoseCNN(nn.Module):
    def __init__(self, num_input_frames=2):
        super().__init__()
        specs = [(3 * num_input_frames, 16, 7, 3), (16, 32, 5, 2),
                 (32, 64, 3, 1), (64, 128, 3, 1), (128, 256, 3, 1),
                 (256, 256, 3, 1), (256, 256, 3, 1)]
        self.net = nn.ModuleList(
            [nn.Conv2d(ci, co, k, 2, p) for ci, co, k, p in specs])
        self.pose_conv = nn.Conv2d(256, 6 * (num_input_frames - 1), 1)
        self.n_pred = num_input_frames - 1

    def forward(self, x):
        for conv in self.net:
            x = F.relu(conv(x))
        x = self.pose_conv(x).mean(3).mean(2)
        out = 0.01 * x.view(-1, self.n_pred, 1, 6)
        return out[..., :3], out[..., 3:]


class _RefResBlock(nn.Module):
    def __init__(self, feat):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(feat, feat, 3),
            nn.InstanceNorm2d(feat), nn.ReLU(inplace=True),
            nn.ReflectionPad2d(1), nn.Conv2d(feat, feat, 3),
            nn.InstanceNorm2d(feat))

    def forward(self, x):
        return x + self.block(x)


class RefGenerator(nn.Module):
    def __init__(self, channels=1, n_res=9):
        super().__init__()
        layers = [nn.ReflectionPad2d(channels), nn.Conv2d(channels, 64, 6),
                  nn.InstanceNorm2d(64), nn.ReLU(inplace=True)]
        feat = 64
        for _ in range(2):
            layers += [nn.Conv2d(feat, feat * 2, 3, 2, 1),
                       nn.InstanceNorm2d(feat * 2), nn.ReLU(inplace=True)]
            feat *= 2
        for _ in range(n_res):
            layers.append(_RefResBlock(feat))
        for _ in range(2):
            layers += [nn.Upsample(scale_factor=2),
                       nn.Conv2d(feat, feat // 2, 3, 1, 1),
                       nn.InstanceNorm2d(feat // 2), nn.ReLU(inplace=True)]
            feat //= 2
        layers += [nn.ReflectionPad2d(channels),
                   nn.Conv2d(feat, channels, 7, padding=2), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)
