"""CycleGAN-style generator and PatchGAN discriminator (Flax, NHWC).

Re-designs of the reference's semi-supervised GAN-prior networks:
  * GeneratorResNet (`/root/reference/networks/GeneratorResNet.py:21-68`):
    reflection-pad(C) + 6x6 conv(64) + IN + ReLU, 2 stride-2 downsamples,
    N residual blocks (InstanceNorm), 2 nearest-upsample+conv stages,
    reflection-pad(C) + 7x7 conv(pad 2) + tanh. The odd initial kernel size
    (6) and final pad (2) are preserved deliberately — they are only
    self-consistent for the 1-channel grayscale use, which is how the frozen
    generator is driven (`/root/reference/trainer.py:118-132`); see SURVEY.md
    §8.8.
  * PatchGAN Discriminator (`/root/reference/networks/
    DiscriminatorPatchGAN.py:3-30`): 4 stride-2 conv blocks 64->512
    (InstanceNorm, LeakyReLU 0.2), asymmetric zero-pad, 4x4 conv -> 1-channel
    patch map of shape (H/16, W/16).

InstanceNorm follows torch defaults (affine=False, no running stats).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import instance_norm
from ..ops.resize import upsample2x_nearest


class _ResidualBlock(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    dtype=self.compute_dtype, name="conv1")(h)
        h = nn.relu(instance_norm(h))
        h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    dtype=self.compute_dtype, name="conv2")(h)
        return x + instance_norm(h)


class GeneratorResNet(nn.Module):
    channels: int = 1
    num_residual_blocks: int = 9
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = x.astype(self.compute_dtype)

        # Initial block: ReflectionPad2d(channels) + 6x6 conv.
        h = jnp.pad(x, [(0, 0), (c, c), (c, c), (0, 0)], mode="reflect")
        h = nn.Conv(64, (6, 6), padding="VALID", dtype=self.compute_dtype,
                    name="initial")(h)
        h = nn.relu(instance_norm(h))

        feat = 64
        for i in range(2):  # downsampling
            feat *= 2
            h = nn.Conv(feat, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.compute_dtype,
                        name=f"down_{i}")(h)
            h = nn.relu(instance_norm(h))

        for i in range(self.num_residual_blocks):
            h = _ResidualBlock(feat, self.compute_dtype, name=f"res_{i}")(h)

        for i in range(2):  # upsampling: nn.Upsample(2x nearest) + conv
            feat //= 2
            h = upsample2x_nearest(h)
            h = nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.compute_dtype, name=f"up_{i}")(h)
            h = nn.relu(instance_norm(h))

        h = jnp.pad(h, [(0, 0), (c, c), (c, c), (0, 0)], mode="reflect")
        h = nn.Conv(c, (7, 7), padding=((2, 2), (2, 2)),
                    dtype=self.compute_dtype, name="output")(h)
        return jnp.tanh(h.astype(jnp.float32))


class PatchGANDiscriminator(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.compute_dtype)
        for i, feat in enumerate((64, 128, 256, 512)):
            h = nn.Conv(feat, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.compute_dtype,
                        name=f"block_{i}")(h)
            if i > 0:  # first block skips normalization
                h = instance_norm(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        # nn.ZeroPad2d((1, 0, 1, 0)) then 4x4 conv pad 1 -> (H/16, W/16).
        h = jnp.pad(h, [(0, 0), (1, 0), (1, 0), (0, 0)])
        h = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)),
                    dtype=self.compute_dtype, name="final")(h)
        return h.astype(jnp.float32)
