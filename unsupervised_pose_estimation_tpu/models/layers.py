"""Shared conv building blocks for the decoders (Flax, NHWC).

Counterparts of the reference's ConvBlock / Conv3x3 / deconv
(`/root/reference/layers.py:175-207,272-282`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 VALID conv (`/root/reference/layers.py:192-207`)."""

    features: int
    use_refl: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode=mode)
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.compute_dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (`/root/reference/layers.py:175-187`)."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, compute_dtype=self.compute_dtype,
                              name="conv3x3")(x))


class Deconv2x(nn.Module):
    """Exact 2x transposed conv: k=3, stride=2, padding=1, output_padding=1.

    Matches the fork's decoder deconv (`/root/reference/networks/
    depth_decoder.py:33`). Implemented as an input-dilated convolution with a
    spatially flipped kernel — the algebraic identity for transposed conv —
    so it lowers to a single XLA conv that XLA places on the MXU. Kernel is
    stored torch-transposed-conv style as (kh, kw, out, in) spatially
    unflipped, so .pth weight import is a pure transpose.
    """

    features: int
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (3, 3, self.features, in_ch),
        )
        # transposed conv == correlate(input dilated by stride, flip(kernel))
        # with per-edge padding (k-1-p, k-1-p+output_padding) = (1, 2).
        flipped = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            flipped.astype(self.compute_dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.compute_dtype)
        return y


def instance_norm(x, eps: float = 1e-5):
    """Per-sample, per-channel normalization over spatial dims — torch
    InstanceNorm2d defaults (affine=False, no running stats), as used by the
    CycleGAN nets (`/root/reference/networks/GeneratorResNet.py`)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
