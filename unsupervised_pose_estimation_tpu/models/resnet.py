"""ResNet feature-pyramid encoder (Flax, NHWC).

TPU-native re-design of the reference encoder
(`/root/reference/networks/resnet_encoder.py:64-101`): ResNet-{18,34,50,101,
152} returning the 5-level pyramid [conv1+bn+relu, layer1..layer4] with
channel widths [64, 64, 128, 256, 512] (x4 beyond depth 34), and the
multi-image variant whose first conv consumes ``num_input_images`` stacked
RGB frames (`resnet_encoder.py:18-41`).

Design notes (vs a torch translation):
  * NHWC layout so XLA tiles convs straight onto the MXU.
  * Explicit torch-style symmetric padding (((1,1),(1,1)) etc.) rather than
    XLA 'SAME' so weights imported from .pth checkpoints reproduce the
    reference outputs exactly (SAME pads asymmetrically at stride 2).
  * Optional ``compute_dtype`` (bf16) for MXU throughput; params stay fp32.
  * As in the reference forward (`resnet_encoder.py:95`), inputs are NOT
    ImageNet-normalized (that line is commented out upstream).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# Kaiming-normal fan-out, matching the reference's conv init
# (`resnet_encoder.py:35-38`).
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK_DEPTHS = (50, 101, 152)


def encoder_channels(num_layers: int):
    """Pyramid channel widths, matching `resnet_encoder.py:72,90-91`."""
    ch = [64, 64, 128, 256, 512]
    if num_layers > 34:
        ch = [ch[0]] + [c * 4 for c in ch[1:]]
    return tuple(ch)


class _StemP(nn.Module):
    """Bare 7x7 conv kernel with nn.Conv's tree layout (no bias), shared
    between the plain and packed stem paths."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _conv_init,
                          (7, 7, self.in_features, self.features))


def _packed_stem_conv(x, kernel, compute_dtype, already_packed=False):
    """7x7 stride-2 pad-3 conv evaluated in space-to-depth layout.

    The stem's 3-6 input channels starve the MXU's 128-lane contraction
    (~7 TFLOP/s measured, scripts/bench_conv.py). Packing the input 2x2
    (4*Cin channels at half resolution) makes the stride-2 conv a stride-1
    4x4 conv with contraction dim 16*Cin — exact same math (tap (a, b) of
    the 7x7 kernel lands in packed tap (floor((a-3)/2)+2, ...) sub-channel
    ((a-3) mod 2, ...)), zero padding becomes plain (2, 1) packed padding,
    and the input gradient needs no lhs_dilation.

    With ``already_packed`` the input arrives in (r, s, c) packed layout
    (e.g. straight from ops.augment_device.batch_augment(packed=True)) and
    the shuffle here is skipped entirely."""
    import jax

    from ..ops.packed import space_to_depth

    cin, cout = kernel.shape[2], kernel.shape[3]
    k4 = jnp.zeros((4, 4, 4 * cin, cout), kernel.dtype)
    for a in range(7):
        dp, rp = divmod(a - 3, 2)
        for b_ in range(7):
            dq, sp = divmod(b_ - 3, 2)
            ci = (rp * 2 + sp) * cin
            k4 = k4.at[dp + 2, dq + 2, ci:ci + cin, :].set(kernel[a, b_])
    xp = x if already_packed else space_to_depth(x)
    return jax.lax.conv_general_dilated(
        xp.astype(compute_dtype), k4.astype(compute_dtype),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    compute_dtype: jnp.dtype = jnp.float32
    packed_stem: bool = False  # kernel 7 / stride 2 / pad 3 only

    @nn.compact
    def __call__(self, x, train: bool, packed_in: bool = False):
        if self.packed_stem and (packed_in or (x.shape[1] % 2 == 0
                                               and x.shape[2] % 2 == 0)):
            assert (self.kernel, self.stride, self.pad) == (7, 2, 3)
            cin = x.shape[-1] // 4 if packed_in else x.shape[-1]
            kernel = _StemP(self.features, cin, name="conv")()
            x = _packed_stem_conv(x, kernel, self.compute_dtype,
                                  already_packed=packed_in)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((self.pad, self.pad), (self.pad, self.pad)),
                use_bias=False,
                kernel_init=_conv_init,
                dtype=self.compute_dtype,
                name="conv",
            )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, 1,
                      self.compute_dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, 1,
                      self.compute_dtype, name="cb2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride, 0,
                               self.compute_dtype, name="down")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # output width (4x the inner width)
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inner = self.features // 4
        identity = x
        out = nn.relu(_ConvBN(inner, 1, 1, 0,
                              self.compute_dtype, name="cb1")(x, train))
        out = nn.relu(_ConvBN(inner, 3, self.stride, 1,
                              self.compute_dtype, name="cb2")(out, train))
        out = _ConvBN(self.features, 1, 1, 0,
                      self.compute_dtype, name="cb3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride, 0,
                               self.compute_dtype, name="down")(x, train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """5-level ResNet pyramid over NHWC images in [0, 1].

    Returns features at strides [/2, /4, /8, /16, /32] with widths
    ``encoder_channels(num_layers)``.
    """

    num_layers: int = 18
    num_input_images: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_in: bool = False) -> Sequence[jnp.ndarray]:
        """``packed_in``: x is space-to-depth packed (B, H/2, W/2, 4*Cin) —
        the layout batch_augment(packed=True) emits — so the packed stem
        consumes it without its own shuffle. Same parameters, same output."""
        if self.num_layers not in STAGE_BLOCKS:
            raise ValueError(
                f"{self.num_layers} is not a valid number of resnet layers")
        block = (Bottleneck if self.num_layers in BOTTLENECK_DEPTHS
                 else BasicBlock)
        widths = encoder_channels(self.num_layers)[1:]
        stages = STAGE_BLOCKS[self.num_layers]

        x = x.astype(self.compute_dtype)
        features = []
        x = _ConvBN(64, 7, 2, 3, self.compute_dtype, packed_stem=True,
                    name="stem")(x, train, packed_in=packed_in)
        x = nn.relu(x)
        features.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, (width, n_blocks) in enumerate(zip(widths, stages)):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(width, stride, self.compute_dtype,
                          name=f"layer{stage + 1}_{i}")(x, train)
            features.append(x)
        return features
