"""U-Net disparity decoder (Flax, NHWC).

Re-design of the fork's decoder (`/root/reference/networks/
depth_decoder.py:17-80`): per level i=4..0, ConvBlock -> 2x transposed-conv
upsample -> skip-concat encoder feature -> ConvBlock -> BatchNorm -> sigmoid
1-ch dispconv at the requested scales. Two reference defects are fixed by
design (SURVEY.md §8.3): the BatchNorms here are registered parameters
(trained, checkpointed), and nothing hardcodes a device.

``variant="upstream"`` reproduces the original monodepth2 decoder (nearest
2x upsample, no BatchNorm) so pretrained monodepth2 checkpoints can be
imported for parity checks.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBlock, Deconv2x
from ..ops.resize import upsample2x_nearest

NUM_CH_DEC = (16, 32, 64, 128, 256)


class DepthDecoder(nn.Module):
    """``packed_tail`` (fork variant only) carries levels 1 and 0 — the
    low-channel, high-resolution tail — in space-to-depth layout
    (ops.packed): each deconv keeps its natural packed output, skip features
    stay full-res and contribute through a stride-2 4x4 conv that emits
    packed output directly (packed_skip_conv3x3 — no s2d transpose on the
    activation), the ConvBlocks and dispconvs run as packed convs (~3x
    faster on the MXU than their 16-32 channel full-res forms, fwd and
    bwd), and BatchNorm groups its stats per original channel via a pure
    reshape. Bit-for-bit the same parameters and (up to f32 reduction
    order) the same outputs."""

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    variant: str = "fork"  # "fork": deconv+BN; "upstream": nearest, no BN
    compute_dtype: jnp.dtype = jnp.float32
    packed_tail: bool = True

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray],
                 train: bool = False) -> Dict[int, jnp.ndarray]:
        from ..ops.packed import depth_to_space

        use_bn = self.variant == "fork"
        outputs = {}
        x = input_features[-1].astype(self.compute_dtype)
        x_packed = False  # is x currently in (r, s, c) packed layout?
        for i in range(4, -1, -1):
            packed = (self.packed_tail and i <= 1
                      and self.variant == "fork")
            x = ConvBlock(NUM_CH_DEC[i], self.compute_dtype,
                          name=f"upconv_{i}_0")(x, packed=x_packed)
            if x_packed:
                x = depth_to_space(x)  # the deconv consumes full-res layout
                x_packed = False
            if self.variant == "fork":
                x = Deconv2x(NUM_CH_DEC[i], compute_dtype=self.compute_dtype,
                             name=f"deconv_{i}")(x, keep_packed=packed)
                x_packed = packed
            else:
                x = upsample2x_nearest(x)
            skip_full = None
            if self.use_skips and i > 0:
                skip = input_features[i - 1].astype(self.compute_dtype)
                if x_packed:
                    # the skip stays FULL-RES: its slice of upconv_i_1 runs
                    # as a stride-2 4x4 conv emitting packed output directly
                    # (ops.packed.packed_skip_conv3x3) — no s2d transpose on
                    # the activation and 16/9 nominal FLOPs instead of 4x.
                    # Parameters remain the concatenated-form kernel.
                    skip_full = skip
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], self.compute_dtype,
                          name=f"upconv_{i}_1")(x, packed=x_packed,
                                                skip=skip_full)
            if use_bn:
                bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.compute_dtype,
                                  name=f"bn_{i}")
                if x_packed:
                    # per-ORIGINAL-channel stats: (B, Hp, Wp, 4, C) view
                    b_, hp, wp, c4 = x.shape
                    x = bn(x.reshape(b_, hp, wp, 4, c4 // 4)
                           ).reshape(b_, hp, wp, c4)
                else:
                    x = bn(x)
            if i in self.scales:
                from .layers import Conv3x3
                disp = Conv3x3(self.num_output_channels,
                               compute_dtype=self.compute_dtype,
                               name=f"dispconv_{i}")(x, packed=x_packed)
                if x_packed:
                    disp = depth_to_space(disp)
                outputs[i] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs
