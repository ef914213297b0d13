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
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    variant: str = "fork"  # "fork": deconv+BN; "upstream": nearest, no BN
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray],
                 train: bool = False) -> Dict[int, jnp.ndarray]:
        use_bn = self.variant == "fork"
        outputs = {}
        x = input_features[-1].astype(self.compute_dtype)
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], self.compute_dtype,
                          name=f"upconv_{i}_0")(x)
            if self.variant == "fork":
                x = Deconv2x(NUM_CH_DEC[i], compute_dtype=self.compute_dtype,
                             name=f"deconv_{i}")(x)
            else:
                x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.compute_dtype)],
                    axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], self.compute_dtype,
                          name=f"upconv_{i}_1")(x)
            if use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.compute_dtype,
                                 name=f"bn_{i}")(x)
            if i in self.scales:
                from .layers import Conv3x3
                disp = Conv3x3(self.num_output_channels,
                               compute_dtype=self.compute_dtype,
                               name=f"dispconv_{i}")(x)
                outputs[i] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs
