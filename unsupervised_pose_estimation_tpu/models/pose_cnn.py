"""Standalone PoseCNN (Flax, NHWC).

Re-design of `/root/reference/networks/pose_cnn.py:13-50`: 7 stride-2 convs
over channel-concatenated RGB frames, 1x1 pose conv, global mean, x0.01.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

_SPECS = (  # (features, kernel, pad) per pose_cnn.py:20-26; all stride 2
    (16, 7, 3), (32, 5, 2), (64, 3, 1), (128, 3, 1),
    (256, 3, 1), (256, 3, 1), (256, 3, 1),
)


class PoseCNN(nn.Module):
    num_input_frames: int = 2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out = x.astype(self.compute_dtype)
        for i, (feat, k, p) in enumerate(_SPECS):
            out = nn.Conv(feat, (k, k), strides=(2, 2),
                          padding=((p, p), (p, p)),
                          dtype=self.compute_dtype, name=f"conv_{i}")(out)
            out = nn.relu(out)
        n_pred = self.num_input_frames - 1
        out = nn.Conv(6 * n_pred, (1, 1), dtype=self.compute_dtype,
                      name="pose_conv")(out)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        out = 0.01 * out.reshape(-1, n_pred, 1, 6)
        return out[..., :3], out[..., 3:]
