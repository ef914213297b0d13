"""Pose regression decoder (Flax, NHWC).

Re-design of `/root/reference/networks/pose_decoder.py:14-54`: 1x1 squeeze
conv(256) on each input feature stack's last level, concat, three convs,
global spatial mean, x0.01, reshaped to per-frame (axis-angle, translation).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[jnp.ndarray]]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert len(input_features) == self.num_input_features
        last = [f[-1].astype(self.compute_dtype) for f in input_features]
        # ONE squeeze conv shared across all input feature stacks
        # (reference applies the same self.convs["squeeze"] to each,
        # networks/pose_decoder.py:38)
        squeeze = nn.Conv(256, (1, 1), dtype=self.compute_dtype,
                          name="squeeze")
        squeezed = [nn.relu(squeeze(f)) for f in last]
        out = jnp.concatenate(squeezed, axis=-1)
        for i in range(3):
            features = (6 * self.num_frames_to_predict_for if i == 2 else 256)
            kernel = (1, 1) if i == 2 else (3, 3)
            pad = ((0, 0), (0, 0)) if i == 2 else ((1, 1), (1, 1))
            out = nn.Conv(features, kernel, padding=pad,
                          dtype=self.compute_dtype, name=f"pose_{i}")(out)
            if i != 2:
                out = nn.relu(out)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # (B, 6*F)
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]
