"""FPN neck — rebuild of ``mmdet/models/necks/fpn.py`` (4-in / 5-out
lateral + top-down pyramid, extra level via stride-2 max-pool on P5, the
MaskRCNN configuration of every IIF experiment).

NHWC; upsampling is nearest (mmdet default) fused by XLA into the add.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# mmdet FPN convs: Xavier-uniform init, bias 0
xavier_uniform = nn.initializers.xavier_uniform()


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    add_extra_convs: bool = False  # MaskRCNN uses maxpool extra level
    dtype: object = None           # bf16 compute option (params fp32)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=xavier_uniform,
                    dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # top-down: upsample by 2 (nearest) and add
        for i in range(n_in - 1, 0, -1):
            up = laterals[i]
            b, h, w, c = up.shape
            th, tw = laterals[i - 1].shape[1:3]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)[:, :th, :tw, :]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_uniform, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        # extra levels (P6 for RPN): stride-2 maxpool on the last output
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
