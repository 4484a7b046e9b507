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
    """``add_extra_convs``: False -> stride-2 maxpool extra levels (the
    MaskRCNN/RPN config); 'on_input' -> stride-2 3x3 convs on the last
    BACKBONE map (RetinaNet: P6/P7 from C5, ``fpn.py`` extra_convs_on_inputs);
    'on_output' -> stride-2 convs on the last FPN output (FCOS-style, with
    ``relu_before_extra_convs=True``).

    ``start_level`` drops the first backbone maps (RetinaNet/FCOS use
    C3-C5, start_level=1 of the 4 ResNet outputs)."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: object = False  # False | 'on_input' | 'on_output'
    relu_before_extra_convs: bool = False
    dtype: object = None           # bf16 compute option (params fp32)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        extra_source = inputs[-1]            # C5 for 'on_input'
        inputs = list(inputs)[self.start_level:]
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
        if not self.add_extra_convs:
            while len(outs) < self.num_outs:
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            return tuple(outs)
        # extra stride-2 3x3 convs (RetinaNet P6/P7 on C5; FCOS on P5).
        # mmdet semantics: the FIRST extra conv eats extra_source raw; each
        # subsequent one eats the previous extra output, with a relu in
        # between iff relu_before_extra_convs (fpn.py forward tail)
        src = extra_source if self.add_extra_convs == "on_input" else outs[-1]
        for i in range(self.num_outs - n_in):
            if i > 0 and self.relu_before_extra_convs:
                src = nn.relu(src)
            src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                          padding=1, kernel_init=xavier_uniform,
                          dtype=self.dtype, name=f"extra_conv_{i}")(src)
            outs.append(src)
        return tuple(outs)
