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
    # 'gn' + conv_ws: the gn-all / gn+ws-all recipes (reference
    # configs/gn, configs/gn+ws: norm_cfg GN(32) + ConvWS on the neck)
    norm: str = ""
    conv_ws: bool = False
    dtype: object = None           # bf16 compute option (params fp32)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        from iif_tpu.models.resnet import make_conv, make_norm

        Conv = make_conv(self.conv_ws)

        def maybe_norm(x, name):
            if self.norm == "gn":
                return make_norm("gn", False, name, self.dtype)(x)
            return x

        extra_source = inputs[-1]            # C5 for 'on_input'
        inputs = list(inputs)[self.start_level:]
        n_in = len(inputs)
        laterals = [
            maybe_norm(
                Conv(self.out_channels, (1, 1), kernel_init=xavier_uniform,
                     use_bias=not self.norm, dtype=self.dtype,
                     name=f"lateral_{i}")(x), f"lateral_gn_{i}")
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
            maybe_norm(
                Conv(self.out_channels, (3, 3), padding=1,
                     kernel_init=xavier_uniform, use_bias=not self.norm,
                     dtype=self.dtype, name=f"fpn_conv_{i}")(l),
                f"fpn_gn_{i}")
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


class PAFPN(nn.Module):
    """PAFPN (``mmdet/models/necks/pafpn.py``): FPN plus a bottom-up
    path-aggregation pass — stride-2 3x3 downsample convs add the lower
    output into the next level, then per-level 3x3 out convs."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        inputs = list(inputs)[self.start_level:]
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=xavier_uniform,
                    dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)]
        for i in range(n_in - 1, 0, -1):
            up = laterals[i]
            th, tw = laterals[i - 1].shape[1:3]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)[:, :th, :tw, :]
            laterals[i - 1] = laterals[i - 1] + up
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_uniform, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(l)
            for i, l in enumerate(laterals)]
        # bottom-up path aggregation
        for i in range(n_in - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=1, kernel_init=xavier_uniform,
                           dtype=self.dtype,
                           name=f"downsample_conv_{i}")(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_uniform, dtype=self.dtype,
                    name=f"pafpn_conv_{i}")(inter[i])
            for i in range(1, n_in)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (mmcv ``NonLocal2d``; used by
    BFP refine_type='non_local' in the Libra R-CNN config and as the
    GRoIE post module): theta/phi/g 1x1 projections at C/reduction,
    softmax attention over all positions, zero-initialized output
    projection added residually — pure MXU matmuls on TPU."""
    reduction: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ci = max(c // self.reduction, 1)
        xf = x.astype(jnp.float32)
        theta = nn.Conv(ci, (1, 1), name="theta")(xf).reshape(b, h * w, ci)
        phi = nn.Conv(ci, (1, 1), name="phi")(xf).reshape(b, h * w, ci)
        g = nn.Conv(ci, (1, 1), name="g")(xf).reshape(b, h * w, ci)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", theta, phi), axis=-1)
        y = jnp.einsum("bij,bjc->bic", attn, g).reshape(b, h, w, ci)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      name="conv_out")(y)
        return x + out.astype(x.dtype)


def _adaptive_max_axis(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    """Exact ``F.adaptive_max_pool`` along one axis (torch semantics:
    output cell ``i`` maxes over ``[floor(i*in/out), ceil((i+1)*in/out))``).
    Shapes are static, so the window map is precomputed host-side."""
    import numpy as np

    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    xm = jnp.moveaxis(x, axis, 0)
    if in_len % out_len == 0:
        k = in_len // out_len
        pooled = xm.reshape((out_len, k) + xm.shape[1:]).max(axis=1)
        return jnp.moveaxis(pooled, 0, axis)
    idx_out = np.arange(out_len)
    starts = (idx_out * in_len) // out_len
    ends = -((-(idx_out + 1) * in_len) // out_len)
    kmax = int((ends - starts).max())
    offs = starts[:, None] + np.arange(kmax)[None]
    gathered = xm[jnp.asarray(np.minimum(offs, in_len - 1))]
    valid = jnp.asarray(offs < ends[:, None]).reshape(
        (out_len, kmax) + (1,) * (xm.ndim - 1))
    neg = jnp.asarray(jnp.finfo(x.dtype).min if jnp.issubdtype(
        x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, x.dtype)
    pooled = jnp.where(valid, gathered, neg).max(axis=1)
    return jnp.moveaxis(pooled, 0, axis)


def adaptive_max_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC ``F.adaptive_max_pool2d`` (exact, torch window semantics)."""
    x = _adaptive_max_axis(x, out_hw[0], 1)
    return _adaptive_max_axis(x, out_hw[1], 2)


class BFP(nn.Module):
    """Balanced Feature Pyramid of Libra R-CNN
    (``mmdet/models/necks/bfp.py``): gather all levels to the
    ``refine_level`` resolution, average, refine (3x3 conv or the
    reference config's non-local block), and scatter the residual back
    to every level."""
    out_channels: int = 256
    refine_level: int = 2
    refine_type: str = "non_local"   # None | 'conv' | 'non_local'

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        n = len(inputs)
        th, tw = inputs[self.refine_level].shape[1:3]
        gathered = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                g = adaptive_max_pool2d(x, (th, tw))
            elif i > self.refine_level:
                g = jax.image.resize(
                    x, (x.shape[0], th, tw, x.shape[-1]), "nearest")
            else:
                g = x
            gathered.append(g)
        bsf = sum(gathered) / n
        if self.refine_type == "conv":
            bsf = nn.Conv(self.out_channels, (3, 3), padding=1,
                          kernel_init=xavier_uniform, name="refine")(bsf)
        elif self.refine_type == "non_local":
            bsf = NonLocal2d(name="refine")(bsf)
        outs = []
        for i, x in enumerate(inputs):
            h, w = x.shape[1:3]
            if i > self.refine_level:
                r = adaptive_max_pool2d(bsf, (h, w))
            else:
                r = jax.image.resize(
                    bsf, (bsf.shape[0], h, w, bsf.shape[-1]), "nearest")
            outs.append(x + r)
        return tuple(outs)


class HRFPN(nn.Module):
    """HRFPN for HRNetV2p (``mmdet/models/necks/hrfpn.py``): upsample
    all branch maps to the highest resolution, concat, 1x1 reduce, then
    avg-pool into ``num_outs`` strides with per-level 3x3 convs."""
    out_channels: int = 256
    num_outs: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        th, tw = inputs[0].shape[1:3]
        ups = [inputs[0]]
        for x in inputs[1:]:
            ups.append(jax.image.resize(
                x, (x.shape[0], th, tw, x.shape[-1]), "bilinear"))
        out = jnp.concatenate(ups, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1),
                      kernel_init=xavier_uniform, dtype=self.dtype,
                      name="reduction_conv")(out)
        outs = []
        for i in range(self.num_outs):
            pooled = out if i == 0 else nn.avg_pool(
                out, (2 ** i, 2 ** i), strides=(2 ** i, 2 ** i))
            outs.append(nn.Conv(
                self.out_channels, (3, 3), padding=1,
                kernel_init=xavier_uniform, dtype=self.dtype,
                name=f"fpn_conv_{i}")(pooled))
        return tuple(outs)


class NASFPN(nn.Module):
    """NAS-FPN (``mmdet/models/necks/nas_fpn.py``): ``stack_times``
    repetitions of the searched merging cell topology (GP = global
    pooling attention merge, sum merge), each merge followed by
    relu-conv-BN. Operates on 5 levels (P3-P7)."""
    out_channels: int = 256
    stack_times: int = 7
    num_outs: int = 5
    # reference configs/nas_fpn: in_channels [512, 1024, 2048] = C3-C5
    # (start_level 1), producing P3-P7 at strides 8-128 for RetinaNet
    start_level: int = 0
    dtype: object = None

    def _merge_gp(self, a, b):
        """Global-pooling cell: b + sigmoid(GAP(a)) * resized(a)...
        reference GPCell: gp(a) as attention on b."""
        att = jax.nn.sigmoid(a.mean(axis=(1, 2), keepdims=True))
        return a + att * b

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        def bn_conv(x, name):
            x = nn.relu(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        kernel_init=xavier_uniform, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            return nn.LayerNorm(name=f"{name}_ln")(x)

        def to_shape(x, ref):
            th, tw = ref.shape[1:3]
            h, w = x.shape[1:3]
            if (h, w) == (th, tw):
                return x
            if h > th and h % th == 0 and w % tw == 0 and h // th == w // tw:
                k = h // th
                return nn.max_pool(x, (k, k), strides=(k, k))
            # non-divisible shapes (ceil-division level grids on
            # non-crop inputs): nearest resize keeps the grid exact
            return jax.image.resize(
                x, (x.shape[0], th, tw, x.shape[-1]), "nearest")

        # lateral 1x1 to common width, pad to 5 levels by pooling
        inputs = list(inputs)[self.start_level:]
        feats = [nn.Conv(self.out_channels, (1, 1),
                         kernel_init=xavier_uniform, dtype=self.dtype,
                         name=f"lateral_{i}")(x)
                 for i, x in enumerate(inputs)]
        while len(feats) < self.num_outs:
            f = feats[-1]
            # ceil-mode downsample (matches the stride-2 conv grids of
            # FPN extra levels / fpn_shapes ceil division)
            ph, pw = f.shape[1] % 2, f.shape[2] % 2
            feats.append(nn.max_pool(f, (2, 2), strides=(2, 2),
                                     padding=((0, ph), (0, pw))))

        p3, p4, p5, p6, p7 = feats
        for s in range(self.stack_times):
            # the published NAS-FPN cell topology (nas_fpn.py forward)
            p4_1 = bn_conv(self._merge_gp(to_shape(p6, p4), p4),
                           f"s{s}_gp64_4")
            p4_2 = bn_conv(to_shape(p4_1, p4) + p4, f"s{s}_sum44")
            p3 = bn_conv(to_shape(p4_2, p3) + p3, f"s{s}_sum43_out")
            p4 = bn_conv(to_shape(p3, p4_2) + p4_2, f"s{s}_sum34_out")
            p5_tmp = self._merge_gp(to_shape(p4_2, p5),
                                    to_shape(p3, p5))
            p5 = bn_conv(p5_tmp + p5, f"s{s}_sum55_out")
            p7_tmp = self._merge_gp(to_shape(p5, p7), to_shape(p4_2, p7))
            p7 = bn_conv(p7_tmp + p7, f"s{s}_sum77_out")
            p6 = bn_conv(self._merge_gp(to_shape(p7, p6),
                                        to_shape(p5, p6)),
                         f"s{s}_gp75_6")
        return (p3, p4, p5, p6, p7)


class CARAFEPack(nn.Module):
    """mmcv ``CARAFEPack`` (the kernel-prediction wrapper around the
    CARAFE CUDA op): 1x1 channel compressor (64) -> content encoder
    conv producing scale^2 * k_up^2 kernel logits -> pixel shuffle to
    the upsampled grid -> per-position softmax -> content-aware
    reassembly (``iif_tpu.ops.deform.carafe_upsample``)."""
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from iif_tpu.ops.deform import carafe_upsample

        b, h, w, c = x.shape
        k2 = self.up_kernel * self.up_kernel
        s2 = self.scale * self.scale
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       kernel_init=xavier_uniform,
                       name="channel_compressor")(x)
        logits = nn.Conv(k2 * s2, (self.encoder_kernel,) * 2,
                         padding=self.encoder_kernel // 2,
                         kernel_init=nn.initializers.normal(0.001),
                         name="content_encoder")(comp)
        # pixel shuffle (B, H, W, s*s*k2) -> (B, sH, sW, k2)
        logits = logits.reshape(b, h, w, self.scale, self.scale, k2)
        logits = logits.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * self.scale, w * self.scale, k2)
        masks = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return carafe_upsample(x, masks, self.up_kernel, self.scale)


class FPNCarafe(nn.Module):
    """FPN_CARAFE (``mmdet/models/necks/fpn_carafe.py``, config
    ``configs/carafe``): the FPN top-down pathway with CARAFE
    content-aware upsampling in place of nearest-neighbor."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        inputs = list(inputs)[self.start_level:]
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=xavier_uniform,
                    dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)]
        for i in range(n_in - 1, 0, -1):
            up = CARAFEPack(name=f"carafe_{i}")(laterals[i])
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw, :]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_uniform, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(l)
            for i, l in enumerate(laterals)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class FPG(nn.Module):
    """Feature Pyramid Grids (``mmdet/models/necks/fpg.py``, config
    ``configs/fpg/*_r50_fpg_crop640_50e_coco.py``): ``stack_times``
    bottom-up pathways over a grid of per-level transitions —
    same-stage up (act-conv/2-norm), across-lateral (act-conv1-norm),
    across-down (nearest-2x-up + act-conv3-norm), and an identity-stage
    skip (act-conv1-norm from the lateral feats) — each level joining a
    pathway on the staircase schedule ``skip_inds``; per-level
    act-conv3-norm output transitions.

    TPU delta: the neck's BN is a stateless LayerNorm (this repo's
    NASFPN convention — BN on the SPMD mesh is cross-replica-exact
    already, and stateless norms keep the neck free of mutable
    collections)."""

    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    # reference config skip_inds: level j passes through the first
    # len(skip_inds[j]) pathways
    skip_inds: tuple = ((0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())
    # retinanet_r50_fpg: start_level=1 (C3-C5) + stride-2 conv extras
    start_level: int = 0
    add_extra_convs: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, ...]:
        inputs = list(inputs)[self.start_level:]
        oc = self.out_channels

        def acn(x, k, stride, name):
            """order=('act','conv','norm') ConvModule."""
            x = nn.relu(x)
            x = nn.Conv(oc, (k, k), strides=stride, padding=k // 2,
                        kernel_init=xavier_uniform, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            return nn.LayerNorm(name=f"{name}_ln")(x)

        feats = [nn.Conv(oc, (1, 1), kernel_init=xavier_uniform,
                         dtype=self.dtype, name=f"lateral_{i}")(x)
                 for i, x in enumerate(inputs)]
        extra_i = 0
        while len(feats) < self.num_outs:
            f = feats[-1]
            if self.add_extra_convs:
                feats.append(nn.Conv(
                    oc, (3, 3), strides=(2, 2), padding=1,
                    kernel_init=xavier_uniform, dtype=self.dtype,
                    name=f"extra_{extra_i}")(f))
                extra_i += 1
            else:
                ph, pw = f.shape[1] % 2, f.shape[2] % 2
                feats.append(nn.max_pool(f, (1, 1), strides=(2, 2),
                                         padding=((0, ph), (0, pw))))

        outs = [feats]
        for s in range(self.stack_times):
            cur = outs[-1]
            nxt = []
            for lvl in range(self.num_outs):
                if s in self.skip_inds[lvl]:
                    nxt.append(cur[lvl])
                    continue
                total = acn(cur[lvl], 1, 1, f"s{s}_l{lvl}_lat")
                if lvl > 0:               # same-stage up (this pathway)
                    total = total + acn(nxt[-1], 3, 2,
                                        f"s{s}_l{lvl}_same_up")
                if lvl < self.num_outs - 1:   # across-down: coarser, up
                    c = cur[lvl + 1]
                    th, tw = total.shape[1:3]
                    up = jax.image.resize(
                        c, (c.shape[0], th, tw, c.shape[-1]), "nearest")
                    total = total + acn(up, 3, 1, f"s{s}_l{lvl}_down")
                total = total + acn(outs[0][lvl], 1, 1,
                                    f"s{s}_l{lvl}_skip")
                nxt.append(total)
            outs.append(nxt)

        return tuple(acn(outs[-1][i], 3, 1, f"out_{i}")
                     for i in range(self.num_outs))
