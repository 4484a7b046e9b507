"""Shared model layers: normalized / cosine classifier heads, SE block.

Functional flax reimplementations of the reference's head options
(``classification/resnet_cifar.py:38-78``, ``resnet_pytorch.py:212-219``)
selected by ``--classif_norm in {None, norm, cosine, lr_cosine}``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# He-normal matches torch's kaiming_normal_ default (fan_in, ReLU gain).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class NormedLinear(nn.Module):
    """Cosine classifier: ``normalize(x) @ normalize(W, axis=0)``.

    Reference ``resnet_cifar.py:38-48``. The torch init (uniform(-1,1) then
    renorm columns to unit L2) is equivalent to column-normalized uniform
    vectors; we initialize uniform then normalize in the forward pass, which
    yields the same function (the head is scale-invariant in W columns).
    An optional fixed temperature multiplies the cosine similarity
    (detection variant, ``mmdet/models/utils/normed_predictor.py:11-40``).
    """

    features: int
    temperature: float = 1.0
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel",
            nn.initializers.uniform(scale=2.0),  # ~U(0, 2); centered below
            (x.shape[-1], self.features),
            jnp.float32,
        ) - 1.0
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + self.eps)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + self.eps)
        return self.temperature * (x @ w.astype(x.dtype))


class IIFNormedLinear(nn.Module):
    """Cosine classifier whose weights are PRE-multiplied by the IIF vector
    before normalization (reference ``normed_predictor.py:43-76``
    ``IIFNormedLinear``): ``normalize(x) @ normalize(W * iif, axis=0) * t``.
    ``iif_weights`` has C(+1) entries matching the output dim."""

    features: int
    iif_weights: tuple = ()          # static per-class multipliers
    temperature: float = 8.0
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel",
            nn.initializers.uniform(scale=2.0),
            (x.shape[-1], self.features),
            jnp.float32,
        ) - 1.0
        iif = jnp.asarray(self.iif_weights, jnp.float32)
        w = w * iif[None, :]
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + self.eps)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + self.eps)
        return self.temperature * (x @ w.astype(x.dtype))


class CosNormClassifier(nn.Module):
    """Scaled cosine classifier with ``‖x‖/(1+‖x‖)`` feature squashing.

    Reference ``resnet_cifar.py:50-78``: ``out = s * (‖x‖/(1+‖x‖)) *
    (x/‖x‖) @ normalize(W, rows).T``; with ``lr_scale`` the scale is a
    learned parameter initialized at 5.0 and squared in the forward.
    """

    features: int
    scale: float = 16.0
    lr_scale: bool = False
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dims = x.shape[-1]
        stdv = 1.0 / jnp.sqrt(in_dims)
        w = self.param(
            "kernel",
            lambda key, shape, dtype: (jnp.asarray(
                nn.initializers.uniform(scale=2.0)(key, shape, dtype)) - 1.0) * stdv,
            (self.features, in_dims),
            jnp.float32,
        )
        norm_x = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ex = (norm_x / (1.0 + norm_x)) * (x / (norm_x + self.eps))
        ew = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + self.eps)
        if self.lr_scale:
            s = self.param("scale", nn.initializers.constant(5.0), (1,), jnp.float32)
            return (s.astype(x.dtype) ** 2) * (ex @ ew.T.astype(x.dtype))
        return self.scale * (ex @ ew.T.astype(x.dtype))


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference ``resnet_cifar.py:89-106``, r=4;
    ``resnet_pytorch.py`` SE bottlenecks use r=16)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))  # NHWC global average pool
        y = nn.Dense(c // self.reduction, use_bias=False,
                     kernel_init=kaiming_normal, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=kaiming_normal, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


def make_classifier_head(num_classes: int, use_norm: Optional[str]) -> nn.Module:
    """Head dispatch mirroring ``resnet_cifar.py:185-192``."""
    if use_norm == "norm":
        return NormedLinear(num_classes)
    if use_norm == "cosine":
        return CosNormClassifier(num_classes)
    if use_norm == "lr_cosine":
        return CosNormClassifier(num_classes, lr_scale=True)
    if use_norm in (None, "None", "", "linear"):
        return nn.Dense(num_classes, kernel_init=kaiming_normal, name="linear")
    raise ValueError(f"unknown classifier norm {use_norm!r}")


class ConvWS(nn.Module):
    """Weight-standardized conv (reference mmcv ``ConvWS2d``,
    ``conv_cfg=dict(type='ConvWS')`` of configs/gn+ws): the kernel is
    standardized over (kh, kw, cin) per output channel before the
    convolution — zero-mean unit-variance filters that keep GN-trained
    nets in the BN-free scratch/gn+ws recipes well-conditioned.

    Call-compatible with the ``nn.Conv`` sites of the detection trunks
    (strides / padding / feature_group_count / use_bias / dtype)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: int = 1
    padding: object = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros
    dtype: object = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        k = self.param("kernel", self.kernel_init,
                       (kh, kw, cin, self.features))
        mu = k.mean(axis=(0, 1, 2), keepdims=True)
        var = k.var(axis=(0, 1, 2), keepdims=True)
        k = (k - mu) * jax.lax.rsqrt(var + self.eps)
        if self.dtype is not None:
            k = k.astype(self.dtype)
            x = x.astype(self.dtype)
        s = (self.strides if isinstance(self.strides, (tuple, list))
             else (self.strides, self.strides))
        if isinstance(self.padding, int):
            pad = ((self.padding, self.padding),) * 2
        else:
            pad = self.padding
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=tuple(s), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ContextBlock(nn.Module):
    """GCNet global-context block (reference mmcv
    ``cnn/bricks/context_block.py``, used via backbone ``plugins`` in
    configs/gcnet — e.g. ``ContextBlock(ratio=1/4)`` after conv3 of
    C3-C5): attention-pooled global context, squeezed through a
    LayerNorm'd bottleneck, added back per channel. The final projection
    is zero-initialized so the block starts as identity."""

    ratio: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        # spatial attention pooling (pooling_type='att')
        mask = nn.Conv(1, (1, 1), kernel_init=kaiming_normal,
                       name="conv_mask")(x.astype(jnp.float32))
        attn = jax.nn.softmax(mask.reshape(b, h * w), axis=1)
        ctx = jnp.einsum("bnc,bn->bc",
                         x.reshape(b, h * w, c).astype(jnp.float32), attn)
        # channel_add branch: conv -> LN -> relu -> conv(zero-init)
        t = nn.Dense(planes, name="ca_fc1")(ctx)
        t = nn.LayerNorm(name="ca_ln")(t)
        t = nn.relu(t)
        t = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     name="ca_fc2")(t)
        return x + t[:, None, None, :].astype(x.dtype)


class GeneralizedAttention(nn.Module):
    """Empirical-attention block (reference mmcv
    ``cnn/bricks/generalized_attention.py``, backbone plugin of
    configs/empirical_attention; "An Empirical Study of Spatial
    Attention Mechanisms", Zhu et al. 2019).

    ``attention_type`` is the paper's 4-bit mask over energy terms:
    (0) query-content x key-content, (1) query-content x relative
    position, (2) key-content saliency, (3) relative-position bias.
    The shipped configs use '0010' (key saliency only) and '1111'.
    Multi-head (8), key/value stride 2; relative positions enter
    through a sinusoidal embedding projected per head — every term is
    a batched MXU matmul. Output projection is zero-initialized so the
    residual starts as identity."""

    attention_type: str = "1111"
    num_heads: int = 8
    kv_stride: int = 2
    pos_dim: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        import numpy as np

        b, h, w, c = x.shape
        heads = self.num_heads
        dh = max(c // heads, 1)
        use = [t == "1" for t in self.attention_type]

        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        hk, wk = kv.shape[1:3]
        n_q, n_k = h * w, hk * wk

        q = nn.Conv(heads * dh, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal, name="query_conv")(
            x.astype(jnp.float32)).reshape(b, n_q, heads, dh)
        k = nn.Conv(heads * dh, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal, name="key_conv")(
            kv.astype(jnp.float32)).reshape(b, n_k, heads, dh)
        v = nn.Conv(heads * dh, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal, name="value_conv")(
            kv.astype(jnp.float32)).reshape(b, n_k, heads, dh)

        energy = jnp.zeros((b, heads, n_q, n_k), jnp.float32)
        scale = 1.0 / np.sqrt(dh)
        if use[0]:
            energy = energy + jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if use[2]:
            key_bias = nn.Conv(heads, (1, 1), use_bias=False,
                               kernel_init=kaiming_normal,
                               name="appr_bias_conv")(
                kv.astype(jnp.float32)).reshape(b, n_k, heads)
            energy = energy + key_bias.transpose(0, 2, 1)[:, :, None, :]
        if use[1] or use[3]:
            # sinusoidal embedding of relative (dy, dx) in key-grid units
            qy = jnp.arange(h)[:, None].repeat(w, 1).reshape(-1)
            qx = jnp.arange(w)[None].repeat(h, 0).reshape(-1)
            ky = jnp.arange(hk)[:, None].repeat(wk, 1).reshape(-1)
            kx = jnp.arange(wk)[None].repeat(hk, 0).reshape(-1)
            dy = qy[:, None] / self.kv_stride - ky[None, :]   # (n_q, n_k)
            dx = qx[:, None] / self.kv_stride - kx[None, :]
            half = self.pos_dim // 4
            freq = jnp.exp(-jnp.arange(half) * (np.log(100.0) / half))
            emb = jnp.concatenate(
                [jnp.sin(dy[..., None] * freq), jnp.cos(dy[..., None] * freq),
                 jnp.sin(dx[..., None] * freq), jnp.cos(dx[..., None] * freq)],
                axis=-1)                                     # (n_q,n_k,P)
            if use[1]:
                pos_k = nn.Dense(heads * dh, use_bias=False,
                                 name="pos_proj")(emb).reshape(
                    n_q, n_k, heads, dh)
                energy = energy + jnp.einsum(
                    "bqhd,qkhd->bhqk", q, pos_k) * scale
            if use[3]:
                pos_bias = nn.Dense(heads, use_bias=False,
                                    name="pos_bias_proj")(emb)  # (q,k,h)
                energy = energy + pos_bias.transpose(2, 0, 1)[None]

        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w,
                                                             heads * dh)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      name="proj_conv")(out)
        return x + out.astype(x.dtype)
