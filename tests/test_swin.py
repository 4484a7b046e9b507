"""Swin backbone: relative-position index golden, shift-mask golden,
stage shapes (incl. non-window-multiple sizes), window partition
round-trip, gradient flow, and MaskRCNN-with-Swin integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.models.swin import (
    SwinTransformer,
    _rel_position_index,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
    swin_t,
)


def test_rel_position_index_golden():
    """Against the reference construction (swin.py:58-67) for ws=3."""
    import torch

    ws = 3
    coords_h = torch.arange(ws)
    coords_w = torch.arange(ws)
    coords = torch.stack(torch.meshgrid([coords_h, coords_w]))
    coords_flatten = torch.flatten(coords, 1)
    rel = coords_flatten[:, :, None] - coords_flatten[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    want = rel.sum(-1).numpy()
    np.testing.assert_array_equal(_rel_position_index(ws), want)


def test_shift_mask_golden():
    """Against the reference SW-MSA mask loop (swin.py:197-218)."""
    import torch

    ws, shift, hp, wp = 4, 2, 8, 8
    img_mask = torch.zeros((1, hp, wp, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, hp // ws, ws, wp // ws, ws, 1) \
        .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0) \
        .masked_fill(attn_mask == 0, 0.0)
    got = _shift_attn_mask(hp, wp, ws, shift)
    np.testing.assert_allclose(got, attn_mask.numpy().transpose(0, 2, 1),
                               atol=0)
    # symmetric in its zero pattern either way
    np.testing.assert_allclose(got, attn_mask.numpy(), atol=0)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    win = _window_partition(x, 4)
    assert win.shape == (2 * 2 * 3, 16, 5)
    back = _window_reverse(win, 8, 12, 4, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_t_stage_shapes():
    """Non-window-multiple feature sizes (stride-4 map of a 224x160
    canvas is 56x40; 40 % 7 != 0) must pad internally and emit exact
    stage shapes."""
    m = swin_t(drop_path_rate=0.0)
    x = jnp.zeros((1, 224, 160, 3))
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.PRNGKey(0), x,
                                              False)
    feats = m.apply(vs, x, False)
    assert [f.shape[1:3] for f in feats] == [(56, 40), (28, 20),
                                             (14, 10), (7, 5)]
    assert [f.shape[-1] for f in feats] == [96, 192, 384, 768]


def test_swin_gradients_flow():
    m = SwinTransformer(embed_dims=32, depths=(1, 1), num_heads=(2, 4),
                        window_size=4, drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 64, 64, 3).astype(np.float32))
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.PRNGKey(0), x,
                                              False)

    def f(p):
        feats = m.apply({"params": p}, x, False)
        return sum(jnp.abs(f).sum() for f in feats)

    g = jax.grad(f)(vs["params"])
    gnorm = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
    assert "relative_position_bias_table" in str(
        jax.tree_util.tree_structure(g))


def test_swin_drop_path_needs_rng_only_in_train():
    m = SwinTransformer(embed_dims=32, depths=(1,), num_heads=(2,),
                        window_size=4, drop_path_rate=0.5)
    x = jnp.zeros((2, 32, 32, 3))
    vs = jax.jit(m.init, static_argnums=(2,))(jax.random.PRNGKey(0), x,
                                              False)
    # eval: deterministic, no rng needed
    m.apply(vs, x, False)
    # train: stochastic depth draws from the dropout stream
    out = m.apply(vs, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(jnp.abs(out[0]).sum()))


@pytest.mark.slow
def test_maskrcnn_swin_forward():
    """MaskRCNN with the Swin-T trunk (configs/swin/mask_rcnn_swin-t):
    init + one simple_test pass."""
    from iif_tpu.detection.detector import (
        DetTestCfg,
        MaskRCNN,
        maskrcnn_simple_test,
    )
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    model = MaskRCNN(num_classes=4, backbone_type="swin-t",
                     with_mask=False, frozen_stages=-1)
    x = jnp.zeros((1, 128, 128, 3))
    vs = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    assert "patch_embed" in vs["params"]["backbone"]
    out = maskrcnn_simple_test(
        model, vs, x, DetCrossEntropyLoss(num_classes=4),
        DetTestCfg(rpn_nms_pre=200, max_per_img=10))
    assert out["boxes"].shape == (1, 10, 4)
