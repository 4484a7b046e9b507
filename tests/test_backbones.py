"""Res2Net and RegNet backbones: width-schedule goldens, stage shapes,
gradient flow, and MaskRCNN integration via ``backbone_type``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.models.regnet import REGNET_ARCH, RegNet, regnet_stage_params
from iif_tpu.models.res2net import Bottle2neck, Res2Net


# ----------------------------------------------------------------- regnet
def test_regnet_width_schedule_golden():
    """The reference docstring example (regnet.py:53-69): regnetx_3.2gf
    -> stage widths [96, 192, 432, 1008], depth 25."""
    widths, blocks, groups = regnet_stage_params(
        REGNET_ARCH["regnetx_3.2gf"])
    assert widths == [96, 192, 432, 1008]
    assert sum(blocks) == 25
    assert all(w % g == 0 for w, g in zip(widths, groups))


def test_regnet_400mf_schedule():
    widths, blocks, groups = regnet_stage_params(
        REGNET_ARCH["regnetx_400mf"])
    assert len(widths) == 4 and sum(blocks) == 22
    assert all(w % 8 == 0 for w in widths)


def test_regnet_feature_shapes():
    m = RegNet(arch="regnetx_400mf")
    x = jnp.zeros((1, 64, 64, 3))
    vs = jax.jit(m.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), x, False, True)
    feats = m.apply(vs, x, False, True)
    widths, _, _ = regnet_stage_params(REGNET_ARCH["regnetx_400mf"])
    assert [f.shape[-1] for f in feats] == widths
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]


# ---------------------------------------------------------------- res2net
def test_bottle2neck_channel_math():
    """scales=4, base_width=26, planes=64 -> width 26, conv1 out 104,
    conv3 out 256; hierarchical splits preserve channel count."""
    m = Bottle2neck(planes=64, downsample=True)
    x = jnp.zeros((1, 16, 16, 64))
    vs = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(vs, x, False)
    assert out.shape == (1, 16, 16, 256)
    assert vs["params"]["conv1"]["kernel"].shape[-1] == 104
    # 3 hierarchical 3x3 convs (scales - 1)
    assert "conv2_2" in vs["params"] and "conv2_3" not in vs["params"]


def test_res2net_feature_shapes_and_grads():
    m = Res2Net(layers=(1, 1, 1, 1))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 64, 64, 3).astype(np.float32))
    vs = jax.jit(m.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), x, False, True)
    feats = m.apply(vs, x, False, True)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]

    def f(p):
        fs = m.apply({"params": p, "batch_stats": vs["batch_stats"]},
                     x, False, True)
        return sum(jnp.abs(t).sum() for t in fs)

    g = jax.grad(f)(vs["params"])
    gnorm = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_res2net_stage_first_block_strides():
    """The stage-type first block average-pools its last split: output
    spatial dims halve without losing channels."""
    m = Bottle2neck(planes=64, stride=2, downsample=True,
                    stage_type="stage")
    x = jnp.zeros((1, 16, 16, 128))
    vs = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(vs, x, False)
    assert out.shape == (1, 8, 8, 256)


# ------------------------------------------------------------- integration
@pytest.mark.slow
def test_maskrcnn_res2net_and_regnet_forward():
    from iif_tpu.detection.detector import (
        DetTestCfg,
        MaskRCNN,
        maskrcnn_simple_test,
    )
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    for bt, depth in (("res2net", 50), ("regnetx_400mf", 50)):
        model = MaskRCNN(num_classes=4, backbone_type=bt, depth=depth,
                         with_mask=False, frozen_stages=-1)
        x = jnp.zeros((1, 128, 128, 3))
        vs = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), x, False)
        out = maskrcnn_simple_test(
            model, vs, x, DetCrossEntropyLoss(num_classes=4),
            DetTestCfg(rpn_nms_pre=100, rpn_max_per_img=100,
                       max_per_img=10))
        assert out["boxes"].shape == (1, 10, 4)
