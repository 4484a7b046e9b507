"""Single-stage mmdet checkpoint ingestion parity: a RetinaNet-format
``state_dict`` converted through ``convert_mmdet_single_stage`` must
reproduce the torch oracle chain (backbone -> FPN(start_level=1,
P6/P7 on C5) -> shared retina towers) level-for-level."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from iif_tpu.detection.pretrained_det import convert_mmdet_single_stage
from iif_tpu.detection.single_stage import RetinaNet
from iif_tpu.models.pretrained import merge_pretrained

from tests.oracles.detector_oracle import (
    fpn_forward_retina,
    resnet18_features,
    retina_head_forward,
)
from tests.test_pretrained_det import _mmdet_state_dict

NC = 7
IMG_H, IMG_W = 128, 160


def _retina_state_dict(rng, nc=NC):
    """Synthetic mmdet RetinaNet R18 state dict: reuse the MaskRCNN
    builder's backbone, replace neck/heads with retina naming."""
    base = _mmdet_state_dict(rng)
    sd = {k: v for k, v in base.items() if k.startswith("backbone.")}

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    widths = [64, 128, 256, 512]
    for i, cin in enumerate(widths[1:]):       # start_level=1: C3..C5
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(256, cin, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(256)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    # P6/P7 extras live at fpn_convs.3/4 in mmdet
    sd["neck.fpn_convs.3.conv.weight"] = t(256, 512, 3, 3)
    sd["neck.fpn_convs.3.conv.bias"] = t(256)
    sd["neck.fpn_convs.4.conv.weight"] = t(256, 256, 3, 3)
    sd["neck.fpn_convs.4.conv.bias"] = t(256)
    for i in range(4):
        for tower in ("cls_convs", "reg_convs"):
            sd[f"bbox_head.{tower}.{i}.conv.weight"] = t(256, 256, 3, 3)
            sd[f"bbox_head.{tower}.{i}.conv.bias"] = t(256)
    sd["bbox_head.retina_cls.weight"] = t(9 * nc, 256, 3, 3)
    sd["bbox_head.retina_cls.bias"] = t(9 * nc)
    sd["bbox_head.retina_reg.weight"] = t(36, 256, 3, 3)
    sd["bbox_head.retina_reg.bias"] = t(36)
    return sd


@pytest.fixture(scope="module")
def chain():
    rng = np.random.RandomState(3)
    sd = _retina_state_dict(rng)
    img = rng.randn(1, IMG_H, IMG_W, 3).astype(np.float32)

    params, stats = convert_mmdet_single_stage(sd, num_classes=NC)
    model = RetinaNet(num_classes=NC, depth=18, frozen_stages=-1,
                      norm_eval=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    merged = merge_pretrained(variables, params, stats)

    feats = resnet18_features(torch.tensor(img.transpose(0, 3, 1, 2)), sd)
    fpn_ref = fpn_forward_retina(feats, sd)
    cls_ref, reg_ref = retina_head_forward(fpn_ref, sd)
    return img, model, merged, fpn_ref, cls_ref, reg_ref


def test_fpn_parity(chain):
    img, model, merged, fpn_ref, _, _ = chain
    feats = jax.jit(
        lambda v, x: model.apply(v, x, train=False,
                                 method=model.extract_feat))(
        merged, jnp.asarray(img))
    assert len(feats) == 5
    for lvl, (ours, ref) in enumerate(zip(feats, fpn_ref)):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(),
            atol=2e-4, err_msg=f"P{lvl + 3}")


def test_head_parity(chain):
    img, model, merged, _, cls_ref, reg_ref = chain
    cls_scores, bbox_preds = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(
        merged, jnp.asarray(img))
    for lvl in range(5):
        # our head emits NHWC with A*C channels
        np.testing.assert_allclose(
            np.asarray(cls_scores[lvl]).transpose(0, 3, 1, 2),
            cls_ref[lvl].numpy(), atol=2e-4, err_msg=f"cls P{lvl + 3}")
        np.testing.assert_allclose(
            np.asarray(bbox_preds[lvl]).transpose(0, 3, 1, 2),
            reg_ref[lvl].numpy(), atol=2e-4, err_msg=f"reg P{lvl + 3}")


def test_mismatched_classes_drop_predictors(chain):
    rng = np.random.RandomState(4)
    sd = _retina_state_dict(rng, nc=NC)
    params, _ = convert_mmdet_single_stage(sd, num_classes=NC + 3)
    assert "retina_cls" not in params.get("bbox_head", {})
    assert "cls_conv_0" in params["bbox_head"]


def test_dispatch_by_keys(tmp_path):
    from iif_tpu.detection.pretrained_det import load_mmdet_checkpoint

    rng = np.random.RandomState(5)
    sd = _retina_state_dict(rng)
    path = tmp_path / "retina.pth"
    torch.save({"state_dict": sd}, path)
    params, stats = load_mmdet_checkpoint(str(path), num_classes=NC)
    assert "retina_cls" in params["bbox_head"]
    assert "backbone" in stats


def test_fcos_gn_scales_overlay():
    """FCOS naming (gn towers + per-level scales) converts onto the flax
    FCOS tree with matching shapes."""
    from iif_tpu.detection.single_stage import FCOS

    rng = np.random.RandomState(6)
    base = _mmdet_state_dict(rng)
    sd = {k: v for k, v in base.items() if k.startswith("backbone.")}

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    widths = [64, 128, 256, 512]
    for i, cin in enumerate(widths[1:]):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(256, cin, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(256)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    for i in (3, 4):     # on_output extras
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    for i in range(4):
        for tower in ("cls_convs", "reg_convs"):
            sd[f"bbox_head.{tower}.{i}.conv.weight"] = t(256, 256, 3, 3)
            sd[f"bbox_head.{tower}.{i}.conv.bias"] = t(256)
            sd[f"bbox_head.{tower}.{i}.gn.weight"] = t(256)
            sd[f"bbox_head.{tower}.{i}.gn.bias"] = t(256)
    sd["bbox_head.conv_cls.weight"] = t(NC, 256, 3, 3)
    sd["bbox_head.conv_cls.bias"] = t(NC)
    sd["bbox_head.conv_reg.weight"] = t(4, 256, 3, 3)
    sd["bbox_head.conv_reg.bias"] = t(4)
    sd["bbox_head.conv_centerness.weight"] = t(1, 256, 3, 3)
    sd["bbox_head.conv_centerness.bias"] = t(1)
    for i in range(5):
        sd[f"bbox_head.scales.{i}.scale"] = torch.tensor(1.5)

    params, stats = convert_mmdet_single_stage(sd, num_classes=NC)
    model = FCOS(num_classes=NC, depth=18, frozen_stages=-1,
                 norm_eval=False)
    ref_shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False), jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 3), np.float32))
    flat_ref = jax.tree_util.tree_flatten_with_path(
        {"params": ref_shapes["params"],
         "batch_stats": ref_shapes["batch_stats"]})[0]
    ref_by_path = {tuple(str(getattr(k, "key", k)) for k in p): v.shape
                   for p, v in flat_ref}
    flat_new = jax.tree_util.tree_flatten_with_path(
        {"params": params, "batch_stats": stats})[0]
    for p, v in flat_new:
        path = tuple(str(getattr(k, "key", k)) for k in p)
        assert path in ref_by_path, path
        assert ref_by_path[path] == np.shape(v), path
    assert float(params["bbox_head"]["scale_2"]) == 1.5
    assert "cls_gn_1" in params["bbox_head"]
