"""Detection stack: FPN, RPN, targets, MaskRCNN forward/loss/test —
config-driven smoke tests in the style of the reference's
``tests/test_models/test_forward.py`` `_demo_mm_inputs` (random images +
random padded gt boxes/labels/masks), plus the empty-GT edge case."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection import (
    FPN,
    DetIIFLoss,
    MaskRCNN,
    RPNHead,
    Shared2FCBBoxHead,
    SingleRoIExtractor,
)
from iif_tpu.detection.bbox_head import bbox_targets
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    fpn_shapes,
    make_anchor_generator,
    maskrcnn_loss,
    maskrcnn_simple_test,
)
from iif_tpu.detection.losses import compute_det_iif_from_counts, load_iif_csv
from iif_tpu.detection.mask_head import mask_targets, paste_masks
from iif_tpu.detection.roi_extractor import map_roi_levels

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8


def _demo_inputs(b=2, seed=0, with_gt=True):
    """Synthetic detection batch (padded gt, validity masks)."""
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    gt_masks = np.zeros((b, MAX_GT, H, W), np.uint8)
    if with_gt:
        for i in range(b):
            n = rng.randint(1, 5)
            for j in range(n):
                x1, y1 = rng.randint(0, W - 40), rng.randint(0, H - 40)
                w, h = rng.randint(16, 40), rng.randint(16, 40)
                gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
                gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
                gt_valid[i, j] = True
                gt_masks[i, j, y1:y1 + h, x1:x1 + w] = 1
    return {
        "image": jnp.asarray(images),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(gt_masks),
    }


@pytest.fixture(scope="module")
def small_cfg():
    return DetTrainCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                       rcnn_num_samples=32, num_mask_rois=8)


@pytest.fixture(scope="module")
def model_and_vars():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_fpn_output_shapes():
    fpn = FPN(out_channels=32, num_outs=5)
    ins = [jnp.zeros((1, 32 // s, 32 // s, c))
           for s, c in zip((1, 2, 4, 8), (64, 128, 256, 512))]
    variables = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(variables, ins)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 32 for o in outs)


def test_map_roi_levels():
    rois = jnp.asarray([
        [0, 0, 0, 28, 28],      # scale 28 -> level 0
        [0, 0, 0, 112, 112],    # scale 112 -> level 1
        [0, 0, 0, 224, 224],    # scale 224 -> level 2
        [0, 0, 0, 448, 448],    # scale 448 -> level 3
        [0, 0, 0, 1000, 1000],  # clipped to 3
    ], jnp.float32)
    lv = np.asarray(map_roi_levels(rois, 4))
    assert lv.tolist() == [0, 1, 2, 3, 3]


def test_roi_extractor_selects_by_level():
    feats = [jnp.full((1, 32 // (2 ** i), 32 // (2 ** i), 4), float(i))
             for i in range(4)]
    ex = SingleRoIExtractor((7, 7), featmap_strides=(4, 8, 16, 32))
    small = jnp.asarray([[0, 0, 0, 20, 20]], jnp.float32)   # -> level 0
    out = ex(feats, small)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    big = jnp.asarray([[0, 0, 0, 500, 500]], jnp.float32)   # -> level 3
    out = ex(feats, big)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_det_iif_csv_convention(tmp_path):
    import pandas as pd

    df = pd.DataFrame({"raw": [1.0, 2.0, 3.0, 4.0],
                       "smooth": [1.0, 5.0, 6.0, 7.0]})
    p = tmp_path / "idf.csv"
    df.to_csv(p, index=False)
    w = load_iif_csv(str(p), "raw")
    # row 0 dropped, bg 1.0 appended
    np.testing.assert_allclose(w, [2.0, 3.0, 4.0, 1.0])


def test_det_iif_activation_and_loss():
    w = jnp.asarray([2.0, 0.5, 1.0])
    loss = DetIIFLoss(weights=w)
    score = jnp.asarray([[1.0, 2.0, 0.0]])
    act = np.asarray(loss.get_activation(score))
    expect = np.exp([2.0, 1.0, 0.0]) / np.exp([2.0, 1.0, 0.0]).sum()
    np.testing.assert_allclose(act[0], expect, rtol=1e-5)
    l = float(loss(score, jnp.asarray([0])))
    assert l == pytest.approx(-np.log(expect[0]), rel=1e-5)


def test_compute_det_iif_from_counts():
    w = compute_det_iif_from_counts([100, 10, 1], 1000, "raw")
    assert w.shape == (4,)
    assert w[-1] == 1.0
    assert w[2] > w[1] > w[0]  # rarer class -> bigger weight
    # exact semantics: w_c = log(N_images / n_c), NOT log(sum(n_c)/n_c)
    np.testing.assert_allclose(
        w[:3], np.log([1000 / 100, 1000 / 10, 1000 / 1]), rtol=1e-6)


# Golden rows transcribed from the reference's precomputed weight table
# /root/reference/instance_segmentation/lvis_files/idf_1204.csv (rows 1-3,
# i.e. the first three real classes after the background placeholder).
# N_images = 100170 (LVIS v1 train corpus), N_instances = 1270141.
_IDF_GOLD_IMG_COUNTS = [64, 364, 1911]
_IDF_GOLD_INST_COUNTS = [109, 1081, 3720]
_IDF_GOLD = {
    "raw": [7.355740938246138, 5.6174701539690695, 3.959242077365537],
    "smooth": [8.340246734689194, 6.614736651002339, 4.958728910973484],
    "prob": [7.3551018202072465, 5.6138297130961465, 3.9399801843493663],
    "normit": [3.2209133650223976, 2.6843248606923056, 2.0731842427328675],
    "gombit": [7.355421396246417, 5.6156504857329494, 3.949626589998093],
    "base2": [10.612090973671634, 8.104296333472938, 5.711978910694177],
    "base10": [3.194557699790146, 2.439636290124977, 1.7194769867190203],
    "raw_obj": [9.363290593665011, 7.068996658254947, 5.833159528626963],
}


@pytest.mark.parametrize("variant", sorted(_IDF_GOLD))
def test_det_iif_weights_match_reference_csv(variant):
    counts = (_IDF_GOLD_INST_COUNTS if variant.endswith("_obj")
              else _IDF_GOLD_IMG_COUNTS)
    total = 1270141 if variant.endswith("_obj") else 100170
    w = compute_det_iif_from_counts(counts, total, variant)
    np.testing.assert_allclose(w[:3], _IDF_GOLD[variant], rtol=1e-6)
    assert w[-1] == 1.0


def test_det_iif_weights_full_reference_csv():
    """When the reference checkout is present, verify EVERY row of every
    variant column of idf_1204.csv against our derivation."""
    import os

    path = "/root/reference/instance_segmentation/lvis_files/idf_1204.csv"
    if not os.path.exists(path):
        pytest.skip("reference CSV not available")
    import pandas as pd

    df = pd.read_csv(path)
    img = df["img_freq"].to_numpy()[1:]
    inst = df["instance_freq"].to_numpy()[1:]
    for variant in ("raw", "smooth", "prob", "normit", "gombit", "base2",
                    "base10"):
        w = compute_det_iif_from_counts(img, 100170, variant)
        np.testing.assert_allclose(w[:-1], df[variant].to_numpy()[1:],
                                   rtol=1e-6, err_msg=variant)
        wo = compute_det_iif_from_counts(inst, int(inst.sum()),
                                         variant + "_obj")
        np.testing.assert_allclose(
            wo[:-1], df[variant + "_obj"].to_numpy()[1:], rtol=1e-6,
            err_msg=variant + "_obj")


def test_bbox_targets_labels():
    key = jax.random.PRNGKey(0)
    props = jnp.asarray([[[10, 10, 50, 50], [60, 60, 100, 100],
                          [0, 0, 5, 5]]], jnp.float32)
    pvalid = jnp.ones((1, 3), bool)
    gtb = jnp.asarray([[[10, 10, 50, 50]]], jnp.float32)
    gtl = jnp.asarray([[3]])
    gtv = jnp.ones((1, 1), bool)
    t = bbox_targets(key, props, pvalid, gtb, gtl, gtv, NUM_CLASSES,
                     num_samples=8, pos_fraction=0.5)
    labels = np.asarray(t.labels[0])
    pos = np.asarray(t.bbox_weights[0]) > 0
    assert (labels[pos] == 3).all()
    assert (labels[~pos] == NUM_CLASSES).all()  # background index


def test_maskrcnn_loss_positive_finite(model_and_vars, small_cfg):
    model, variables = model_and_vars
    batch = _demo_inputs()
    loss_cls = DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls, small_cfg)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
        assert float(v) >= 0, (k, float(v))
    assert float(losses["loss_cls"]) > 0
    assert float(losses["loss_mask"]) > 0
    assert aux["batch_stats"]  # batch stats mutated


def test_maskrcnn_loss_packed_masks_equals_dense(model_and_vars, small_cfg):
    """Bit-packed gt masks (the round-3 default loader feed) must give the
    IDENTICAL loss as the dense path — unpack happens on device."""
    model, variables = model_and_vars
    batch = _demo_inputs()
    loss_cls = DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))
    total_d, losses_d, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls, small_cfg)
    packed = dict(batch)
    packed["gt_masks_packed"] = jnp.asarray(
        np.packbits(np.asarray(batch["gt_masks"]), axis=-1))
    del packed["gt_masks"]
    total_p, losses_p, _ = maskrcnn_loss(
        model, variables, packed, jax.random.PRNGKey(0), loss_cls,
        small_cfg)
    assert float(total_d) == float(total_p)
    for k in losses_d:
        assert float(losses_d[k]) == float(losses_p[k]), k


def test_uint8_input_normalize_parity(model_and_vars):
    """uint8 images through extract_feat == host-normalized float input."""
    from iif_tpu.detection.detector import IMG_MEAN, IMG_STD

    model, variables = model_and_vars
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (1, H, W, 3), np.uint8)
    f32 = (u8.astype(np.float32) - np.asarray(IMG_MEAN, np.float32)) \
        / np.asarray(IMG_STD, np.float32)
    fu = model.apply(variables, jnp.asarray(u8), False,
                     method=MaskRCNN.extract_feat)
    ff = model.apply(variables, jnp.asarray(f32), False,
                     method=MaskRCNN.extract_feat)
    for a, b in zip(fu, ff):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_maskrcnn_loss_empty_gt(model_and_vars, small_cfg):
    """Empty-GT edge case (reference test_forward.py:86-103)."""
    model, variables = model_and_vars
    batch = _demo_inputs(with_gt=False)
    loss_cls = DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls, small_cfg)
    assert np.isfinite(float(total))


def test_maskrcnn_grads_flow(model_and_vars, small_cfg):
    model, variables = model_and_vars
    batch = _demo_inputs()
    loss_cls = DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))

    def f(params):
        total, _, _ = maskrcnn_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0), loss_cls, small_cfg)
        return total

    grads = jax.grad(f)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_maskrcnn_simple_test_shapes(model_and_vars):
    model, variables = model_and_vars
    cfg = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=10,
                     score_thr=0.0)
    out = maskrcnn_simple_test(
        model, variables, jnp.zeros((2, H, W, 3)),
        DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1)), cfg)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["scores"].shape == (2, 10)
    assert out["labels"].shape == (2, 10)
    assert out["masks"].shape == (2, 10, 28, 28)


def test_mask_targets_crop():
    gt_masks = np.zeros((1, 2, 64, 64), np.uint8)
    gt_masks[0, 0, 10:30, 10:30] = 1
    rois = jnp.asarray([[0, 10, 10, 30, 30]], jnp.float32)
    tgt = mask_targets(rois, jnp.asarray([0]), jnp.asarray(gt_masks), 28)
    assert tgt.shape == (1, 28, 28)
    assert np.asarray(tgt).mean() > 0.8  # roi covers the mask -> mostly 1


def test_paste_masks_roundtrip():
    m = jnp.ones((1, 28, 28))
    boxes = jnp.asarray([[16, 16, 48, 48]], jnp.float32)
    out = np.asarray(paste_masks(m, boxes, (64, 64)))
    assert out.shape == (1, 64, 64)
    assert out[0, 32, 32]          # inside the box
    assert not out[0, 0, 0]        # outside
    area = out[0].sum()
    assert 30 * 30 < area < 34 * 34


@pytest.mark.parametrize("predictor", ["conv", "normed"])
def test_mask_logits_for_labels_matches_full(predictor):
    from iif_tpu.detection.mask_head import FCNMaskHead

    head = FCNMaskHead(num_classes=5, num_convs=1, conv_out_channels=8,
                       predictor=predictor)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 14, 14, 8),
                    jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    labels = jnp.asarray([0, 2, 4])
    full = head.apply(variables, x)
    fast = head.apply(variables, x, labels,
                      method=FCNMaskHead.logits_for_labels)
    want = np.take_along_axis(
        np.asarray(full), np.asarray(labels)[:, None, None, None],
        axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(fast), want, atol=2e-5)


def test_iif_normed_predictor_head():
    from iif_tpu.detection.bbox_head import Shared2FCBBoxHead

    iif_w = tuple(float(x) for x in np.linspace(1.0, 3.0, NUM_CLASSES + 1))
    head = Shared2FCBBoxHead(NUM_CLASSES, cls_predictor="iif_normed",
                             iif_weights=iif_w)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 7, 16), jnp.float32)
    v = head.init(jax.random.PRNGKey(0), x)
    cls_score, bbox_pred, emb = head.apply(v, x)
    assert cls_score.shape == (2, NUM_CLASSES + 1)
    # cosine head with temperature 8: |scores| <= 8
    assert np.abs(np.asarray(cls_score)).max() <= 8.0 + 1e-4


def test_mask_targets_strided_matches_fullres():
    """GT masks at 1/2 canvas resolution produce (near-)identical 28x28
    targets for box-aligned masks."""
    full = np.zeros((1, 1, 64, 64), np.uint8)
    full[0, 0, 16:48, 8:40] = 1
    strided = full[:, :, ::2, ::2]
    rois = jnp.asarray([[0, 8, 16, 40, 48]], jnp.float32)
    a = mask_targets(rois, jnp.asarray([0]), jnp.asarray(full), 28,
                     gt_stride=1)
    b = mask_targets(rois, jnp.asarray([0]), jnp.asarray(strided), 28,
                     gt_stride=2)
    agree = (np.asarray(a) == np.asarray(b)).mean()
    assert agree > 0.95, agree
