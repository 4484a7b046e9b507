"""Every shipped config builds (the reference's test_config.py idea:
`tests/test_runtime/test_config.py` asserts every config in configs/
constructs a model)."""
import glob
import os

import pytest

from iif_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                         recursive=True)
    if "_base_" not in p)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)[:-3]
                                               for p in CONFIGS])
def test_config_builds_model(path):
    cfg = Config.fromfile(path)
    from iif_tpu.detection import build_detector

    mcfg = dict(cfg.model)
    mcfg.pop("pretrained_backbone", None)
    model, train_cfg_cls, test_cfg_cls = build_detector(mcfg)
    assert model.num_classes == cfg.model["num_classes"]
    # the config's train/test knobs construct the right cfg tuples
    tc = dict(cfg.get("train_cfg", {}))
    from iif_tpu.detection.detector import DetTrainCfg

    if train_cfg_cls is DetTrainCfg:
        tc.setdefault("mask_gt_stride", 1)
    train_cfg_cls(**tc)
    test_cfg_cls(**cfg.get("test_cfg", {}))

    # loss cfg is well-formed
    lc = cfg.loss_cls
    assert lc["type"] in ("DetIIFLoss", "DetCrossEntropyLoss",
                          "FocalLossDet", "SeesawLoss")
    if lc["type"] == "DetIIFLoss" and lc.get("path") is None:
        from iif_tpu.detection.losses import compute_det_iif_from_counts
        import numpy as np

        counts = np.arange(1, model.num_classes + 1)
        w = compute_det_iif_from_counts(counts, 2 * counts.sum(),
                                        lc.get("variant", "raw"))
        assert len(w) == model.num_classes + 1

    # schedule/runner keys the trainer consumes
    assert cfg.runner["max_epochs"] > 0
    assert cfg.optimizer["lr"] > 0
    if cfg.get("fasa_cfg"):
        assert set(cfg.fasa_cfg) >= {"decay_ratio", "loss_aug_weight"}


def test_fasa_family_covers_reference():
    """The reference ships 12 configs/fasa/*.py; assert our family mirrors
    each one (name-mapped: 4x4 dropped, 4x4_2x -> 2x)."""
    ours = {os.path.basename(p) for p in CONFIGS}
    expected = {
        "fasa_r50_2x.py", "fasa_r50_cos_norm_2x.py", "fasa_r50_rfs_2x.py",
        "fasa_r50_rfs_cos_norm_2x.py", "fasa_iif_r50_2x.py",
        "fasa_iif_r50_cos_norm_2x.py", "fasa_iif_r50_rfs_cos_norm_2x.py",
        "fasa_iif_r101_rfs_cos_norm_2x.py",
        "fasa_iif_cascade_r101_rfs_cos_norm_2x.py",
        "fasa_iof_base10_r50_rfs_cos_norm_2x.py",
        "fasa_iof_base10_r50_rfs_cos_norm_1x_rsb.py",
        "fasa_iif_r50_rfs_cos_norm_2x_lvisv05.py",
    }
    assert expected <= ours


def test_cos_norm_temperatures():
    """Reference: NormedLinear temp is 20 for plain-FASA cos_norm configs
    but 8 for the IIF ones (fasa_r50_cos_norm vs fasa_iif_r50_cos_norm)."""
    base = os.path.join(REPO, "configs", "fasa")
    plain = Config.fromfile(os.path.join(base, "fasa_r50_cos_norm_2x.py"))
    iif = Config.fromfile(os.path.join(base, "fasa_iif_r50_cos_norm_2x.py"))
    assert plain.model["cls_temperature"] == 20.0
    assert iif.model["cls_temperature"] == 8.0
    assert plain.loss_cls["type"] == "DetCrossEntropyLoss"
    assert iif.loss_cls["type"] == "DetIIFLoss"


def test_rsb_config_optimizer():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs", "fasa", "fasa_iof_base10_r50_rfs_cos_norm_1x_rsb.py"))
    assert cfg.optimizer["type"] == "adamw"
    assert cfg.optimizer["paramwise_cfg"]["norm_decay_mult"] == 0.0
    assert cfg.runner["max_epochs"] == 12
    assert cfg.model["pretrained_backbone"]


def test_adamw_builder():
    """AdamW with a norm-decay mask runs one update and decays kernels but
    not BN scales."""
    import jax.numpy as jnp
    import numpy as np

    from iif_tpu.engine.schedules import build_optimizer, norm_decay_mask

    params = {"conv": {"kernel": jnp.ones((3,))},
              "bn": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))}}
    tx = build_optimizer("adamw", lambda _: 0.1, weight_decay=0.5,
                         decay_mask=norm_decay_mask)
    st = tx.init(params)
    grads = {"conv": {"kernel": jnp.zeros((3,))},
             "bn": {"scale": jnp.zeros((3,)), "bias": jnp.zeros((3,))}}
    upd, _ = tx.update(grads, st, params)
    assert np.all(np.asarray(upd["conv"]["kernel"]) < 0)   # decayed
    assert np.allclose(np.asarray(upd["bn"]["scale"]), 0)  # not decayed
    assert np.allclose(np.asarray(upd["bn"]["bias"]), 0)


def test_adamw_frozen_params_get_no_decay():
    """AdamW + trainable_mask: frozen leaves must receive NO update at all —
    in particular the decoupled weight decay must not make them drift
    (round-2 advisor finding: set_to_zero ran before add_decayed_weights)."""
    import jax.numpy as jnp
    import numpy as np

    from iif_tpu.engine.schedules import build_optimizer

    params = {"frozen": {"kernel": jnp.ones((3,))},
              "head": {"kernel": jnp.ones((3,))}}
    mask = {"frozen": {"kernel": False}, "head": {"kernel": True}}
    tx = build_optimizer("adamw", lambda _: 0.1, weight_decay=0.5,
                         trainable_mask=mask)
    st = tx.init(params)
    grads = {"frozen": {"kernel": jnp.ones((3,))},
             "head": {"kernel": jnp.zeros((3,))}}
    upd, _ = tx.update(grads, st, params)
    assert np.allclose(np.asarray(upd["frozen"]["kernel"]), 0)  # fully frozen
    assert np.all(np.asarray(upd["head"]["kernel"]) < 0)        # decays


def test_fasa_train_fallback_warns():
    """The no-val FASA fallback must warn loudly that the adaptive signal
    flips from val loss to train loss (VERDICT r2 item 7)."""
    import pytest

    from iif_tpu.cli.train_det import fasa_train_fallback

    with pytest.warns(UserWarning, match="train loss instead of val loss"):
        capped = fasa_train_fallback([1, 2, 3], n_batches=2)
    assert list(capped) == [1, 2]


def test_fast_nms_wired_into_get_bboxes():
    """DetTestCfg(nms_kind='fast') routes bbox decoding through fast_nms
    (round-2 advisor: fast_nms must not be dead code)."""
    import jax.numpy as jnp
    import numpy as np

    from iif_tpu.detection.bbox_head import bbox_head_get_bboxes
    from iif_tpu.detection.detector import DetTestCfg

    assert DetTestCfg().nms_kind == "nms"
    num_classes = 3
    rois = jnp.asarray([[10., 10., 30., 30.], [50., 50., 80., 90.]])
    cls_score = jnp.asarray([[4.0, 0.0, 0.0, 0.0],
                             [0.0, 5.0, 0.0, 0.0]])
    bbox_pred = jnp.zeros((2, 4 * num_classes))
    dets, scores, labels, valid = bbox_head_get_bboxes(
        rois, cls_score, bbox_pred, (100, 100), loss_cls=None,
        scale_factor=None, score_thr=0.05, nms_iou=0.5, max_per_img=5,
        num_classes=num_classes, nms_kind="fast")
    got = int(np.asarray(valid).sum())
    assert got == 2
    kept = np.asarray(labels)[np.asarray(valid)]
    assert set(kept.tolist()) == {0, 1}
