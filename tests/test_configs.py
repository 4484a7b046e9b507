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
    from iif_tpu.detection.detector import MaskRCNN, model_kwargs_from_cfg

    mcfg = dict(cfg.model)
    mtype = mcfg.get("type", "MaskRCNN")
    mcfg.pop("pretrained_backbone", None)
    kw = model_kwargs_from_cfg(mcfg)
    if mtype == "CascadeMaskRCNN":
        from iif_tpu.detection.cascade import CascadeMaskRCNN

        model = CascadeMaskRCNN(**kw)
    else:
        assert mtype == "MaskRCNN", mtype
        model = MaskRCNN(**kw)
    assert model.num_classes == cfg.model["num_classes"]

    # loss cfg is well-formed
    lc = cfg.loss_cls
    assert lc["type"] in ("DetIIFLoss", "DetCrossEntropyLoss")
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
