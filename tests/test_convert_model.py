"""Checkpoint-zoo converter parity (``iif_tpu.cli.convert_model`` vs the
reference's ``tools/model_converters/`` semantics).

Channel transforms are differentially tested against the lifted torch
reference code in ``tests/oracles/convert_oracle.py``; the detectron
converter is validated end-to-end by overlaying its output onto a fresh
flax ResNet-50 via the standard ingestion path.
"""
import numpy as np
import pytest
import torch

from iif_tpu.cli.convert_model import (
    convert_detectron_resnet,
    convert_pycls_regnet,
    convert_selfsup,
    main,
    parse_legacy_config,
    reorder_cls_channel,
    truncate_cls_channel,
    truncate_reg_channel,
    upgrade_ssd_state_dict,
    upgrade_state_dict,
)
from tests.oracles import convert_oracle as oracle

RNG = np.random.RandomState(0)


# ------------------------------------------------ channel-transform parity
CASES = [
    (81, (81,)),            # fc_cls bias
    (81, (81, 1024)),       # fc_cls weight
    (81, (81 * 9, 256, 1, 1)),   # conv_cls weight (9 anchors)
    (81, (81 * 9,)),        # conv_cls bias
    (81, (80, 1024)),       # agnostic-ish (not a multiple)
    (81, (324, 1024)),      # fc_reg weight (81*4)
    (81, (324,)),           # fc_reg bias
    (81, (8, 1024)),        # agnostic reg weight
    (81, (81, 256, 1, 1)),  # conv_logits weight
    (21, (21 * 6, 512, 3, 3)),   # SSD-ish cls conv
]


@pytest.mark.parametrize("nc,shape", CASES)
def test_reorder_cls_channel_matches_oracle(nc, shape):
    v = RNG.randn(*shape).astype(np.float32)
    ours = reorder_cls_channel(v, nc)
    ref = oracle.reorder_cls_channel(torch.from_numpy(v), nc).numpy()
    np.testing.assert_array_equal(ours, ref)


# conv_logits-shaped tensors only: the reference applies this transform
# solely to mask conv_logits (out == num_classes) and biases; a 9*81
# conv_cls shape would crash its reshape too.
TRUNC_CLS_CASES = [
    (81, (81,)), (81, (81, 256, 1, 1)), (81, (324,)),
    (81, (80, 1024)), (81, (8, 1024)),
]


@pytest.mark.parametrize("nc,shape", TRUNC_CLS_CASES)
def test_truncate_cls_channel_matches_oracle(nc, shape):
    v = RNG.randn(*shape).astype(np.float32)
    ours = truncate_cls_channel(v, nc)
    ref = oracle.truncate_cls_channel(torch.from_numpy(v), nc).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("nc,shape", CASES)
def test_truncate_reg_channel_matches_oracle(nc, shape):
    v = RNG.randn(*shape).astype(np.float32)
    ours = truncate_reg_channel(v, nc)
    ref = oracle.truncate_reg_channel(torch.from_numpy(v), nc).numpy()
    np.testing.assert_array_equal(ours, ref)


# --------------------------------------------------------------- detectron
def _detectron_r50_blobs():
    """Synthetic caffe2 R50 blob dict with the real shapes."""
    blobs = {"conv1_w": RNG.randn(64, 3, 7, 7).astype(np.float32),
             "res_conv1_bn_s": np.ones(64, np.float32),
             "res_conv1_bn_b": np.zeros(64, np.float32)}
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    blocks = (3, 4, 6, 3)
    in_ch = 64
    for i, (n, (mid, out)) in enumerate(zip(blocks, widths), start=1):
        for j in range(n):
            pre = f"res{i + 1}_{j}"
            if j == 0:
                blobs[f"{pre}_branch1_w"] = RNG.randn(
                    out, in_ch, 1, 1).astype(np.float32)
                blobs[f"{pre}_branch1_bn_s"] = np.ones(out, np.float32)
                blobs[f"{pre}_branch1_bn_b"] = np.zeros(out, np.float32)
            for letter, (ci, co, k) in zip("abc", [
                    (in_ch if j == 0 else out, mid, 1),
                    (mid, mid, 3), (mid, out, 1)]):
                blobs[f"{pre}_branch2{letter}_w"] = RNG.randn(
                    co, ci, k, k).astype(np.float32)
                blobs[f"{pre}_branch2{letter}_bn_s"] = np.ones(
                    co, np.float32)
                blobs[f"{pre}_branch2{letter}_bn_b"] = np.zeros(
                    co, np.float32)
        in_ch = out
    return blobs


def test_detectron_r50_roundtrip_into_flax():
    import jax

    from iif_tpu.models import resnet50
    from iif_tpu.models.pretrained import convert_torch_resnet

    blobs = _detectron_r50_blobs()
    sd = convert_detectron_resnet(blobs, 50)
    # AffineChannel semantics: identity running stats
    assert np.all(sd["layer1.0.bn1.running_mean"] == 0)
    assert np.all(sd["layer1.0.bn1.running_var"] == 1)
    params, batch_stats = convert_torch_resnet(sd, num_classes=10)
    model = resnet50(num_classes=10)
    ref_shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False), jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 3), np.float32))
    # every converted leaf must exist in the flax tree with the same shape
    flat_ref = jax.tree_util.tree_flatten_with_path(
        {"params": ref_shapes["params"],
         "batch_stats": ref_shapes["batch_stats"]})[0]
    ref_by_path = {tuple(str(getattr(k, "key", k)) for k in p): v.shape
                   for p, v in flat_ref}
    flat_new = jax.tree_util.tree_flatten_with_path(
        {"params": params, "batch_stats": batch_stats})[0]
    assert len(flat_new) > 100
    for p, v in flat_new:
        path = tuple(str(getattr(k, "key", k)) for k in p)
        assert path in ref_by_path, path
        assert ref_by_path[path] == v.shape, path


def test_detectron_unsupported_depth():
    with pytest.raises(ValueError):
        convert_detectron_resnet({}, 18)


# ------------------------------------------------------------------ regnet
def test_pycls_regnet_key_mapping():
    sd = {
        "stem.conv.weight": RNG.randn(32, 3, 3, 3).astype(np.float32),
        "stem.bn.weight": np.ones(32, np.float32),
        "s1.b1.proj.weight": RNG.randn(24, 32, 1, 1).astype(np.float32),
        "s1.b1.bn.weight": np.ones(24, np.float32),
        "s1.b1.f.a.weight": RNG.randn(24, 32, 1, 1).astype(np.float32),
        "s1.b1.f.a_bn.running_mean": np.zeros(24, np.float32),
        "s1.b2.f.b.weight": RNG.randn(24, 24, 3, 3).astype(np.float32),
        "s2.b1.f.c_bn.bias": np.zeros(56, np.float32),
        "head.fc.weight": RNG.randn(10, 440).astype(np.float32),
    }
    out = convert_pycls_regnet(sd)
    assert set(out) == {
        "conv1.weight", "bn1.weight",
        "layer1.0.downsample.0.weight", "layer1.0.downsample.1.weight",
        "layer1.0.conv1.weight", "layer1.0.bn1.running_mean",
        "layer1.1.conv2.weight", "layer2.0.bn3.bias", "fc.weight",
    }
    np.testing.assert_array_equal(out["layer1.1.conv2.weight"],
                                  sd["s1.b2.f.b.weight"])


# ----------------------------------------------------------------- selfsup
def test_selfsup_moco_prefix():
    sd = {"module.encoder_q.conv1.weight": np.ones((4,), np.float32),
          "module.encoder_q.fc.0.weight": np.ones((2,), np.float32),
          "module.encoder_k.conv1.weight": np.zeros((4,), np.float32),
          "queue": np.zeros((8,), np.float32)}
    out = convert_selfsup(sd, "moco")
    assert set(out) == {"conv1.weight", "fc.0.weight"}


def test_selfsup_swav_prefix():
    sd = {"module.conv1.weight": np.ones((4,), np.float32),
          "projection_head.weight": np.zeros((2,), np.float32)}
    out = convert_selfsup(sd, "swav")
    assert set(out) == {"conv1.weight", "projection_head.weight"}


# ----------------------------------------------------------------- upgrade
def test_parse_legacy_config():
    two_stage = "model = dict(rpn_head=dict(type='RPNHead'), " \
                "bbox_head=dict(reg_class_agnostic=True))"
    f = parse_legacy_config(two_stage)
    assert f["is_two_stage"] and f["reg_cls_agnostic"]
    cascade = "model = dict(rpn_head=dict(), bbox_head=[dict(), dict()])"
    assert parse_legacy_config(cascade)["reg_cls_agnostic"]
    retina = "model = dict(bbox_head=dict(type='RetinaHead'))"
    f = parse_legacy_config(retina)
    assert f["is_retina"] and not f["is_two_stage"]
    ssd = "model = dict(bbox_head=dict(type='SSDHead'))"
    assert parse_legacy_config(ssd)["is_ssd"]


def test_upgrade_two_stage_state_dict():
    nc = 81
    sd = {
        "backbone.conv1.weight": RNG.randn(64, 3, 7, 7).astype(np.float32),
        "bbox_head.fc_cls.weight": RNG.randn(nc, 1024).astype(np.float32),
        "bbox_head.fc_cls.bias": RNG.randn(nc).astype(np.float32),
        "bbox_head.fc_reg.weight": RNG.randn(nc * 4, 1024).astype(
            np.float32),
        "mask_head.conv_logits.weight": RNG.randn(nc, 256, 1, 1).astype(
            np.float32),
        "rpn_head.rpn_cls.weight": RNG.randn(3, 256, 1, 1).astype(
            np.float32),
    }
    out = upgrade_state_dict(
        sd, nc, is_two_stage=True, is_ssd=False, is_retina=False,
        reg_cls_agnostic=False, upgrade_rpn=True, upgrade_retina=False)
    # heads move under roi_head.
    assert "roi_head.bbox_head.fc_cls.weight" in out
    assert "roi_head.mask_head.conv_logits.weight" in out
    assert "backbone.conv1.weight" in out
    # channel semantics match the oracle
    np.testing.assert_array_equal(
        out["roi_head.bbox_head.fc_cls.weight"],
        oracle.reorder_cls_channel(
            torch.from_numpy(sd["bbox_head.fc_cls.weight"]), nc).numpy())
    np.testing.assert_array_equal(
        out["roi_head.bbox_head.fc_reg.weight"],
        oracle.truncate_reg_channel(
            torch.from_numpy(sd["bbox_head.fc_reg.weight"]), nc).numpy())
    np.testing.assert_array_equal(
        out["roi_head.mask_head.conv_logits.weight"],
        oracle.truncate_cls_channel(
            torch.from_numpy(sd["mask_head.conv_logits.weight"]),
            nc).numpy())
    assert out["roi_head.bbox_head.fc_reg.weight"].shape == (320, 1024)


def test_upgrade_legacy_retina_convmodule_rename():
    sd = {"bbox_head.cls_convs.0.weight":
          RNG.randn(256, 256, 3, 3).astype(np.float32)}
    out = upgrade_state_dict(
        sd, 81, is_two_stage=False, is_ssd=False, is_retina=True,
        reg_cls_agnostic=False, upgrade_rpn=True, upgrade_retina=True)
    assert set(out) == {"bbox_head.cls_convs.0.conv.weight"}


def test_upgrade_ssd_keys():
    sd = {
        "backbone.extra.0.weight": RNG.randn(256, 1024, 1, 1).astype(
            np.float32),
        "backbone.extra.3.bias": RNG.randn(256).astype(np.float32),
        "backbone.l2_norm.weight": np.ones(512, np.float32),
        # key[:21] + '.0' + key[21:]: 'bbox_head.cls_convs.0' + '.0' + ...
        "bbox_head.cls_convs.0.weight": RNG.randn(
            84, 512, 3, 3).astype(np.float32),
    }
    out = upgrade_ssd_state_dict(sd)
    assert "neck.extra_layers.0.0.conv.weight" in out
    assert "neck.extra_layers.1.1.conv.bias" in out
    assert "neck.l2_norm.weight" in out
    assert "bbox_head.cls_convs.0.0.weight" in out


# -------------------------------------------------------------- CLI e2e
def test_cli_upgrade_roundtrip(tmp_path):
    nc = 81
    sd = {"bbox_head.fc_cls.weight":
          torch.randn(nc, 1024),
          "bbox_head.fc_cls.bias": torch.randn(nc)}
    src = tmp_path / "legacy.pth"
    dst = tmp_path / "modern.pth"
    torch.save({"state_dict": sd,
                "meta": {"mmdet_version": "2.3.0",
                         "config": "model = dict(rpn_head=dict(), "
                                   "bbox_head=dict())"}}, src)
    main(["upgrade", str(src), str(dst), "--num-classes", str(nc)])
    out = torch.load(dst, weights_only=False)["state_dict"]
    assert "roi_head.bbox_head.fc_cls.weight" in out
    np.testing.assert_array_equal(
        out["roi_head.bbox_head.fc_cls.weight"].numpy(),
        oracle.reorder_cls_channel(sd["bbox_head.fc_cls.weight"],
                                   nc).numpy())


def test_cli_detectron(tmp_path):
    import pickle

    src = tmp_path / "caffe.pkl"
    dst = tmp_path / "out.pth"
    with open(src, "wb") as f:
        pickle.dump({"blobs": _detectron_r50_blobs()}, f)
    main(["detectron", str(src), str(dst), "50"])
    sd = torch.load(dst, weights_only=False)["state_dict"]
    assert "layer4.2.bn3.running_var" in sd


def test_cli_publish(tmp_path):
    import glob

    from iif_tpu.utils.checkpoint import CheckpointManager

    state = {"params": {"w": np.ones((3, 3), np.float32)},
             "batch_stats": {"m": np.zeros(3, np.float32)},
             "opt_state": {"momentum": np.ones((3, 3), np.float32)}}
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save(0, state, force=True)
    mngr.close()
    main(["publish", str(tmp_path / "ckpts"), str(tmp_path / "release")])
    files = glob.glob(str(tmp_path / "release" / "model-*.npz"))
    assert len(files) == 1
    # weights-only: optimizer state stripped, sha names the content
    loaded = np.load(files[0])
    assert "params/w" in loaded
    assert not any(k.startswith("opt_state") for k in loaded.files)
