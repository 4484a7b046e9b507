"""mmdet MaskRCNN checkpoint conversion: structural completeness against
a fresh iif_tpu init, plus numerical forward parity of the converted
heads against torch compositions of the same weights (the torch modules
play the reference's mmdet layers)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from iif_tpu.detection.detector import MaskRCNN
from iif_tpu.detection.pretrained_det import convert_mmdet_maskrcnn
from iif_tpu.models.pretrained import merge_pretrained

NC = 3  # tiny class count


def _mmdet_state_dict(rng, depth=18, nc=NC):
    """Synthetic state_dict in mmdet MaskRCNN naming (R18 + FPN + RPN +
    Shared2FC bbox head + FCN mask head)."""
    sd = {}

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    # backbone (torchvision naming under backbone.)
    sd["backbone.conv1.weight"] = t(64, 3, 7, 7)
    for leaf, shape in (("weight", (64,)), ("bias", (64,)),
                        ("running_mean", (64,)), ("running_var", (64,))):
        sd[f"backbone.bn1.{leaf}"] = (t(*shape) if "running_var" not in leaf
                                      else torch.ones(shape))
    widths = [64, 128, 256, 512]
    for s, (blocks, w) in enumerate(zip((2, 2, 2, 2), widths), start=1):
        for b in range(blocks):
            in_w = widths[s - 2] if (b == 0 and s > 1) else w
            sd[f"backbone.layer{s}.{b}.conv1.weight"] = t(w, in_w, 3, 3)
            sd[f"backbone.layer{s}.{b}.conv2.weight"] = t(w, w, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"backbone.layer{s}.{b}.{bn}.weight"] = t(w)
                sd[f"backbone.layer{s}.{b}.{bn}.bias"] = t(w)
                sd[f"backbone.layer{s}.{b}.{bn}.running_mean"] = t(w)
                sd[f"backbone.layer{s}.{b}.{bn}.running_var"] = \
                    torch.ones(w)
            if b == 0 and s > 1:
                sd[f"backbone.layer{s}.{b}.downsample.0.weight"] = \
                    t(w, widths[s - 2], 1, 1)
                sd[f"backbone.layer{s}.{b}.downsample.1.weight"] = t(w)
                sd[f"backbone.layer{s}.{b}.downsample.1.bias"] = t(w)
                sd[f"backbone.layer{s}.{b}.downsample.1.running_mean"] = t(w)
                sd[f"backbone.layer{s}.{b}.downsample.1.running_var"] = \
                    torch.ones(w)
    # FPN
    for i, cin in enumerate(widths):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(256, cin, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(256)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(256)
    # RPN
    sd["rpn_head.rpn_conv.weight"] = t(256, 256, 3, 3)
    sd["rpn_head.rpn_conv.bias"] = t(256)
    sd["rpn_head.rpn_cls.weight"] = t(3, 256, 1, 1)
    sd["rpn_head.rpn_cls.bias"] = t(3)
    sd["rpn_head.rpn_reg.weight"] = t(12, 256, 1, 1)
    sd["rpn_head.rpn_reg.bias"] = t(12)
    # bbox head (Shared2FC)
    sd["roi_head.bbox_head.shared_fcs.0.weight"] = t(1024, 256 * 49)
    sd["roi_head.bbox_head.shared_fcs.0.bias"] = t(1024)
    sd["roi_head.bbox_head.shared_fcs.1.weight"] = t(1024, 1024)
    sd["roi_head.bbox_head.shared_fcs.1.bias"] = t(1024)
    sd["roi_head.bbox_head.fc_cls.weight"] = t(nc + 1, 1024)
    sd["roi_head.bbox_head.fc_cls.bias"] = t(nc + 1)
    sd["roi_head.bbox_head.fc_reg.weight"] = t(4 * nc, 1024)
    sd["roi_head.bbox_head.fc_reg.bias"] = t(4 * nc)
    # mask head
    for i in range(4):
        sd[f"roi_head.mask_head.convs.{i}.conv.weight"] = t(256, 256, 3, 3)
        sd[f"roi_head.mask_head.convs.{i}.conv.bias"] = t(256)
    sd["roi_head.mask_head.upsample.weight"] = t(256, 256, 2, 2)
    sd["roi_head.mask_head.upsample.bias"] = t(256)
    sd["roi_head.mask_head.conv_logits.weight"] = t(nc, 256, 1, 1)
    sd["roi_head.mask_head.conv_logits.bias"] = t(nc)
    return sd


@pytest.fixture(scope="module")
def converted():
    rng = np.random.RandomState(0)
    sd = _mmdet_state_dict(rng)
    params, stats = convert_mmdet_maskrcnn(sd, num_classes=NC)
    model = MaskRCNN(num_classes=NC, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    merged = merge_pretrained(variables, params, stats)
    return sd, params, stats, model, variables, merged


def test_structural_completeness(converted):
    """Every converted leaf must land on an existing param of the same
    shape (no orphans that merge would silently append)."""
    sd, params, stats, model, variables, merged = converted

    def _check(conv_tree, init_tree, path=""):
        for k, v in conv_tree.items():
            assert k in init_tree, f"orphan key {path}/{k}"
            if isinstance(v, dict):
                _check(v, init_tree[k], f"{path}/{k}")
            else:
                assert np.shape(v) == np.shape(init_tree[k]), \
                    f"shape mismatch at {path}/{k}"

    _check(params, variables["params"])
    _check(stats, variables["batch_stats"])


def test_bbox_head_forward_parity(converted):
    """Converted shared FCs + fc_cls/fc_reg match the torch composition,
    including the CHW->HWC flatten permutation on the first FC."""
    sd, params, stats, model, variables, merged = converted
    rng = np.random.RandomState(1)
    roi = rng.randn(5, 7, 7, 256).astype(np.float32)

    x = torch.tensor(roi.transpose(0, 3, 1, 2).reshape(5, -1))  # CHW flat
    h = torch.relu(torch.nn.functional.linear(
        x, sd["roi_head.bbox_head.shared_fcs.0.weight"],
        sd["roi_head.bbox_head.shared_fcs.0.bias"]))
    h = torch.relu(torch.nn.functional.linear(
        h, sd["roi_head.bbox_head.shared_fcs.1.weight"],
        sd["roi_head.bbox_head.shared_fcs.1.bias"]))
    cls_ref = torch.nn.functional.linear(
        h, sd["roi_head.bbox_head.fc_cls.weight"],
        sd["roi_head.bbox_head.fc_cls.bias"]).detach().numpy()
    reg_ref = torch.nn.functional.linear(
        h, sd["roi_head.bbox_head.fc_reg.weight"],
        sd["roi_head.bbox_head.fc_reg.bias"]).detach().numpy()

    cls_out, reg_out, _ = model.apply(merged, jnp.asarray(roi),
                                      method=MaskRCNN.forward_bbox)
    np.testing.assert_allclose(np.asarray(cls_out), cls_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_out), reg_ref, atol=2e-4)


def test_mask_head_forward_parity(converted):
    """Converted mask convs + ConvTranspose (flip!) + logits match the
    torch composition."""
    sd, params, stats, model, variables, merged = converted
    rng = np.random.RandomState(2)
    roi = rng.randn(2, 14, 14, 256).astype(np.float32)

    x = torch.tensor(roi.transpose(0, 3, 1, 2))
    for i in range(4):
        x = torch.relu(torch.nn.functional.conv2d(
            x, sd[f"roi_head.mask_head.convs.{i}.conv.weight"],
            sd[f"roi_head.mask_head.convs.{i}.conv.bias"], padding=1))
    x = torch.relu(torch.nn.functional.conv_transpose2d(
        x, sd["roi_head.mask_head.upsample.weight"],
        sd["roi_head.mask_head.upsample.bias"], stride=2))
    ref = torch.nn.functional.conv2d(
        x, sd["roi_head.mask_head.conv_logits.weight"],
        sd["roi_head.mask_head.conv_logits.bias"]
    ).detach().numpy().transpose(0, 2, 3, 1)

    out = model.apply(merged, jnp.asarray(roi),
                      method=MaskRCNN.forward_mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_head_swap_on_class_mismatch(converted):
    sd = converted[0]
    params, _ = convert_mmdet_maskrcnn(sd, num_classes=77)
    assert "fc_cls" not in params.get("bbox_head", {})
    assert "conv_logits" not in params.get("mask_head", {})
    assert "shared_fc1" in params["bbox_head"]  # trunk still converted
