"""Cross-framework parity: torch ResNet-18 weights loaded into the flax
model must produce (near-)identical eval-mode forward outputs."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from iif_tpu.models import resnet18
from iif_tpu.models.pretrained import (
    convert_torch_resnet,
    load_torch_checkpoint,
    merge_pretrained,
)


def _torch_resnet18(num_classes=10):
    """Minimal torchvision-style ResNet-18 (BasicBlock) for the oracle."""
    class BasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out))

        def forward(self, x):
            idt = x
            o = torch.relu(self.bn1(self.conv1(x)))
            o = self.bn2(self.conv2(o))
            if self.downsample is not None:
                idt = self.downsample(x)
            return torch.relu(o + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            self.layer1 = tnn.Sequential(BasicBlock(64, 64),
                                         BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2),
                                         BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2),
                                         BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2),
                                         BasicBlock(512, 512))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = l(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return Net()


def test_forward_parity_torch_to_flax():
    torch.manual_seed(0)
    tmodel = _torch_resnet18(num_classes=10).eval()
    # randomize BN stats so the test isn't trivially mean0/var1
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    params, batch_stats = convert_torch_resnet(tmodel.state_dict())
    fmodel = resnet18(num_classes=10)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            train=False)
    variables = merge_pretrained(variables, params, batch_stats)

    out_f = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


def test_classifier_swap_on_mismatch(tmp_path):
    torch.manual_seed(1)
    tmodel = _torch_resnet18(num_classes=1000)
    path = tmp_path / "ckpt.pth"
    torch.save({"model": tmodel.state_dict()}, str(path))

    params, batch_stats = load_torch_checkpoint(str(path), num_classes=365)
    assert "linear" not in params  # classifier dropped

    fmodel = resnet18(num_classes=365)
    x = jnp.zeros((1, 64, 64, 3))
    variables = fmodel.init(jax.random.PRNGKey(0), x, train=False)
    orig_head = np.asarray(variables["params"]["linear"]["kernel"])
    merged = merge_pretrained(variables, params, batch_stats)
    # head kept its fresh init, backbone replaced
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["linear"]["kernel"]), orig_head)
    tw = tmodel.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["conv1"]["kernel"]), tw)
    out = fmodel.apply(merged, x, train=False)
    assert out.shape == (1, 365)
