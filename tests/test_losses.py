"""Focal/BCE/CE losses vs torch oracles."""
import jax.numpy as jnp
import numpy as np
import torch

from iif_tpu.losses import CrossEntropyLoss, FocalLoss

C = 7


def _data(seed=0, b=12):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, C).astype(np.float32)
    targets = rng.randint(0, C, size=b)
    return logits, targets


def test_bce_gamma0_matches_torch():
    logits, targets = _data()
    got = float(FocalLoss(gamma=0.0)(jnp.asarray(logits), jnp.asarray(targets)))
    y = torch.zeros(len(targets), C).scatter_(
        1, torch.tensor(targets)[:, None], 1)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), y).item()
    assert abs(got - want) < 1e-6


def test_bce_sum_reduction_divides_by_batch():
    logits, targets = _data(1)
    got = float(FocalLoss(gamma=0.0, reduction="sum")(
        jnp.asarray(logits), jnp.asarray(targets)))
    y = torch.zeros(len(targets), C).scatter_(
        1, torch.tensor(targets)[:, None], 1)
    per = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), y, reduction="none")
    assert abs(got - (per.sum() / len(targets)).item()) < 1e-5


def test_focal_gamma2_matches_reference_formula():
    logits, targets = _data(2)
    gamma, alpha = 2.0, 0.25
    got = float(FocalLoss(gamma=gamma, alpha=alpha)(
        jnp.asarray(logits), jnp.asarray(targets)))

    y = torch.zeros(len(targets), C).scatter_(
        1, torch.tensor(targets)[:, None], 1)
    p = torch.sigmoid(torch.tensor(logits))
    loss = torch.nn.functional.binary_cross_entropy(p, y, reduction="none")
    p_t = p * y + (1 - p) * (1 - y)
    loss = loss * (1 - p_t) ** gamma
    alpha_t = alpha * y + (1 - alpha) * (1 - y)
    want = (alpha_t * loss).mean().item()
    assert abs(got - want) < 1e-6


def test_weighted_ce_matches_torch():
    logits, targets = _data(3)
    w = np.linspace(0.5, 2.0, C).astype(np.float32)
    got = float(CrossEntropyLoss(weight=jnp.asarray(w))(
        jnp.asarray(logits), jnp.asarray(targets)))
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(targets),
        weight=torch.tensor(w)).item()
    assert abs(got - want) < 1e-6
