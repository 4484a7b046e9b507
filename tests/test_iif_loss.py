"""IIF loss golden tests vs the reference math (torch CPU as oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from scipy.special import ndtri

from iif_tpu.losses import (
    IIF_VARIANTS,
    IIFLoss,
    compute_iif_weights,
    get_criterion,
    get_deferred_weights,
)

COUNTS = [500, 300, 120, 40, 11, 5]


def _reference_weights(freqs, variant):
    # re-derived from classification/custom.py:16-23
    freqs = np.asarray(freqs, dtype=np.float64)
    n = freqs.sum()
    return {
        "raw": np.log(n / freqs),
        "smooth": np.log((n + 1) / (freqs + 1)) + 1,
        "rel": np.log((n - freqs) / freqs),
        "normit": -ndtri(freqs / n),
        "gombit": -np.log(-np.log(1 - freqs / n)),
        "base2": np.log2(n / freqs),
        "base10": np.log10(n / freqs),
    }[variant]


@pytest.mark.parametrize("variant", IIF_VARIANTS)
def test_weight_variants_match_reference(variant):
    got = np.asarray(compute_iif_weights(COUNTS, variant))
    want = _reference_weights(COUNTS, variant)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("p", [1, 2])
def test_iif_norm(p):
    got = np.asarray(compute_iif_weights(COUNTS, "raw", iif_norm=p))
    w = _reference_weights(COUNTS, "raw")
    np.testing.assert_allclose(got, w / np.linalg.norm(w, ord=p), rtol=1e-6)


def test_loss_matches_torch_ce_on_scaled_logits():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, len(COUNTS)).astype(np.float32)
    targets = rng.randint(0, len(COUNTS), size=16)
    loss = IIFLoss.from_counts(COUNTS, "raw")
    got = float(loss(jnp.asarray(logits), jnp.asarray(targets)))

    w = torch.tensor(_reference_weights(COUNTS, "raw"), dtype=torch.float32)
    t_logits = torch.tensor(logits) * w
    want = torch.nn.functional.cross_entropy(
        t_logits, torch.tensor(targets)).item()
    assert abs(got - want) < 1e-5


def test_inference_transform():
    loss = IIFLoss.from_counts(COUNTS, "smooth")
    logits = jnp.ones((2, len(COUNTS)))
    out = loss.transform(logits)
    np.testing.assert_allclose(
        np.asarray(out), _reference_weights(COUNTS, "smooth")[None].repeat(2, 0),
        rtol=1e-6)


def test_deferred_reweighting_semantics():
    """reference: CE(reduction='none', weight=w) then .mean() ==
    mean over batch of w_y * ce_i (NOT normalized by sum of weights)."""
    rng = np.random.RandomState(1)
    logits = rng.randn(8, len(COUNTS)).astype(np.float32)
    targets = rng.randint(0, len(COUNTS), size=8)
    crit = get_criterion("iif", COUNTS, deferred=True)
    got = float(crit(jnp.asarray(logits), jnp.asarray(targets)))

    w_iif = torch.tensor(_reference_weights(COUNTS, "raw"), dtype=torch.float32)
    w_cls = torch.tensor(np.asarray(get_deferred_weights(COUNTS)))
    per = torch.nn.functional.cross_entropy(
        torch.tensor(logits) * w_iif, torch.tensor(targets),
        weight=w_cls, reduction="none")
    assert abs(got - per.mean().item()) < 1e-4


def test_iifloss_is_pytree():
    loss = IIFLoss.from_counts(COUNTS, "raw")
    leaves = jax.tree_util.tree_leaves(loss)
    assert len(leaves) == 1  # weights only (class_weights None)

    @jax.jit
    def f(l, x, y):
        return l(x, y)

    x = jnp.ones((4, len(COUNTS)))
    y = jnp.zeros((4,), jnp.int32)
    assert np.isfinite(float(f(loss, x, y)))
