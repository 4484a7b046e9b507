"""Data layer: imbalance profiles, class maps, samplers, loader."""
import numpy as np
import pytest

from iif_tpu.data import (
    ImbalancedArrays,
    Loader,
    eval_batches,
    img_num_per_cls,
    make_synthetic_cifar,
)
from iif_tpu.data.lt_dataset import frequency_class_map
from iif_tpu.data.samplers import balanced_epoch_order, random_epoch_order


def test_exp_imbalance_profile():
    # n_c = n_max * imb^(c/(C-1)); CIFAR-100 @ imb 0.01 -> head 500, tail 5
    counts = img_num_per_cls(50000, 100, "exp", 0.01)
    assert counts[0] == 500
    assert counts[-1] == 5
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_step_imbalance_profile():
    counts = img_num_per_cls(50000, 10, "step", 0.1)
    assert counts[:5] == [5000] * 5
    assert counts[5:] == [500] * 5


def test_imbalanced_subsetting_matches_reference_rng():
    """Selection must reproduce np.random.seed(r); np.random.shuffle per
    class (imbalanced_dataset.py:19,49)."""
    data, targets = make_synthetic_cifar(100, 10, seed=3)
    ds = ImbalancedArrays(data, targets, 10, "exp", 0.1, rand_number=0)

    # independent re-derivation with the legacy global-seed API
    np.random.seed(0)
    counts = img_num_per_cls(len(data), 10, "exp", 0.1)
    t = np.array(targets)
    expect = []
    for c, n in zip(np.unique(t), counts):
        idx = np.where(t == c)[0]
        np.random.shuffle(idx)
        expect.append(data[idx[:n]])
    expect = np.vstack(expect)
    np.testing.assert_array_equal(ds.data, expect)
    assert ds.get_cls_num_list() == counts


def test_frequency_class_map_sorts_descending():
    targets = [0] * 3 + [1] * 10 + [2] * 5
    cmap = frequency_class_map(targets, 3)
    # class 1 (10) -> 0, class 2 (5) -> 1, class 0 (3) -> 2
    assert cmap == [2, 0, 1]


def test_balanced_sampler_upsampling():
    targets = [0] * 50 + [1] * 10 + [2] * 4
    order = balanced_epoch_order(targets, epoch=0, mode="upsampling")
    t = np.array(targets)[order]
    counts = np.bincount(t)
    assert counts.tolist() == [50, 50, 50]


def test_balanced_sampler_downsampling():
    targets = [0] * 50 + [1] * 10 + [2] * 4
    order = balanced_epoch_order(targets, epoch=0, mode="downsampling")
    counts = np.bincount(np.array(targets)[order])
    assert counts.tolist() == [4, 4, 4]


def test_random_order_deterministic_per_epoch():
    a = random_epoch_order(100, epoch=1, seed=0)
    b = random_epoch_order(100, epoch=1, seed=0)
    c = random_epoch_order(100, epoch=2, seed=0)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_loader_shapes_and_epoch_reshuffle():
    data, targets = make_synthetic_cifar(20, 5, seed=0)
    loader = Loader(data, targets, batch_size=16, seed=0)
    assert len(loader) == 100 // 16
    b0 = next(iter(loader))
    assert b0["image"].shape == (16, 32, 32, 3)
    assert b0["label"].shape == (16,)
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.array_equal(b0["label"], b1["label"])


def test_eval_batches_pad_and_mask():
    data, targets = make_synthetic_cifar(7, 3, seed=0)  # 21 samples
    batches = list(eval_batches(data, targets, batch_size=8))
    assert len(batches) == 3
    assert batches[-1]["image"].shape == (8, 32, 32, 3)
    assert batches[-1]["valid"].sum() == 21 - 16
    total_valid = sum(b["valid"].sum() for b in batches)
    assert total_valid == 21
