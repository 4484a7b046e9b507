"""Native C++ eval matcher (native/evalmatch.cpp) vs the pure-Python
fallback: both the single-pair ``greedy_match`` (used by
``_evaluate_img_cat``) and the batched per-category path inside
``DetEvaluator.evaluate`` must produce bit-identical results, so the
oracle-differential suite (test_eval_oracle.py) covers whichever path a
given machine takes."""
import numpy as np
import pytest

from iif_tpu.detection.evaluation import DetEvaluator, _greedy_match_py
from iif_tpu.native import eval_native

from tests.test_eval_oracle import make_scenario

pytestmark = pytest.mark.skipif(
    not eval_native.eval_match_available(),
    reason="no C++ toolchain: python fallback is the only path")

IOU_THRS = np.linspace(0.5, 0.95, 10)


@pytest.mark.parametrize("seed", range(8))
def test_single_matcher_parity(seed):
    rng = np.random.RandomState(seed)
    D, G = rng.randint(0, 14), rng.randint(0, 9)
    ious = rng.rand(D, G) * 1.05  # some above 1 (crowd IoF can exceed)
    g_ignore = rng.rand(G) < 0.3
    # real-first order, as the matcher contract requires
    order = np.argsort(g_ignore, kind="stable")
    g_ignore = g_ignore[order]
    iscrowd = rng.rand(G) < 0.25
    got = eval_native.greedy_match_native(ious, g_ignore, iscrowd, IOU_THRS)
    want = _greedy_match_py(ious, g_ignore, iscrowd, IOU_THRS)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,segm,lvis", [(0, False, False),
                                            (1, False, True),
                                            (2, True, False),
                                            (3, True, True)])
def test_evaluate_native_vs_fallback(seed, segm, lvis, monkeypatch):
    images, gt_anns, dets, counts, freq = make_scenario(seed, segm=segm,
                                                        lvis=lvis)
    cats = sorted({a["category_id"] for a in gt_anns} |
                  {d["category_id"] for d in dets})
    iou_type = "segm" if segm else "bbox"

    def run():
        ev = DetEvaluator(
            [dict(im) for im in images],
            [dict(a) for a in gt_anns], cats, lvis=lvis,
            cat_image_counts=counts, max_dets=100)
        return ev.evaluate([dict(d) for d in dets], iou_type)

    native = run()
    monkeypatch.setattr(eval_native, "greedy_match_native",
                        lambda *a, **k: None)
    monkeypatch.setattr(eval_native, "greedy_match_batch_native",
                        lambda *a, **k: None)
    fallback = run()
    assert set(native) == set(fallback)
    for k in native:
        if np.isnan(native[k]) and np.isnan(fallback[k]):
            continue
        assert native[k] == pytest.approx(fallback[k], abs=1e-12), k
