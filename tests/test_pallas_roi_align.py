"""Pallas RoIAlign: CPU fallback correctness (the kernel itself is
TPU-only; its TPU parity — max abs err ~1e-5 vs the XLA path at HIGHEST
matmul precision, 1.4x faster for 512 RoIs on v5e — is exercised by the
TPU bench script, see kernel docstring)."""
import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.ops.pallas import roi_align_pallas
from iif_tpu.ops.roi_align import roi_align


def test_fallback_matches_xla_on_cpu():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(2, 64, 64, 8), jnp.float32)
    rois = jnp.asarray([[0, 4, 4, 30, 30], [1, 10, 12, 40, 44]], jnp.float32)
    a = roi_align(feats, rois, (7, 7), 1.0, 2, True)
    b = roi_align_pallas(feats, rois, (7, 7), 1.0, 2, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_extractor_pallas_flag():
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    feats = [jnp.ones((1, 64 // (2 ** i), 64 // (2 ** i), 4))
             for i in range(4)]
    ex = SingleRoIExtractor((7, 7), use_pallas=True)
    out = ex(feats, jnp.asarray([[0, 0, 0, 20, 20]], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_grad_wrapper_fallback_matches_autodiff_on_cpu():
    """roi_align_pallas_grad off-TPU: forward falls back to the XLA path
    and the custom bwd routes through jax.vjp of that same path — the
    gradient must equal plain autodiff exactly."""
    from iif_tpu.ops.pallas.roi_align_kernel import roi_align_pallas_grad

    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.rand(2, 64, 64, 8), jnp.float32)
    rois = jnp.asarray([[0, 4, 4, 30, 30], [1, 10, 12, 40, 44]],
                       jnp.float32)

    def f_ref(x):
        return (roi_align(x, rois, (7, 7), 1.0, 2, True) ** 2).sum()

    def f_pal(x):
        return (roi_align_pallas_grad(x, rois, (7, 7), 1.0, 2, True)
                ** 2).sum()

    g_ref = jax.grad(f_ref)(feats)
    g_pal = jax.grad(f_pal)(feats)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-6)


def test_grad_kernel_parity_on_tpu():
    """TPU-only: the Pallas backward kernel vs XLA autodiff of the gather
    formulation (both at the same sampling grid)."""
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("pallas bwd kernel is TPU-only")
    from iif_tpu.ops.pallas.roi_align_kernel import roi_align_pallas_grad

    rng = np.random.RandomState(2)
    # channels must be lane-aligned (C % 128 == 0) for the kernel path
    feats = jnp.asarray(rng.rand(2, 64, 64, 256), jnp.float32)
    rois = jnp.asarray(
        [[0, 4.3, 4.7, 30.2, 29.8], [1, 10.1, 12.9, 40.5, 44.2],
         [0, 0.0, 0.0, 12.0, 12.0], [1, 20.0, 20.0, 52.0, 50.0]],
        jnp.float32)
    g_out = jnp.asarray(rng.rand(4, 7, 7, 256), jnp.float32)

    def f_ref(x):
        return (roi_align(x, rois, (7, 7), 1.0, 2, True) * g_out).sum()

    def f_pal(x):
        return (roi_align_pallas_grad(x, rois, (7, 7), 1.0, 2, True)
                * g_out).sum()

    g_ref = np.asarray(jax.grad(f_ref)(feats))
    g_pal = np.asarray(jax.grad(f_pal)(feats))
    assert np.isfinite(g_pal).all()
    np.testing.assert_allclose(g_pal, g_ref, atol=2e-4)


def test_ml_extractor_cpu_falls_back_to_flat():
    """use_pallas='ml' off-TPU must route to the flat gather (identical
    output), so configs can set roi_ext='ml' unconditionally."""
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    rng = np.random.RandomState(3)
    dims = [(50, 84), (25, 42), (13, 21), (7, 11)]
    feats = [jnp.asarray(rng.rand(2, h, w, 16), jnp.float32)
             for h, w in dims]
    rois = jnp.asarray(
        [[0, 4, 4, 60, 50], [1, 10, 12, 300, 200], [0, 0, 0, 330, 195]],
        jnp.float32)
    flat = SingleRoIExtractor((7, 7))(feats, rois)
    ml = SingleRoIExtractor((7, 7), use_pallas="ml")(feats, rois)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(flat), atol=1e-6)


def test_ml_kernel_parity_on_tpu():
    """TPU-only: multi-level DMA kernel (fwd + custom-VJP bwd) vs the
    flat-gather path at LVIS-like shapes, including misfit (extreme
    aspect) RoIs that route through the exact fallback."""
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("pallas ML kernel is TPU-only")
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    rng = np.random.RandomState(4)
    dims = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [jnp.asarray(rng.randn(2, h, w, 256), jnp.float32)
             for h, w in dims]
    r = 64
    centers = rng.rand(r, 2) * [1300, 780]
    scale_px = np.exp(rng.uniform(np.log(16), np.log(512), r))
    aspect = np.exp(rng.uniform(np.log(0.25), np.log(4.0), r))
    aspect[:4] = [8.0, 12.0, 1.0 / 8.0, 16.0]   # misfit-fallback rois
    w_px = scale_px * np.sqrt(aspect)
    h_px = scale_px / np.sqrt(aspect)
    x1 = np.clip(centers[:, 0] - w_px / 2, 0, 1343)
    y1 = np.clip(centers[:, 1] - h_px / 2, 0, 799)
    x2 = np.clip(centers[:, 0] + w_px / 2, 0, 1343)
    y2 = np.clip(centers[:, 1] + h_px / 2, 0, 799)
    rois = jnp.asarray(
        np.stack([rng.randint(0, 2, r), x1, y1, x2, y2], 1), jnp.float32)
    g_out = jnp.asarray(rng.rand(r, 7, 7, 256), jnp.float32)

    flat = SingleRoIExtractor((7, 7))
    ml = SingleRoIExtractor((7, 7), use_pallas="ml")

    def f_ref(ft):
        return (flat(ft, rois) * g_out).sum()

    def f_ml(ft):
        return (ml(ft, rois) * g_out).sum()

    out_ref = np.asarray(jax.jit(lambda ft: flat(ft, rois))(feats))
    out_ml = np.asarray(jax.jit(lambda ft: ml(ft, rois))(feats))
    np.testing.assert_allclose(out_ml, out_ref, atol=2e-4)

    g_ref = jax.jit(jax.grad(f_ref))(feats)
    g_ml = jax.jit(jax.grad(f_ml))(feats)
    for a, b in zip(g_ml, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
