"""CentripetalNet: shift-target goldens and e2e train/test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.centripetal import (
    CentripetalNet,
    _shift_targets,
    centripetal_loss,
    centripetal_simple_test,
)
from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from tests.test_detection import NUM_CLASSES, _demo_inputs


def test_shift_targets_golden():
    """Reference math (corner_head.py:465-491): guiding = scaled center
    minus int corner; centripetal = log(scaled center - float corner)."""
    # one 40x20 box at (10, 20) in a 128x128 image, feature 32x32 (/4)
    gtb = jnp.asarray([[10.0, 20.0, 50.0, 40.0]])
    gtv = jnp.ones(1, bool)
    tg, bg, tc, bc = _shift_targets(gtb, gtv, (32, 32), (128, 128))
    # scaled: tl=(2.5, 5), br=(12.5, 10), center=(7.5, 7.5)
    np.testing.assert_allclose(np.asarray(tg[0]), [7.5 - 2, 7.5 - 5],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg[0]), [12 - 7.5, 10 - 7.5],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc[0]),
                               np.log([7.5 - 2.5, 7.5 - 5.0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bc[0]),
                               np.log([12.5 - 7.5, 10.0 - 7.5]), atol=1e-5)


@pytest.fixture(scope="module")
def centripetal_model():
    model = CentripetalNet(num_classes=NUM_CLASSES, num_stacks=1)
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    return model, variables, batch


def test_centripetal_loss_and_grads(centripetal_model):
    model, variables, batch = centripetal_model
    total, losses, aux = centripetal_loss(
        model, variables, batch, jax.random.PRNGKey(1), SSTrainCfg())
    assert {"s0.loss_heatmap", "s0.loss_offset", "s0.loss_guiding",
            "s0.loss_centripetal"} <= set(losses)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: centripetal_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), SSTrainCfg())[0])(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    # the centripetal branch exists and receives gradient
    g_ctp = grads["tl_head_0"]["ctp_out"]["kernel"]
    assert float(jnp.abs(g_ctp).sum()) > 0


def test_centripetal_simple_test(centripetal_model):
    model, variables, batch = centripetal_model
    out = centripetal_simple_test(
        model, variables, batch["image"],
        SSTestCfg(max_per_img=8), k_corners=16)
    assert out["boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
