"""StableHLO deployment export (the reference's pytorch2onnx /
core/export analog): export a detector inference program, round-trip it
through serialize/deserialize, and check numeric identity with the live
model."""
import jax.numpy as jnp
import numpy as np

from iif_tpu.cli.export import build_export, load_exported
from iif_tpu.config import Config


def _tiny_cfg(mtype):
    return Config({
        "model": {"type": mtype, "num_classes": 4, "depth": 18,
                  "with_mask": False, "frozen_stages": -1},
        "test_cfg": {"nms_pre": 64, "max_per_img": 10},
        "pipeline": {"canvas": (64, 64)},
    })


def test_export_roundtrip_retinanet(tmp_path):
    exported, infer, example = build_export(_tiny_cfg("RetinaNet"),
                                            batch_size=1)
    path = tmp_path / "retina.stablehlo"
    path.write_bytes(exported.serialize())
    back = load_exported(str(path))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 64, 64, 3).astype(np.float32))
    live = infer(x)
    reloaded = back.call(x)
    # Exported.call returns the same pytree structure
    np.testing.assert_allclose(np.asarray(live["scores"]),
                               np.asarray(reloaded["scores"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(live["boxes"]),
                               np.asarray(reloaded["boxes"]),
                               rtol=1e-5, atol=1e-4)


def test_export_mlir_contains_stablehlo():
    exported, _, _ = build_export(_tiny_cfg("FCOS"), batch_size=1)
    mlir = exported.mlir_module()
    assert "stablehlo" in mlir
