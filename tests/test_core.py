"""Registry, config system, schedules, metrics, mesh."""
import numpy as np
import pytest

from iif_tpu.config import Config, merge_dict, parse_cfg_options
from iif_tpu.registry import Registry


def test_registry_build():
    REG = Registry("test")

    @REG.register()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = REG.build(dict(type="Foo", a=1))
    assert (obj.a, obj.b) == (1, 2)
    with pytest.raises(KeyError):
        REG.build(dict(type="Bar"))


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(depth=50, head=dict(num_classes=10))\nlr = 0.1\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = './base.py'\n"
                     "model = dict(head=dict(num_classes=100))\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model.depth == 50
    assert cfg.model.head.num_classes == 100
    assert cfg.lr == 0.1


def test_config_delete_key(tmp_path):
    base = tmp_path / "b.py"
    base.write_text("opt = dict(type='SGD', momentum=0.9)\n")
    child = tmp_path / "c.py"
    child.write_text("_base_ = './b.py'\nopt = dict(_delete_=True, type='Adam')\n")
    cfg = Config.fromfile(str(child))
    assert "momentum" not in cfg.opt
    assert cfg.opt.type == "Adam"


def test_cfg_options_deep_set():
    cfg = Config.fromdict({"model": {"depth": 50}})
    cfg.merge_from_options(parse_cfg_options(
        ["model.depth=101", "data.batch=16", "flag=true"]))
    assert cfg.model.depth == 101
    assert cfg.data.batch == 16
    assert cfg.flag is True


def test_lr_schedule_warmup_and_milestones():
    from iif_tpu.engine import build_lr_schedule

    sched = build_lr_schedule(0.1, steps_per_epoch=100, epochs=10,
                              milestones=[5, 8], lr_gamma=0.1)
    assert float(sched(0)) == pytest.approx(0.1 / 1000, rel=1e-4)
    assert float(sched(99)) == pytest.approx(0.1, rel=1e-2)
    assert float(sched(450)) == pytest.approx(0.1)
    assert float(sched(550)) == pytest.approx(0.01)
    assert float(sched(850)) == pytest.approx(0.001)


def test_cosine_schedule():
    from iif_tpu.engine import build_lr_schedule

    sched = build_lr_schedule(0.2, steps_per_epoch=10, epochs=10,
                              cosine=True, warmup=False)
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(50)) == pytest.approx(0.1, rel=1e-5)  # half way


def test_smoothed_value_and_accuracy():
    import jax.numpy as jnp

    from iif_tpu.utils.metrics import SmoothedValue, accuracy_topk

    m = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
    assert m.global_avg == 2.0

    logits = jnp.asarray([[5.0, 1.0, 0.0], [0.0, 1.0, 5.0]])
    y = jnp.asarray([0, 0])
    a1, a2 = accuracy_topk(logits, y, topk=(1, 2))
    assert float(a1) == 50.0
    assert float(a2) == 50.0


def test_mesh_and_sharding(mesh):
    import jax

    from iif_tpu.parallel import shard_batch

    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.ones((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].shape == (16, 4)
    assert not sharded["x"].sharding.is_fully_replicated


def test_calibration_binning():
    from iif_tpu.engine.calibration import compute_calibration

    rng = np.random.RandomState(0)
    n = 1000
    true = rng.randint(0, 2, n)
    pred = true.copy()
    wrong = rng.rand(n) < 0.3
    pred[wrong] = 1 - pred[wrong]
    conf = np.full(n, 0.7)
    cal = compute_calibration(true, pred, conf, num_bins=10)
    assert cal["expected_calibration_error"] < 0.05


def test_shard_pytree_by_rules(mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from iif_tpu.parallel.mesh import shard_pytree_by_rules

    tree = {"backbone": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
            "linear": {"kernel": jnp.ones((64, 8)),
                       "bias": jnp.zeros(8)}}
    rules = [(("linear", "kernel"), P(None, "model")),
             (("linear", "bias"), P("model"))]
    out = shard_pytree_by_rules(tree, mesh, rules)
    assert out["backbone"]["conv"]["kernel"].sharding.spec == P()
    assert out["linear"]["kernel"].sharding.spec == P(None, "model")
    assert out["linear"]["bias"].sharding.spec == P("model")
