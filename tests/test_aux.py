"""Aux subsystems: VOC mAP/recalls, profiling, weight export, EMA."""
import json
import os

import numpy as np
import pytest


def test_voc_map_perfect_and_miss():
    from iif_tpu.detection.voc_eval import eval_map

    gt = {"bboxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
          "labels": np.array([0, 1])}
    dets_perfect = [[np.array([[0, 0, 10, 10, 0.9]]),
                     np.array([[20, 20, 40, 40, 0.8]])]]
    m, per = eval_map(dets_perfect, [gt])
    assert m == pytest.approx(1.0)
    dets_half = [[np.array([[0, 0, 10, 10, 0.9]]),
                  np.empty((0, 5))]]
    m2, _ = eval_map(dets_half, [gt])
    assert m2 == pytest.approx(0.5)


def test_voc_map_false_positive_hurts():
    from iif_tpu.detection.voc_eval import eval_map

    gt = {"bboxes": np.array([[0, 0, 10, 10]], float),
          "labels": np.array([0])}
    dets = [[np.array([[50, 50, 60, 60, 0.95], [0, 0, 10, 10, 0.9]])]]
    m, _ = eval_map(dets, [gt])
    assert 0.0 < m < 1.0


def test_voc_map_ignore_regions():
    """A detection whose best match is a difficult/ignore box is neither
    TP nor FP (mean_ap.py:154 semantics); ignore boxes don't add gts."""
    from iif_tpu.detection.voc_eval import eval_map

    gt = {"bboxes": np.array([[0, 0, 10, 10]], float),
          "labels": np.array([0]),
          "bboxes_ignore": np.array([[50, 50, 60, 60]], float),
          "labels_ignore": np.array([0])}
    # high-scoring hit on the ignore region + perfect hit on the gt
    dets = [[np.array([[50, 50, 60, 60, 0.95], [0, 0, 10, 10, 0.9]])]]
    m, per = eval_map(dets, [gt])
    assert m == pytest.approx(1.0)          # ignore det doesn't count
    assert per[0]["num_gts"] == 1           # ignore box isn't a gt
    # same dets with NO ignore annotation: the 0.95 det is now an FP
    # ranked above the TP, so precision at the TP is 0.5
    gt_plain = {"bboxes": gt["bboxes"], "labels": gt["labels"]}
    m2, _ = eval_map(dets, [gt_plain])
    assert m2 == pytest.approx(0.5)


def test_voc_map_ignore_is_per_class():
    """labels_ignore scopes ignore regions to their class (mmdet
    get_cls_results splits per class): a class-1 det on a class-0
    difficult box is still an FP for class 1."""
    from iif_tpu.detection.voc_eval import eval_map

    gt = {"bboxes": np.array([[0, 0, 10, 10]], float),
          "labels": np.array([1]),
          "bboxes_ignore": np.array([[50, 50, 60, 60]], float),
          "labels_ignore": np.array([0])}
    dets = [[np.empty((0, 5)),
             np.array([[50, 50, 60, 60, 0.95], [0, 0, 10, 10, 0.9]])]]
    m, per = eval_map(dets, [gt])
    assert per[1]["ap"] == pytest.approx(0.5)


def test_eval_recalls():
    from iif_tpu.detection.voc_eval import eval_recalls

    gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)]
    props = [np.array([[0, 0, 10, 10], [100, 100, 110, 110]], float)]
    r = eval_recalls(gts, props, proposal_nums=[1, 2], iou_thrs=[0.5])
    assert r[0, 0] == pytest.approx(0.5)  # top-1 proposal hits 1 of 2 gts
    assert r[1, 0] == pytest.approx(0.5)


def test_profile_time_and_flops(capsys):
    import jax.numpy as jnp

    from iif_tpu.utils.profiling import flops_of, profile_time

    with profile_time("block"):
        _ = jnp.ones((4, 4)) @ jnp.ones((4, 4))
    out = capsys.readouterr().out
    assert "block elapsed_time" in out

    fl = flops_of(lambda a, b: a @ b, jnp.ones((64, 128)), jnp.ones((128, 32)))
    if fl is not None and np.isfinite(fl):
        assert fl == pytest.approx(2 * 64 * 128 * 32, rel=0.5)


def test_analyze_log_json(tmp_path):
    from iif_tpu.utils.profiling import analyze_log_json

    p = tmp_path / "x.log.json"
    p.write_text('{"time": 0.5}\n{"time": 1.5}\nnot json\n{"other": 1}\n')
    stats = analyze_log_json(str(p))
    assert stats["mean"] == pytest.approx(1.0)
    assert stats["n"] == 2


def test_plot_log_curves(tmp_path):
    """analyze_logs plot_curve parity: loss over iters + mAP over epochs
    rendered to a file (reference tools/analysis_tools/analyze_logs.py)."""
    pytest.importorskip("matplotlib")
    from iif_tpu.utils.profiling import plot_log_curves

    p = tmp_path / "run.log.json"
    lines = []
    for ep in (1, 2):
        for it in (10, 20):
            lines.append(json.dumps({"mode": "train", "epoch": ep,
                                     "iter": it, "loss_cls": 1.0 / it,
                                     "lr": 0.02}))
        lines.append(json.dumps({"mode": "val", "epoch": ep,
                                 "bbox_mAP": 0.1 * ep}))
    p.write_text("\n".join(lines) + "\n")

    out = tmp_path / "curve.png"
    plot_log_curves([str(p)], ["loss_cls", "bbox_mAP"], out=str(out))
    assert out.exists() and out.stat().st_size > 0

    with pytest.raises(KeyError):
        plot_log_curves([str(p)], ["nope"],
                        out=str(tmp_path / "x.png"))


def test_store_model_weights(tmp_path):
    import jax.numpy as jnp

    from iif_tpu.utils.checkpoint import store_model_weights

    state = {"params": {"layer": {"kernel": jnp.ones((2, 2))}},
             "batch_stats": {"bn": {"mean": jnp.zeros(2)}}}
    path = store_model_weights(state, str(tmp_path))
    assert os.path.exists(path)
    base = os.path.basename(path)
    assert base.startswith("model-") and base.endswith(".npz")
    data = np.load(path)
    assert "params/layer/kernel" in data.files
    # content-addressed: same weights -> same name
    assert store_model_weights(state, str(tmp_path)) == path


def test_ema():
    import jax.numpy as jnp

    from iif_tpu.utils.ema import init_ema, update_ema

    p = {"w": jnp.zeros(3)}
    ema = init_ema(p)
    ema = update_ema(ema, {"w": jnp.ones(3)}, momentum=0.1)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.1)


def test_checkpoint_averaging():
    import jax.numpy as jnp

    from iif_tpu.utils.checkpoint import average_checkpoints

    t1 = {"w": np.ones(3), "step": np.int32(1)}
    t2 = {"w": 3 * np.ones(3), "step": np.int32(2)}
    avg = average_checkpoints([t1, t2])
    np.testing.assert_allclose(avg["w"], 2.0)
    assert avg["step"] == 1  # non-float leaves keep the first value


def test_places_finetune_mask():
    import jax
    import jax.numpy as jnp

    from iif_tpu.engine.schedules import places_finetune_mask
    from iif_tpu.models import resnet18

    model = resnet18(num_classes=5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    mask = places_finetune_mask(v["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = {tuple(str(getattr(k, "key", "")) for k in p)
                 for p, m in flat if m}
    # head + last block of layer4 only
    assert any("linear" in t for t in trainable)
    assert any("layer4_1" in t for t in trainable)
    assert not any("layer4_0" in t for t in trainable)
    assert not any("layer1_0" in t for t in trainable)


def test_train_log_writer(tmp_path):
    """.log.json stream: one JSON object per interval, consumable by the
    analysis `logs` tool (reference TextLoggerHook schema)."""
    import numpy as np

    from iif_tpu.utils.logging import TrainLogWriter
    from iif_tpu.utils.profiling import analyze_log_json

    w = TrainLogWriter(str(tmp_path), tensorboard=False, filename="t")
    w.write_env_header(exp_name="unit", seed=7)
    w.write({"mode": "train", "epoch": 1, "iter": 0, "lr": 0.02,
             "loss": 1.5, "time": 0.1}, step=0)
    w.write({"mode": "train", "epoch": 1, "iter": 50, "lr": 0.02,
             "loss": 1.2, "time": 0.11}, step=50)
    w.add_histogram("fasa/prob_list_s0", np.linspace(0.1, 1.0, 5), 0)
    w.close()
    stats = analyze_log_json(w.path, "time")
    assert stats["n"] == 2
    assert abs(stats["mean"] - 0.105) < 1e-9
    # env header is the first line (reference .log.json convention) and
    # doesn't confuse the per-iter readers above
    import json

    with open(w.path) as f:
        head = json.loads(f.readline())
    assert head["exp_name"] == "unit" and head["seed"] == 7
    assert "jax" in head["env_info"]


def test_collect_env():
    """collect_env analog (mmdet/utils/collect_env.py): versions + device
    inventory, usable standalone."""
    from iif_tpu.utils.env import collect_env, env_info_str

    info = collect_env()
    assert info["Python"].startswith("3.")
    assert info["jax"] and info["iif_tpu"].startswith("0.3+")
    assert "JAX backend" in info
    assert "jax:" in env_info_str()


def test_metric_logger_sink():
    from iif_tpu.utils.metrics import MetricLogger

    recs = []
    logger = MetricLogger(print_fn=lambda *a: None)
    for x in logger.log_every(range(5), print_freq=2, sink=recs.append):
        logger.update(loss=float(x))
    assert [r["iter"] for r in recs] == [0, 2, 4]
    assert "time" in recs[0] and "data_time" in recs[0]
    assert "loss" in recs[-1]


def _mini_det_workspace(tmp_path):
    """Synthetic COCO dataset on disk + a config + perfect results json
    (reuses the e2e fixture generator)."""
    import json

    from tests.test_detection_e2e import _make_dataset, _write_config

    root = str(tmp_path)
    ann_path = _make_dataset(root, n_imgs=4, n_cats=1)
    cfg_path = _write_config(root, ann_path)
    with open(ann_path) as f:
        ann = json.load(f)
    results = [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": a["bbox"], "score": 0.9}
        for a in ann["annotations"]]
    res_path = os.path.join(root, "results.json")
    with open(res_path, "w") as f:
        json.dump(results, f)
    return cfg_path, res_path


def test_analysis_eval_metric_and_error_analysis(tmp_path, capsys):
    """tools/analysis_tools equivalents: offline eval of a results json
    + the per-category error decomposition."""
    import argparse

    from iif_tpu.cli.analysis import _offline_eval

    cfg_path, res_path = _mini_det_workspace(tmp_path)
    _offline_eval(argparse.Namespace(cmd="eval_metric", config=cfg_path,
                                     results=res_path, eval=["bbox"]))
    out = capsys.readouterr().out
    assert "'AP': 1.0" in out

    _offline_eval(argparse.Namespace(cmd="coco_error_analysis",
                                     config=cfg_path, results=res_path,
                                     eval="bbox", topk=3))
    out = capsys.readouterr().out
    assert "C75 1.000" in out
    assert "FN err 0.000" in out


def test_analysis_optimize_anchors(tmp_path, capsys):
    import argparse

    from iif_tpu.cli.analysis import _optimize_anchors

    cfg_path, _ = _mini_det_workspace(tmp_path)
    _optimize_anchors(argparse.Namespace(config=cfg_path, num_anchors=2,
                                         iters=5))
    out = capsys.readouterr().out
    assert "level 0 (stride 4):" in out
    assert "ratio=" in out
