"""Inference-API surface tests: init_detector / inference_detector /
inference_detector_pipelined / async_inference_detector / show_result and
the HTTP model server (``iif_tpu.cli.serve`` — the reference's
``tools/deployment/mmdet2torchserve.py`` + ``mmdet_handler.py`` analog).
"""
import asyncio
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from test_detection_e2e import _make_dataset, _write_config


@pytest.fixture(scope="module")
def tiny_detector(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("infer_api"))
    ann = _make_dataset(root, n_imgs=2)
    cfg_path = _write_config(root, ann)
    from iif_tpu.detection.inference import init_detector

    return init_detector(cfg_path)


def _rand_image(rng, h=80, w=100):
    img = rng.randint(0, 120, (h, w, 3), np.uint8)
    x1, y1 = 20, 25
    img[y1:y1 + 30, x1:x1 + 28] = 235     # a bright square "object"
    return img


def test_inference_detector_single(tiny_detector, tmp_path):
    from iif_tpu.detection.inference import inference_detector, show_result

    img = _rand_image(np.random.RandomState(0))
    result = inference_detector(tiny_detector, img)
    for key in ("boxes", "scores", "labels", "valid"):
        assert key in result
    n = result["boxes"].shape[0]
    assert result["scores"].shape == (n,)
    assert result["labels"].shape == (n,)
    # boxes come back in the ORIGINAL image frame
    assert float(result["boxes"][result["valid"]].max(initial=0.0)) <= 101.0
    assert "masks" in result and result["masks"].shape[1:] == (80, 100)
    out = str(tmp_path / "viz.png")
    show_result(img, result, classes=tiny_detector.CLASSES,
                score_thr=0.0, out_file=out)
    import os

    assert os.path.exists(out)


def test_pipelined_matches_sequential(tiny_detector):
    from iif_tpu.detection.inference import (
        inference_detector,
        inference_detector_pipelined,
    )

    rng = np.random.RandomState(1)
    images = [_rand_image(rng) for _ in range(3)]
    seq = [inference_detector(tiny_detector, im) for im in images]
    piped = inference_detector_pipelined(tiny_detector, images, depth=2)
    assert len(piped) == 3
    for a, b in zip(seq, piped):
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-6)
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["valid"], b["valid"])


def test_async_inference(tiny_detector):
    from iif_tpu.detection.inference import (
        async_inference_detector,
        inference_detector,
    )

    img = _rand_image(np.random.RandomState(2))
    ref = inference_detector(tiny_detector, img)
    got = asyncio.run(async_inference_detector(tiny_detector, img))
    np.testing.assert_allclose(ref["boxes"], got["boxes"], atol=1e-5)
    np.testing.assert_array_equal(ref["valid"], got["valid"])


def test_format_predictions_shape(tiny_detector):
    from iif_tpu.cli.serve import format_predictions
    from iif_tpu.detection.inference import inference_detector

    img = _rand_image(np.random.RandomState(3))
    result = inference_detector(tiny_detector, img)
    preds = format_predictions(result, tiny_detector.CLASSES, score_thr=0.0)
    kept = int((result["valid"] & (result["scores"] >= 0.0)).sum())
    assert len(preds) == kept
    if preds:
        p = preds[0]
        assert set(p) == {"class_name", "bbox", "score"}
        assert len(p["bbox"]) == 4


def test_http_server_roundtrip(tiny_detector):
    import cv2

    from iif_tpu.cli.serve import make_server

    server = make_server(tiny_detector, score_thr=0.0, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/ping", timeout=30) as r:
            assert json.load(r) == {"status": "Healthy"}

        img = _rand_image(np.random.RandomState(4))
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions/model",
            data=buf.tobytes(), method="POST",
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as r:
            preds = json.load(r)
        assert isinstance(preds, list)
        for p in preds:
            assert set(p) == {"class_name", "bbox", "score"}

        # base64-JSON body (the handler's other accepted encoding)
        import base64

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions/model",
            data=json.dumps(
                {"data": base64.b64encode(buf.tobytes()).decode()}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            preds2 = json.load(r)
        assert preds2 == preds

        # bad body -> 400, unknown route -> 404 (error paths)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions/model",
            data=b"not an image", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_batch_matches_sequential(tiny_detector):
    from iif_tpu.detection.inference import (
        inference_detector,
        inference_detector_batch,
    )

    rng = np.random.RandomState(5)
    images = [_rand_image(rng) for _ in range(3)]
    seq = [inference_detector(tiny_detector, im) for im in images]
    # pad_to > len: padding rows must be dropped, results identical
    batched = inference_detector_batch(tiny_detector, images, pad_to=4)
    assert len(batched) == 3
    for a, b in zip(seq, batched):
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-4)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_array_equal(a["valid"], b["valid"])
    assert inference_detector_batch(tiny_detector, []) == []


def test_http_server_micro_batching(tiny_detector):
    import cv2

    from iif_tpu.cli.serve import make_server
    from iif_tpu.detection.inference import inference_detector

    server = make_server(tiny_detector, score_thr=0.0, port=0,
                         max_batch=2, batch_window_ms=200.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(6)
        images = [_rand_image(rng) for _ in range(3)]
        refs = [inference_detector(tiny_detector, im) for im in images]

        bufs = []
        for im in images:
            ok, buf = cv2.imencode(
                ".png", cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
            assert ok
            bufs.append(buf.tobytes())

        out = [None] * 3

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predictions/model",
                data=bufs[i], method="POST",
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=300) as r:
                out[i] = json.load(r)

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        from iif_tpu.cli.serve import format_predictions

        for i in range(3):
            assert out[i] is not None
            want = format_predictions(refs[i], tiny_detector.CLASSES, 0.0)
            got = out[i]
            assert len(got) == len(want)
            for a, b in zip(got, want):
                assert a["class_name"] == b["class_name"]
                np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
    finally:
        server.shutdown()
        server.server_close()
