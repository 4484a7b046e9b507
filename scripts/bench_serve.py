"""Serving-throughput bench: HTTP server with and without dynamic
micro-batching on the real chip.

Starts `make_server` in-process on the given config, fires N concurrent
requests from a small thread pool, and reports requests/s for
max_batch=1 (request lock, b1 programs) vs max_batch=B (batched
programs). The LVIS MaskRCNN b4 inference is ~1.7x b1 img/s, so
batching should approach that under concurrent load.

Usage: python scripts/bench_serve.py CONFIG [--n 32] [--batch 4]
       [--concurrency 8]
"""
import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def drive(port, bufs, concurrency):
    done = []
    lock = threading.Lock()
    idx = {"i": 0}

    def worker():
        while True:
            with lock:
                i = idx["i"]
                if i >= len(bufs):
                    return
                idx["i"] += 1
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predictions/model",
                data=bufs[i % len(bufs)], method="POST",
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=600) as r:
                json.load(r)
            with lock:
                done.append(i)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert len(done) == len(bufs)
    return len(bufs) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args()

    import cv2

    from iif_tpu.cli.serve import make_server
    from iif_tpu.detection.inference import (
        inference_detector,
        inference_detector_batch,
        init_detector,
    )
    from iif_tpu.utils import compile_cache

    compile_cache.enable()
    detector = init_detector(args.config, args.checkpoint)
    canvas = detector.pipeline.canvas
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (canvas[0] - 8, canvas[1] - 8, 3),
                        np.uint8) for _ in range(4)]
    bufs = []
    for im in imgs:
        ok, buf = cv2.imencode(".jpg", im)
        assert ok
        bufs.append(buf.tobytes())

    # warm both program shapes before timing
    inference_detector(detector, imgs[0])
    inference_detector_batch(detector, imgs[:1], pad_to=args.batch)

    for max_batch in (1, args.batch):
        server = make_server(detector, score_thr=0.0, port=0,
                             max_batch=max_batch, batch_window_ms=20.0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            rps = drive(port, bufs * (args.n // len(bufs)),
                        args.concurrency)
            print(f"max_batch={max_batch}: {rps:.2f} req/s", flush=True)
        finally:
            server.shutdown()
            server.server_close()


if __name__ == "__main__":
    main()
