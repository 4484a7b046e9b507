"""Server round-trip check — the analog of the reference's
``tools/deployment/test_torchserver.py``: run local ``inference_detector``
on an image, POST the same bytes to a running ``iif_tpu.cli.serve``
instance, and compare the two detection sets.

    python scripts/test_server.py IMG CONFIG CHECKPOINT \
        [--inference-addr 127.0.0.1:8080] [--score-thr 0.5]

Exit code 0 when every served detection matches a local detection
(same class, IoU > 0.9, |score delta| < 1e-3) and the counts agree.
Uses stdlib urllib (the reference uses ``requests``, not in this env).
"""
from __future__ import annotations

import argparse
import json
import sys
import urllib.request

import numpy as np


def fetch_server(addr: str, img_path: str):
    with open(img_path, "rb") as f:
        body = f.read()
    req = urllib.request.Request(
        f"http://{addr}/predictions/model", data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--inference-addr", default="127.0.0.1:8080")
    p.add_argument("--score-thr", type=float, default=0.5)
    args = p.parse_args()

    from iif_tpu.detection.inference import init_detector, inference_detector

    det = init_detector(args.config, args.checkpoint)
    local = inference_detector(det, args.img)
    keep = local["valid"] & (local["scores"] >= args.score_thr)
    lb = np.asarray(local["boxes"])[keep]
    ls = np.asarray(local["scores"])[keep]
    ll = np.asarray(local["labels"])[keep]

    served = fetch_server(args.inference_addr, args.img)
    print(f"local: {keep.sum()} dets >= {args.score_thr}; "
          f"served: {len(served)} dets")
    if len(served) != int(keep.sum()):
        print("MISMATCH: detection counts differ")
        return 1

    classes = getattr(det, "CLASSES", None)
    for d in served:
        box = np.asarray(d["bbox"], np.float32)
        # IoU vs every local box of the same class
        same = [i for i in range(len(lb))
                if (classes[ll[i]] if classes is not None
                    else str(ll[i])) == d["class_name"]]
        ok = False
        for i in same:
            a, b = lb[i], box
            ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = ix * iy
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if ua > 0 and inter / ua > 0.9 and abs(ls[i] - d["score"]) < 1e-3:
                ok = True
                break
        if not ok:
            print(f"MISMATCH: served det {d} has no local counterpart")
            return 1
    print("server output matches local inference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
