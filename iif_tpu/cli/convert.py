"""Dataset converters: VOC / plain image dirs / Cityscapes -> COCO json.

TPU-native parity for the reference's ``tools/dataset_converters/``
(``pascal_voc.py``, ``images2coco.py``, ``cityscapes.py``). Original
implementations on top of the in-repo RLE codec (no pycocotools /
cityscapesscripts dependency).

Usage:
  python -m iif_tpu.cli.convert pascal_voc DEVKIT_DIR -o OUT_DIR
  python -m iif_tpu.cli.convert images2coco IMG_DIR CLASSES_TXT OUT_JSON
  python -m iif_tpu.cli.convert cityscapes CITYSCAPES_DIR -o OUT_DIR
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog",
               "horse", "motorbike", "person", "pottedplant", "sheep",
               "sofa", "train", "tvmonitor")

# Cityscapes instance classes that are evaluated (cityscapesscripts
# labels with hasInstances and not ignoreInEval; converter
# ``tools/dataset_converters/cityscapes.py`` keeps original label ids)
CITYSCAPES_INSTANCE_LABELS = {
    24: "person", 25: "rider", 26: "car", 27: "truck", 28: "bus",
    31: "train", 32: "motorcycle", 33: "bicycle",
}


def _dump(obj, path: str) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)
    print(f"wrote {path}")


# --------------------------------------------------------------- pascal_voc
def _voc_xml_to_objects(xml_path: str):
    """Parse one VOC annotation xml -> (w, h, [(label, x1, y1, x2, y2,
    difficult)]); boxes shifted to 0-based like the reference (-1)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    w, h = int(size.find("width").text), int(size.find("height").text)
    objs = []
    for obj in root.findall("object"):
        name = obj.find("name").text
        if name not in VOC_CLASSES:
            continue
        difficult = int((obj.find("difficult").text
                         if obj.find("difficult") is not None else 0))
        bb = obj.find("bndbox")
        box = [float(bb.find(k).text) - 1.0
               for k in ("xmin", "ymin", "xmax", "ymax")]
        objs.append((VOC_CLASSES.index(name), box, difficult))
    return w, h, objs


def cmd_pascal_voc(args) -> None:
    """VOC devkit -> per-split COCO jsons (reference pascal_voc.py:
    trainval per year + combined 0712 trainval + voc07 test; difficult
    objects become iscrowd=1 so the COCO evaluator ignores them the way
    VOC eval ignores difficult)."""
    years = [y for y in ("2007", "2012")
             if osp.isdir(osp.join(args.devkit_path, f"VOC{y}"))]
    if not years:
        raise FileNotFoundError(f"no VOC20xx dirs under {args.devkit_path}")
    out_dir = args.out_dir or args.devkit_path

    def convert(year_splits, out_name):
        images, annotations = [], []
        img_id, ann_id = 0, 0
        for year, split in year_splits:
            listfile = osp.join(args.devkit_path,
                                f"VOC{year}/ImageSets/Main/{split}.txt")
            if not osp.isfile(listfile):
                print(f"missing {listfile}, skip")
                continue
            with open(listfile) as f:
                names = [ln.strip() for ln in f if ln.strip()]
            for name in names:
                xml = osp.join(args.devkit_path,
                               f"VOC{year}/Annotations/{name}.xml")
                w, h, objs = _voc_xml_to_objects(xml)
                images.append({
                    "id": img_id, "width": w, "height": h,
                    "file_name": f"VOC{year}/JPEGImages/{name}.jpg"})
                for label, box, difficult in objs:
                    x1, y1, x2, y2 = box
                    annotations.append({
                        "id": ann_id, "image_id": img_id,
                        "category_id": label,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "area": (x2 - x1) * (y2 - y1),
                        "segmentation": [[x1, y1, x1, y2, x2, y2, x2, y1]],
                        "iscrowd": difficult,
                        "ignore": difficult,
                    })
                    ann_id += 1
                img_id += 1
        if not images:
            return
        coco = {"type": "instance",
                "categories": [{"id": i, "name": n, "supercategory": "none"}
                               for i, n in enumerate(VOC_CLASSES)],
                "images": images, "annotations": annotations}
        _dump(coco, osp.join(out_dir, out_name))

    for year in years:
        convert([(year, "trainval")], f"voc{year[2:]}_trainval.json")
        convert([(year, "test")], f"voc{year[2:]}_test.json")
    if set(years) == {"2007", "2012"}:
        convert([("2007", "trainval"), ("2012", "trainval")],
                "voc0712_trainval.json")


# -------------------------------------------------------------- images2coco
def cmd_images2coco(args) -> None:
    """Directory of images -> annotation-less COCO json (reference
    images2coco.py; for --format-only inference over unlabeled sets)."""
    import cv2

    with open(args.classes) as f:
        classes = [ln.strip() for ln in f if ln.strip()]
    exts = tuple((args.exclude_extensions or []))
    images = []
    paths = sorted(
        p for p in glob.glob(osp.join(args.img_path, "**", "*"),
                             recursive=True)
        if osp.isfile(p) and not (exts and p.lower().endswith(exts)))
    for i, p in enumerate(paths):
        img = cv2.imread(p)
        if img is None:
            continue
        images.append({"id": len(images),
                       "file_name": osp.relpath(p, args.img_path),
                       "height": int(img.shape[0]),
                       "width": int(img.shape[1])})
    coco = {"type": "instance",
            "categories": [{"id": i, "name": n, "supercategory": "none"}
                           for i, n in enumerate(classes)],
            "images": images, "annotations": []}
    _dump(coco, args.out)


# --------------------------------------------------------------- cityscapes
def cmd_cityscapes(args) -> None:
    """Cityscapes gtFine -> instancesonly COCO jsons (reference
    cityscapes.py: per-pixel instance ids from *_instanceIds.png;
    ids >= 1000 encode label*1000+instance, ids in [24, 1000) are crowd
    regions of that label; masks RLE-encoded)."""
    import cv2

    from iif_tpu.detection.mask_utils import rle_encode

    out_dir = args.out_dir or args.cityscapes_path
    img_root = osp.join(args.cityscapes_path, args.img_dir)
    gt_root = osp.join(args.cityscapes_path, args.gt_dir)
    for split in ("train", "val", "test"):
        split_dir = osp.join(img_root, split)
        if not osp.isdir(split_dir):
            continue
        images, annotations = [], []
        ann_id = 0
        suffix = "leftImg8bit.png"
        for img_file in sorted(glob.glob(osp.join(split_dir, "**/*.png"),
                                         recursive=True)):
            rel = img_file[len(img_root.rstrip("/")) + 1:]
            inst_file = osp.join(
                gt_root, rel[:-len(suffix)] + "gtFine_instanceIds.png")
            inst = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
            if inst is None:
                continue
            img_id = len(images)
            city = osp.basename(osp.dirname(img_file))
            images.append({
                "id": img_id, "height": int(inst.shape[0]),
                "width": int(inst.shape[1]),
                "file_name": osp.join(city, osp.basename(img_file)),
                "segm_file": osp.join(city, osp.basename(inst_file)).replace(
                    "instanceIds", "labelIds")})
            for inst_id in np.unique(inst[inst >= 24]):
                label = int(inst_id) // 1000 if inst_id >= 1000 else int(
                    inst_id)
                if label not in CITYSCAPES_INSTANCE_LABELS:
                    continue
                mask = (inst == inst_id)
                ys, xs = np.nonzero(mask)
                x1, x2 = float(xs.min()), float(xs.max()) + 1
                y1, y2 = float(ys.min()), float(ys.max()) + 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": label,
                    "iscrowd": int(inst_id < 1000),
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": float(mask.sum()),
                    "segmentation": rle_encode(mask)})
                ann_id += 1
        coco = {"categories": [{"id": i, "name": n} for i, n in
                               sorted(CITYSCAPES_INSTANCE_LABELS.items())],
                "images": images}
        if annotations:
            coco["annotations"] = annotations
        _dump(coco, osp.join(
            out_dir, f"instancesonly_filtered_gtFine_{split}.json"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("pascal_voc")
    v.add_argument("devkit_path")
    v.add_argument("-o", "--out-dir", default=None)
    v.set_defaults(fn=cmd_pascal_voc)

    i = sub.add_parser("images2coco")
    i.add_argument("img_path")
    i.add_argument("classes", help="txt file, one class name per line")
    i.add_argument("out")
    i.add_argument("-e", "--exclude-extensions", nargs="+", default=None)
    i.set_defaults(fn=cmd_images2coco)

    c = sub.add_parser("cityscapes")
    c.add_argument("cityscapes_path")
    c.add_argument("--img-dir", default="leftImg8bit")
    c.add_argument("--gt-dir", default="gtFine")
    c.add_argument("-o", "--out-dir", default=None)
    c.set_defaults(fn=cmd_cityscapes)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
