"""Dataset converters + misc tools (reference tools/dataset_converters/,
tools/misc/): VOC->COCO, images2coco, Cityscapes->COCO, print_config,
browse_dataset."""
import json
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _voc_xml(w, h, objs):
    parts = [f"<annotation><size><width>{w}</width>"
             f"<height>{h}</height><depth>3</depth></size>"]
    for name, box, diff in objs:
        parts.append(
            f"<object><name>{name}</name><difficult>{diff}</difficult>"
            f"<bndbox><xmin>{box[0]}</xmin><ymin>{box[1]}</ymin>"
            f"<xmax>{box[2]}</xmax><ymax>{box[3]}</ymax></bndbox></object>")
    parts.append("</annotation>")
    return "".join(parts)


def test_pascal_voc_converter(tmp_path):
    from iif_tpu.cli.convert import cmd_pascal_voc

    devkit = tmp_path / "VOCdevkit"
    for sub in ("Annotations", "ImageSets/Main", "JPEGImages"):
        (devkit / "VOC2007" / sub).mkdir(parents=True)
    (devkit / "VOC2007/Annotations/000001.xml").write_text(
        _voc_xml(500, 375, [("dog", (48, 240, 195, 371), 0),
                            ("person", (8, 12, 352, 198), 1)]))
    (devkit / "VOC2007/ImageSets/Main/trainval.txt").write_text("000001\n")
    (devkit / "VOC2007/ImageSets/Main/test.txt").write_text("")

    cmd_pascal_voc(SimpleNamespace(devkit_path=str(devkit), out_dir=None))
    data = json.load(open(devkit / "voc07_trainval.json"))
    assert len(data["categories"]) == 20
    assert data["images"][0]["file_name"] == "VOC2007/JPEGImages/000001.jpg"
    anns = data["annotations"]
    assert len(anns) == 2
    dog = next(a for a in anns if a["iscrowd"] == 0)
    # 1-based VOC corners -> 0-based xywh (reference pascal_voc.py: -1)
    assert dog["bbox"] == [47.0, 239.0, 147.0, 131.0]
    assert dog["category_id"] == 11  # 'dog' in the canonical VOC order
    person = next(a for a in anns if a["iscrowd"] == 1)
    assert person["ignore"] == 1

    # the converted json loads through the dataset layer
    from iif_tpu.detection.datasets import CocoStyleDataset
    ds = CocoStyleDataset(str(devkit / "voc07_trainval.json"),
                          img_prefix=str(devkit), filter_empty_gt=False)
    ann = ds.get_ann(0)
    assert ann["boxes"].shape == (1, 4)          # difficult -> crowd
    assert ann["crowd_boxes"].shape == (1, 4)


def test_images2coco(tmp_path):
    from iif_tpu.cli.convert import cmd_images2coco

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (h, w) in enumerate([(32, 48), (20, 24)]):
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    np.zeros((h, w, 3), np.uint8))
    (tmp_path / "classes.txt").write_text("cat\ndog\n")
    out = tmp_path / "ann.json"
    cmd_images2coco(SimpleNamespace(
        img_path=str(img_dir), classes=str(tmp_path / "classes.txt"),
        out=str(out), exclude_extensions=None))
    data = json.load(open(out))
    assert [c["name"] for c in data["categories"]] == ["cat", "dog"]
    assert sorted((i["height"], i["width"]) for i in data["images"]) \
        == [(20, 24), (32, 48)]
    assert data["annotations"] == []


def test_cityscapes_converter(tmp_path):
    from iif_tpu.cli.convert import cmd_cityscapes
    from iif_tpu.detection.datasets import CityscapesDataset
    from iif_tpu.detection.mask_utils import rle_decode

    root = tmp_path / "cs"
    img_dir = root / "leftImg8bit/val/frankfurt"
    gt_dir = root / "gtFine/val/frankfurt"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    h, w = 64, 96
    inst = np.zeros((h, w), np.uint16)
    inst[5:20, 5:30] = 26 * 1000 + 0      # car instance
    inst[30:50, 40:80] = 24 * 1000 + 1    # person instance
    inst[55:60, 2:10] = 25                # rider crowd region (<1000)
    inst[0:3, 0:3] = 7                    # road (stuff) - ignored
    cv2.imwrite(str(gt_dir / "frankfurt_000000_gtFine_instanceIds.png"),
                inst)
    cv2.imwrite(str(img_dir / "frankfurt_000000_leftImg8bit.png"),
                np.zeros((h, w, 3), np.uint8))

    cmd_cityscapes(SimpleNamespace(
        cityscapes_path=str(root), img_dir="leftImg8bit", gt_dir="gtFine",
        out_dir=str(tmp_path / "out")))
    path = tmp_path / "out/instancesonly_filtered_gtFine_val.json"
    data = json.load(open(path))
    assert [c["name"] for c in data["categories"]] == [
        "person", "rider", "car", "truck", "bus", "train", "motorcycle",
        "bicycle"]
    anns = data["annotations"]
    assert len(anns) == 3
    car = next(a for a in anns if a["category_id"] == 26)
    assert car["bbox"] == [5.0, 5.0, 25.0, 15.0]
    assert car["iscrowd"] == 0 and car["area"] == 25 * 15
    crowd = next(a for a in anns if a["category_id"] == 25)
    assert crowd["iscrowd"] == 1
    m = rle_decode(car["segmentation"])
    assert m.sum() == 25 * 15 and m[10, 10] == 1 and m[0, 0] == 0

    ds = CityscapesDataset(str(path), img_prefix=str(root / "leftImg8bit"))
    ann = ds.get_ann(0)
    assert ann["boxes"].shape == (2, 4)          # crowd excluded from gt
    assert ann["crowd_boxes"].shape == (1, 4)
    assert set(ann["labels"].tolist()) == {0, 2}  # person, car


def _write_browse_fixture(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, anns = [], []
    for i in range(2):
        img = np.full((48, 64, 3), 40, np.uint8)
        img[10:30, 10:40] = 220
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"images/{i}.jpg",
                       "width": 64, "height": 48})
        anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0,
                     "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]})
    ann = {"categories": [{"id": 1, "name": "square"}],
           "images": images, "annotations": anns}
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    cfg = (f'model = dict(type="MaskRCNN", num_classes=1, with_mask=True)\n'
           f'data = dict(train=dict(type="CocoDataset", '
           f'ann_file=r"{tmp_path}/ann.json", img_prefix=r"{tmp_path}"))\n'
           f'pipeline = dict(canvas=(64, 64), scales=[(64, 48)], '
           f'max_gt=8)\n')
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(cfg)
    return cfg_path


def test_browse_dataset_and_print_config(tmp_path, capsys, monkeypatch):
    from iif_tpu.cli import misc

    cfg_path = _write_browse_fixture(tmp_path)
    out_dir = tmp_path / "vis"
    monkeypatch.setattr(sys, "argv", [
        "misc", "browse_dataset", str(cfg_path),
        "--output-dir", str(out_dir), "--number", "2"])
    misc.main()
    files = sorted(os.listdir(out_dir))
    assert files == ["0.jpg", "1.jpg"]
    img = cv2.imread(str(out_dir / "0.jpg"))
    assert img is not None and img.shape[2] == 3

    monkeypatch.setattr(sys, "argv", ["misc", "print_config", str(cfg_path)])
    misc.main()
    out = capsys.readouterr().out
    assert "Config:" in out and "MaskRCNN" in out and "ann_file" in out
