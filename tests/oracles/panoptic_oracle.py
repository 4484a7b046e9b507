"""Independent PQ oracle: a faithful numpy transcription of
panopticapi's ``evaluation.py`` per-image PQ statistics (the library the
reference's CocoPanopticDataset.evaluate calls,
``mmdet/datasets/coco_panoptic.py:16-17``). Test-only code, used for
differential testing of ``iif_tpu.detection.panoptic_eval``.

Conventions here follow panopticapi exactly: VOID id = 0, region ids
are positive, intersections keyed as ``gt * OFFSET + pred``.
"""
from collections import defaultdict

import numpy as np

OFFSET = 256 ** 3
VOID = 0


def pq_single_oracle(pan_gt, gt_segms, pan_pred, pred_segms):
    """Returns {category: [iou_sum, tp, fp, fn]}.

    ``*_segms``: id -> {'category_id', 'area', 'iscrowd'} with positive
    ids; map pixels not in the tables are treated as void-ish (pairs
    referencing them are skipped, panopticapi raises for preds instead —
    callers must pass complete pred tables).
    """
    per_cat = defaultdict(lambda: np.zeros(4))
    combined = pan_gt.astype(np.uint64) * OFFSET + pan_pred.astype(np.uint64)
    labels, counts = np.unique(combined, return_counts=True)
    gt_pred_map = {(int(l // OFFSET), int(l % OFFSET)): int(c)
                   for l, c in zip(labels, counts)}

    gt_matched, pred_matched = set(), set()
    for (gt_label, pred_label), intersection in gt_pred_map.items():
        if gt_label not in gt_segms or pred_label not in pred_segms:
            continue
        if gt_segms[gt_label]["iscrowd"] == 1:
            continue
        if (gt_segms[gt_label]["category_id"]
                != pred_segms[pred_label]["category_id"]):
            continue
        union = (pred_segms[pred_label]["area"]
                 + gt_segms[gt_label]["area"] - intersection
                 - gt_pred_map.get((VOID, pred_label), 0))
        iou = intersection / union
        if iou > 0.5:
            cat = gt_segms[gt_label]["category_id"]
            per_cat[cat][0] += iou
            per_cat[cat][1] += 1
            gt_matched.add(gt_label)
            pred_matched.add(pred_label)

    crowd_labels_dict = {}
    for gt_label, gt_info in gt_segms.items():
        if gt_label in gt_matched:
            continue
        if gt_info["iscrowd"] == 1:
            crowd_labels_dict[gt_info["category_id"]] = gt_label
            continue
        per_cat[gt_info["category_id"]][3] += 1

    for pred_label, pred_info in pred_segms.items():
        if pred_label in pred_matched:
            continue
        intersection = gt_pred_map.get((VOID, pred_label), 0)
        if pred_info["category_id"] in crowd_labels_dict:
            intersection += gt_pred_map.get(
                (crowd_labels_dict[pred_info["category_id"]], pred_label),
                0)
        if intersection / pred_info["area"] > 0.5:
            continue
        per_cat[pred_info["category_id"]][2] += 1
    return per_cat
