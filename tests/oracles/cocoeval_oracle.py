"""Test oracle: the pycocotools ``COCOeval`` / lvis-api ``LVISEval``
evaluation algorithm, re-implemented faithfully for differential testing
of ``iif_tpu.detection.evaluation.DetEvaluator`` (VERDICT.md round-2
item 2: neither package is installable in this container, so the
*algorithm* is transcribed here from its published specification and kept
structurally identical to the originals — ``computeIoU`` /
``evaluateImg`` / ``accumulate`` / ``summarize`` — while sharing NO code
with the product evaluator).

Independence guarantees (what a mismatch would catch):
- its own RLE decoder (compressed LEB128 string and raw counts) — cross
  checks ``mask_utils.rle_encode/_compress_counts``;
- its own dense-numpy mask IoU (incl. crowd IoF) — cross checks
  ``native/rle.cpp``'s run-intersection IoU and ``mask_utils.rle_iou``;
- its own dt-area computation from the mask — cross checks
  ``mask_utils.mask_area``;
- the matching loop / accumulate / summarize are written in the
  original's id-based dtm/gtm style, not the product's boolean style.

Reference behavior being modeled: ``pycocotools/cocoeval.py`` (invoked by
``mmdet/datasets/coco.py:362``) and ``lvis/eval.py`` (invoked by
``mmdet/datasets/lvis.py:309-470``): greedy score-ordered matching per
(image, category) at 10 IoU thresholds, crowd gts matchable by multiple
dts via IoF, area-range gt/dt ignores, 101-point interpolated AP; LVIS
deltas: federated per-category image restriction (pos ∪ neg), unmatched
dts ignored on not-exhaustive images, max_dets=300, APr/APc/APf buckets.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np


# --------------------------------------------------------------- RLE codec
def oracle_rle_decode(rle):
    """Independent COCO-RLE decoder: {'size': [h, w], 'counts': str|list}
    -> (H, W) uint8, column-major runs, LEB128-ish base-48 varint string
    with every 3rd+ count delta-encoded against counts[i-2]."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    if isinstance(counts, str):
        decoded = []
        i = 0
        while i < len(counts):
            x, k = 0, 0
            while True:
                c = ord(counts[i]) - 48
                x |= (c & 0x1F) << (5 * k)
                i += 1
                k += 1
                if not (c & 0x20):
                    if c & 0x10:
                        x |= -1 << (5 * k)
                    break
            if len(decoded) > 2:
                x += decoded[-2]
            decoded.append(x)
        counts = decoded
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T


def oracle_mask_iou(dts, gts, iscrowd):
    """(D, G) dense mask IoU; crowd gt -> intersection / dt area."""
    out = np.zeros((len(dts), len(gts)))
    dm = [np.asarray(m, bool) for m in dts]
    gm = [np.asarray(m, bool) for m in gts]
    for i, d in enumerate(dm):
        da = d.sum()
        for j, g in enumerate(gm):
            inter = np.logical_and(d, g).sum()
            union = da if iscrowd[j] else da + g.sum() - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def oracle_bbox_iou(dts, gts, iscrowd):
    """(D, G) xywh box IoU; crowd gt -> IoF, scalar loops (independent of
    the product's vectorized version)."""
    out = np.zeros((len(dts), len(gts)))
    for i, d in enumerate(dts):
        dx, dy, dw, dh = d
        da = dw * dh
        for j, g in enumerate(gts):
            gx, gy, gw, gh = g
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                out[i, j] = 0.0
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + gw * gh - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


# ---------------------------------------------------------------- the eval
class COCOEvalOracle:
    """Evaluate exactly like COCOeval/LVISEval.

    Parameters
    ----------
    images : list of dicts {id, height, width, neg_category_ids?,
        not_exhaustive_category_ids?}
    gt_anns : COCO annotation dicts; for iou_type='segm' each must carry
        ``_dense_mask`` (the ground-truth bitmap the RLE was encoded
        from) so the oracle never touches the product codec.
    detections : COCO results records; for segm each carries
        ``segmentation`` (RLE dict) which the oracle decodes itself.
    lvis : LVIS protocol (federated image restriction, nel-dt-ignore,
        no-crowd assumption NOT required — crowd logic stays live).
    """

    def __init__(self, images, gt_anns, cat_ids, detections,
                 iou_type="bbox", lvis=False, max_dets=100,
                 cat_image_counts=None, cat_frequency=None):
        self.iou_type = iou_type
        self.lvis = lvis
        self.max_dets = max_dets
        self.cat_ids = list(cat_ids)
        self.img_ids = [im["id"] for im in images]
        self.imgs = {im["id"]: im for im in images}
        self.iou_thrs = np.linspace(0.5, 0.95, 10)
        self.rec_thrs = np.linspace(0.0, 1.0, 101)
        self.area_rng = [(0.0, 1e10), (0.0, 32.0 ** 2),
                         (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]
        self.area_lbl = ["all", "small", "medium", "large"]
        self.cat_image_counts = cat_image_counts or {}
        self.cat_frequency = cat_frequency or {}

        self._gts = defaultdict(list)
        pos_cats = defaultdict(set)
        for i, a in enumerate(gt_anns):
            g = dict(a)
            g["id"] = i + 1
            g["iscrowd"] = int(g.get("iscrowd", 0))
            g["ignore"] = int(bool(g.get("ignore", 0)) or g["iscrowd"])
            if "area" not in g:
                g["area"] = g["bbox"][2] * g["bbox"][3]
            self._gts[g["image_id"], g["category_id"]].append(g)
            pos_cats[g["image_id"]].add(g["category_id"])

        self._dts = defaultdict(list)
        for i, d0 in enumerate(detections):
            d = dict(d0)
            d["id"] = i + 1
            if lvis:
                # federated filtering: a dt only counts on images where
                # its category is positively or negatively annotated
                im = self.imgs[d["image_id"]]
                if (d["category_id"] not in pos_cats[d["image_id"]]
                        and d["category_id"]
                        not in im.get("neg_category_ids", ())):
                    continue
                d["_nel"] = d["category_id"] in im.get(
                    "not_exhaustive_category_ids", ())
            else:
                d["_nel"] = False
            if iou_type == "segm":
                d["_dense_mask"] = oracle_rle_decode(d["segmentation"])
                d["area"] = float(d["_dense_mask"].sum())
            else:
                d["area"] = d["bbox"][2] * d["bbox"][3]
            self._dts[d["image_id"], d["category_id"]].append(d)

    # ------------------------------------------------------------ stage 1
    def compute_iou(self, img_id, cat_id):
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds[:self.max_dets]]
        iscrowd = [g["iscrowd"] for g in gt]
        if self.iou_type == "segm":
            return oracle_mask_iou([d["_dense_mask"] for d in dt],
                                   [g["_dense_mask"] for g in gt], iscrowd)
        return oracle_bbox_iou([d["bbox"] for d in dt],
                               [g["bbox"] for g in gt], iscrowd)

    # ------------------------------------------------------------ stage 2
    def evaluate_img(self, img_id, cat_id, arng, ious):
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < arng[0]
                                 or g["area"] > arng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:self.max_dets]]
        iscrowd = [g["iscrowd"] for g in gt]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T, G, D = len(self.iou_thrs), len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt]
                         ) if G else np.zeros(0)
        dt_ig = np.zeros((T, D))
        if len(ious):
            for tind, thr in enumerate(self.iou_thrs):
                for dind, d in enumerate(dt):
                    iou = min(thr, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        amask = np.array([d["area"] < arng[0] or d["area"] > arng[1]
                          or d["_nel"] for d in dt]).reshape(1, -1)
        dt_ig = np.logical_or(dt_ig, np.logical_and(
            dtm == 0, np.repeat(amask, T, 0)))
        return {"dt_scores": [d["score"] for d in dt],
                "dt_matches": dtm, "dt_ignore": dt_ig,
                "gt_ignore": gt_ig}

    # ------------------------------------------------------------ stage 3
    def accumulate(self):
        T, R = len(self.iou_thrs), len(self.rec_thrs)
        K, A = len(self.cat_ids), len(self.area_rng)
        precision = -np.ones((T, R, K, A))
        recall = -np.ones((T, K, A))
        for k, cat in enumerate(self.cat_ids):
            ious = {iid: self.compute_iou(iid, cat)
                    for iid in self.img_ids}
            for a, arng in enumerate(self.area_rng):
                E = [self.evaluate_img(iid, cat, arng, ious[iid])
                     for iid in self.img_ids]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [e["dt_scores"] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dt_matches"] for e in E], axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dt_ignore"] for e in E], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gt_ignore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, k, a] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, self.rec_thrs,
                                             side="left")
                    try:
                        for ri, pi in enumerate(inds_r):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a] = q
        self.precision = precision
        self.recall = recall

    # ------------------------------------------------------------ stage 4
    def summarize(self):
        self.accumulate()

        def _ap(t_slice=slice(None), a=0, cats=None):
            s = self.precision[t_slice, :, :, a]
            if cats is not None:
                s = s[:, :, cats]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else float("nan")

        out = {"AP": _ap(), "AP50": _ap(slice(0, 1)),
               "AP75": _ap(slice(5, 6)), "APs": _ap(a=1),
               "APm": _ap(a=2), "APl": _ap(a=3)}
        if self.lvis:
            groups = {"r": [], "c": [], "f": []}
            for k, cat in enumerate(self.cat_ids):
                b = self.cat_frequency.get(cat)
                if b not in ("r", "c", "f"):
                    n = self.cat_image_counts.get(cat, 0)
                    b = "r" if n <= 10 else ("c" if n <= 100 else "f")
                groups[b].append(k)
            out["APr"] = _ap(cats=groups["r"])
            out["APc"] = _ap(cats=groups["c"])
            out["APf"] = _ap(cats=groups["f"])
        return out
