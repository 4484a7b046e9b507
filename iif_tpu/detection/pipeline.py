"""Detection data pipeline: host decode + keep-ratio resize + flip +
normalize + pad to a static canvas, emitting the padded batch dict the
jitted train step consumes.

Rebuild of the mmdet dict-transform pipeline on the MaskRCNN path
(``mmdet/datasets/pipelines/``: LoadImageFromFile, LoadAnnotations,
Resize keep-ratio to (1333, 800), RandomFlip 0.5, Normalize, Pad
size_divisor=32, DefaultFormatBundle/Collect — SURVEY.md §2.3).

TPU-first deltas:
- ONE static canvas (pad_h, pad_w) for every batch instead of per-batch
  max-shape padding: a single compiled program, zero recompiles;
- multiscale train resize (6 scales) supported by sampling the scale on
  the host — the canvas stays fixed, only the image content scales;
- masks are rasterized to the padded canvas at load time so mask targets
  are a pure device-side RoIAlign crop.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iif_tpu.detection.datasets import CocoStyleDataset
from iif_tpu.detection.mask_utils import segm_to_bitmap

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)

# reference train scales: (1333, 800) single-scale for the 1x configs
DEFAULT_SCALE = (1333, 800)


def keep_ratio_scale(h: int, w: int, scale: Tuple[int, int]) -> float:
    """mmdet ``rescale_size``: factor = min(max_long/long, max_short/short)."""
    max_long, max_short = max(scale), min(scale)
    return min(max_long / max(h, w), max_short / min(h, w))


# --------------------------------------------------------------------------
# Optional pre-resize transforms (mmdet pipelines/transforms.py parity:
# RandomCrop :710, PhotoMetricDistortion :932, CutOut :1868, Albu :1315).
# They operate on a sample dict {image uint8 HxWx3, boxes (N,4) xyxy,
# labels (N,), masks optional (N, H, W) uint8} on the host, before the
# keep-ratio resize onto the static canvas.
# --------------------------------------------------------------------------
class PhotoMetricDistortion:
    """Random brightness/contrast/saturation/hue + channel swap, applied
    with the same coin-flip structure as the reference transform."""

    def __init__(self, brightness_delta: float = 32,
                 contrast_range: Tuple[float, float] = (0.5, 1.5),
                 saturation_range: Tuple[float, float] = (0.5, 1.5),
                 hue_delta: float = 18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        import cv2

        img = sample["image"].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta,
                               self.brightness_delta)
        contrast_first = rng.randint(2)
        if contrast_first and rng.randint(2):
            img *= rng.uniform(self.contrast_lower, self.contrast_upper)
        # saturation + hue in HSV space
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(self.saturation_lower,
                                       self.saturation_upper)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(
                -self.hue_delta, self.hue_delta)) % 180
        img = cv2.cvtColor(
            np.clip(hsv, 0, 255).astype(np.uint8),
            cv2.COLOR_HSV2RGB).astype(np.float32)
        if not contrast_first and rng.randint(2):
            img *= rng.uniform(self.contrast_lower, self.contrast_upper)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        sample["image"] = np.clip(img, 0, 255).astype(np.uint8)
        return sample


class RandomCrop:
    """Random absolute-size crop; boxes are shifted+clipped and instances
    whose box vanishes are dropped (with their masks/labels)."""

    def __init__(self, crop_size: Tuple[int, int],
                 allow_negative_crop: bool = False):
        self.crop_size = tuple(crop_size)    # (h, w)
        self.allow_negative_crop = allow_negative_crop

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        img = sample["image"]
        h, w = img.shape[:2]
        ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        boxes = sample["boxes"].copy()
        boxes[:, [0, 2]] -= x0
        boxes[:, [1, 3]] -= y0
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, cw)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, ch)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        if not keep.any() and not self.allow_negative_crop:
            return sample                     # reference: skip the crop
        sample["image"] = img[y0:y0 + ch, x0:x0 + cw]
        sample["boxes"] = boxes[keep]
        sample["labels"] = sample["labels"][keep]
        if sample.get("masks") is not None:
            sample["masks"] = sample["masks"][keep][:, y0:y0 + ch,
                                                    x0:x0 + cw]
        return sample


class CutOut:
    """Random square/rect holes filled with ``fill_in`` (det CutOut)."""

    def __init__(self, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0)):
        self.n_holes = (n_holes if isinstance(n_holes, (tuple, list))
                        else (n_holes, n_holes))
        self.shape = cutout_shape     # absolute (h, w) candidates
        self.ratio = cutout_ratio     # relative candidates
        self.fill_in = fill_in

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        img = sample["image"].copy()
        h, w = img.shape[:2]
        n = rng.randint(self.n_holes[0], self.n_holes[1] + 1)
        cands = self.shape if self.shape is not None else self.ratio
        cands = [cands] if not isinstance(cands[0], (tuple, list)) else cands
        for _ in range(n):
            sh, sw = cands[rng.randint(len(cands))]
            if self.shape is None:
                sh, sw = int(sh * h), int(sw * w)
            y0 = rng.randint(0, max(h - int(sh), 0) + 1)
            x0 = rng.randint(0, max(w - int(sw), 0) + 1)
            img[y0:y0 + int(sh), x0:x0 + int(sw)] = self.fill_in
        sample["image"] = img
        return sample


class InstaBoost:
    """Instance-level paste jitter (the reference pipeline's
    ``InstaBoost`` wrapper around the ``instaboostfast`` package,
    ``mmdet/datasets/pipelines/instaboost.py``; config
    ``configs/instaboost``: action_prob (1,0,0) = 'normal' only,
    scale (0.8,1.2), dx/dy 15, theta (-1,1), aug_ratio 0.5).

    Native rebuild of the package's 'normal' action: each augmented
    instance is cut out by its mask, the hole is inpainted
    (cv2.INPAINT_TELEA), and the patch is re-pasted under a small
    random similarity transform; box and mask move with it. The
    paper's appearance-consistency heatmap (which biases WHERE to
    paste) is approximated by the local jitter the shipped config uses
    in practice — identity action with +-15 px translation."""

    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        self.scale = tuple(scale)
        self.dx = dx
        self.dy = dy
        self.theta = tuple(theta)
        self.aug_ratio = aug_ratio
        # action/color/heatmap knobs accepted for config parity; the
        # shipped configs only exercise the 'normal' action
        self.action_candidate = tuple(action_candidate)
        self.action_prob = tuple(action_prob)

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        import cv2

        if sample.get("masks") is None or rng.rand() > self.aug_ratio:
            return sample
        img = np.clip(sample["image"], 0, 255).astype(np.uint8).copy()
        h, w = img.shape[:2]
        boxes = sample["boxes"].copy()
        masks = sample["masks"].copy()
        for i in range(len(boxes)):
            m = masks[i].astype(np.uint8)
            if m.sum() < 16 or rng.rand() > 0.5:
                continue
            # cut + inpaint the hole
            patch = img * m[..., None]
            img = cv2.inpaint(img, m * 255, 3, cv2.INPAINT_TELEA)
            # similarity transform around the instance center
            x1, y1, x2, y2 = boxes[i]
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            s = rng.uniform(*self.scale)
            ang = rng.uniform(*self.theta)
            tx = rng.randint(-self.dx, self.dx + 1)
            ty = rng.randint(-self.dy, self.dy + 1)
            mat = cv2.getRotationMatrix2D((float(cx), float(cy)), ang, s)
            mat[0, 2] += tx
            mat[1, 2] += ty
            warped = cv2.warpAffine(patch, mat, (w, h))
            m_w = cv2.warpAffine(m, mat, (w, h),
                                 flags=cv2.INTER_NEAREST)
            ys, xs = np.nonzero(m_w)
            if len(ys) < 16:          # jittered out of the image: keep
                img = np.where(m[..., None] > 0, patch, img)
                continue
            img = np.where(m_w[..., None] > 0, warped, img)
            masks[i] = m_w
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        sample["image"] = img.astype(sample["image"].dtype)
        sample["boxes"] = boxes
        sample["masks"] = masks
        return sample


class Albu:
    """Adapter running an albumentations pipeline when the (optional)
    package is importable — the reference's ``Albu`` wrapper surface."""

    def __init__(self, transforms: Sequence[Dict]):
        try:
            import albumentations as A
        except ImportError as e:   # package not shipped in this image
            raise ImportError(
                "Albu requires the 'albumentations' package") from e
        self.aug = A.Compose(
            [getattr(A, t["type"])(**{k: v for k, v in t.items()
                                      if k != "type"})
             for t in transforms],
            bbox_params=A.BboxParams(format="pascal_voc",
                                     label_fields=["labels"]))

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        out = self.aug(image=sample["image"],
                       bboxes=sample["boxes"].tolist(),
                       labels=sample["labels"].tolist())
        sample["image"] = out["image"]
        sample["boxes"] = np.asarray(out["bboxes"],
                                     np.float32).reshape(-1, 4)
        sample["labels"] = np.asarray(out["labels"], np.int64)
        return sample


class Mosaic:
    """4-image mosaic (reference ``transforms.py:1942``): paste the sample
    and 3 partners around a jittered center on a 2x``img_scale`` canvas,
    rescaling each keep-ratio; boxes shift/clip with their quadrant.
    Bbox-only, like the reference (the YOLOX pipeline carries no masks).
    Partners arrive in ``sample['mix_results']`` (see
    ``MultiImageMixDataset`` / ``DetectionLoader``)."""

    num_mix = 3

    def __init__(self, img_scale: Tuple[int, int] = (640, 640),
                 center_ratio_range: Tuple[float, float] = (0.5, 1.5),
                 pad_val: float = 114.0, bbox_clip_border: bool = True):
        self.img_scale = tuple(img_scale)          # (h, w)
        self.center_ratio_range = center_ratio_range
        self.pad_val = pad_val
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        import cv2

        sh, sw = self.img_scale
        canvas = np.full((2 * sh, 2 * sw, 3), self.pad_val, np.uint8)
        cy = int(rng.uniform(*self.center_ratio_range) * sh)
        cx = int(rng.uniform(*self.center_ratio_range) * sw)
        parts = [sample] + list(sample.pop("mix_results"))[:3]
        all_boxes, all_labels = [], []
        for pos, part in enumerate(parts):
            img = part["image"]
            h0, w0 = img.shape[:2]
            f = min(sh / h0, sw / w0)
            nh, nw = int(h0 * f), int(w0 * f)
            img = cv2.resize(img, (nw, nh))
            # quadrant paste rects around (cx, cy), cropping the source
            # where the quadrant is smaller than the resized image
            if pos == 0:    # top-left
                x1, y1, x2, y2 = max(cx - nw, 0), max(cy - nh, 0), cx, cy
                ox, oy = x1 - (cx - nw), y1 - (cy - nh)
            elif pos == 1:  # top-right
                x1, y1 = cx, max(cy - nh, 0)
                x2, y2 = min(cx + nw, 2 * sw), cy
                ox, oy = 0, y1 - (cy - nh)
            elif pos == 2:  # bottom-left
                x1, y1 = max(cx - nw, 0), cy
                x2, y2 = cx, min(cy + nh, 2 * sh)
                ox, oy = x1 - (cx - nw), 0
            else:           # bottom-right
                x1, y1 = cx, cy
                x2, y2 = min(cx + nw, 2 * sw), min(cy + nh, 2 * sh)
                ox, oy = 0, 0
            canvas[y1:y2, x1:x2] = img[oy:oy + (y2 - y1),
                                       ox:ox + (x2 - x1)]
            if len(part["boxes"]):
                b = part["boxes"] * f
                b[:, 0::2] += x1 - ox
                b[:, 1::2] += y1 - oy
                all_boxes.append(b)
                all_labels.append(part["labels"])
        boxes = (np.concatenate(all_boxes) if all_boxes
                 else np.zeros((0, 4), np.float32))
        labels = (np.concatenate(all_labels) if all_labels
                  else np.zeros((0,), np.int64))
        if self.bbox_clip_border and len(boxes):
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, 2 * sw)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, 2 * sh)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        sample["image"] = canvas
        sample["boxes"] = boxes[keep].astype(np.float32)
        sample["labels"] = labels[keep]
        return sample


class DetMixUp:
    """Two-image mixup (reference ``transforms.py:2191``): the partner is
    keep-ratio resized with a jittered ratio (optionally flipped), pasted
    on a pad canvas, cropped/padded to the sample's shape, then blended
    0.5/0.5; GT boxes are concatenated. Bbox-only, as in the reference."""

    num_mix = 1

    def __init__(self, img_scale: Tuple[int, int] = (640, 640),
                 ratio_range: Tuple[float, float] = (0.5, 1.5),
                 flip_ratio: float = 0.5, pad_val: float = 114.0,
                 bbox_clip_border: bool = True):
        self.img_scale = tuple(img_scale)
        self.ratio_range = ratio_range
        self.flip_ratio = flip_ratio
        self.pad_val = pad_val
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        import cv2

        other = list(sample.pop("mix_results"))[0]
        oimg = other["image"]
        flip = rng.rand() < self.flip_ratio
        if flip:
            oimg = oimg[:, ::-1]
        sh, sw = self.img_scale
        f = min(sh / oimg.shape[0], sw / oimg.shape[1])
        f *= rng.uniform(*self.ratio_range)
        nh, nw = int(oimg.shape[0] * f), int(oimg.shape[1] * f)
        oimg = cv2.resize(oimg, (nw, nh))
        dh, dw = sample["image"].shape[:2]
        pad = np.full((max(dh, nh), max(dw, nw), 3), self.pad_val,
                      np.float32)
        pad[:nh, :nw] = oimg
        x_off = rng.randint(0, max(pad.shape[1] - dw, 0) + 1)
        y_off = rng.randint(0, max(pad.shape[0] - dh, 0) + 1)
        crop = pad[y_off:y_off + dh, x_off:x_off + dw]
        sample["image"] = (
            0.5 * sample["image"].astype(np.float32) + 0.5 * crop
        ).astype(np.uint8)
        ob = other["boxes"].copy()
        if len(ob):
            if flip:
                w0 = other["image"].shape[1]
                ob[:, [0, 2]] = w0 - ob[:, [2, 0]]
            ob *= f
            ob[:, 0::2] -= x_off
            ob[:, 1::2] -= y_off
            if self.bbox_clip_border:
                ob[:, 0::2] = ob[:, 0::2].clip(0, dw)
                ob[:, 1::2] = ob[:, 1::2].clip(0, dh)
            keep = (ob[:, 2] > ob[:, 0] + 2) & (ob[:, 3] > ob[:, 1] + 2)
            sample["boxes"] = np.concatenate(
                [sample["boxes"], ob[keep]]).astype(np.float32)
            sample["labels"] = np.concatenate(
                [sample["labels"], other["labels"][keep]])
        return sample


class RandomAffine:
    """Random rotation/scale/shear/translation via one homography
    (reference ``transforms.py:2428``), warping the image and the box
    corner points; candidates filtered on size/aspect/area-shrink like
    ``filter_gt_bboxes``. Bbox-only, as in the reference."""

    num_mix = 0

    def __init__(self, max_rotate_degree: float = 10.0,
                 max_translate_ratio: float = 0.1,
                 scaling_ratio_range: Tuple[float, float] = (0.5, 1.5),
                 max_shear_degree: float = 2.0,
                 border: Tuple[int, int] = (0, 0),
                 border_val: Tuple[int, int, int] = (114, 114, 114),
                 bbox_clip_border: bool = True):
        self.max_rotate_degree = max_rotate_degree
        self.max_translate_ratio = max_translate_ratio
        self.scaling_ratio_range = scaling_ratio_range
        self.max_shear_degree = max_shear_degree
        self.border = border
        self.border_val = border_val
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, sample: Dict, rng: np.random.RandomState) -> Dict:
        import cv2

        img = sample["image"]
        h, w = img.shape[:2]
        oh, ow = h + self.border[0] * 2, w + self.border[1] * 2

        deg = np.radians(rng.uniform(-self.max_rotate_degree,
                                     self.max_rotate_degree))
        scale = rng.uniform(*self.scaling_ratio_range)
        rot = np.array([[np.cos(deg) * scale, -np.sin(deg) * scale, 0],
                        [np.sin(deg) * scale, np.cos(deg) * scale, 0],
                        [0, 0, 1]], np.float32)
        sx = np.tan(np.radians(rng.uniform(-self.max_shear_degree,
                                           self.max_shear_degree)))
        sy = np.tan(np.radians(rng.uniform(-self.max_shear_degree,
                                           self.max_shear_degree)))
        shear = np.array([[1, sx, 0], [sy, 1, 0], [0, 0, 1]], np.float32)
        tx = rng.uniform(0.5 - self.max_translate_ratio,
                         0.5 + self.max_translate_ratio) * ow
        ty = rng.uniform(0.5 - self.max_translate_ratio,
                         0.5 + self.max_translate_ratio) * oh
        trans = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
        center = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]],
                          np.float32)
        m = trans @ shear @ rot @ center
        sample["image"] = cv2.warpPerspective(
            img, m, dsize=(ow, oh), borderValue=self.border_val)

        boxes = sample["boxes"]
        if len(boxes):
            n = len(boxes)
            corners = np.ones((n * 4, 3), np.float32)
            corners[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(
                n * 4, 2)
            warped = (corners @ m.T)
            warped = (warped[:, :2] / warped[:, 2:3]).reshape(n, 8)
            xs, ys = warped[:, 0::2], warped[:, 1::2]
            nb = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
            if self.bbox_clip_border:
                nb[:, 0::2] = nb[:, 0::2].clip(0, ow)
                nb[:, 1::2] = nb[:, 1::2].clip(0, oh)
            # filter_gt_bboxes: wh_thr=2, ar_thr=20, area_thr=0.2
            ow_, oh_ = (boxes[:, 2] - boxes[:, 0]) * scale, \
                       (boxes[:, 3] - boxes[:, 1]) * scale
            nw_, nh_ = nb[:, 2] - nb[:, 0], nb[:, 3] - nb[:, 1]
            ar = np.maximum(nw_ / (nh_ + 1e-16), nh_ / (nw_ + 1e-16))
            keep = ((nw_ > 2) & (nh_ > 2) & (ar < 20)
                    & (nw_ * nh_ / (ow_ * oh_ + 1e-16) > 0.2))
            sample["boxes"] = nb[keep].astype(np.float32)
            sample["labels"] = sample["labels"][keep]
        return sample


EXTRA_TRANSFORMS = {
    "PhotoMetricDistortion": PhotoMetricDistortion,
    "RandomCrop": RandomCrop,
    "CutOut": CutOut,
    "Albu": Albu,
    "InstaBoost": InstaBoost,
    "Mosaic": Mosaic,
    "MixUp": DetMixUp,
    "RandomAffine": RandomAffine,
}


def build_extra_transforms(cfgs: Sequence[Dict]) -> List:
    return [EXTRA_TRANSFORMS[c["type"]](
        **{k: v for k, v in c.items() if k != "type"}) for c in cfgs]


class DetectionPipeline:
    def __init__(
        self,
        canvas: Tuple[int, int] = (800, 1344),   # (H, W), 32-divisible
        scales: Sequence[Tuple[int, int]] = (DEFAULT_SCALE,),
        flip_prob: float = 0.5,
        max_gt: int = 100,
        with_mask: bool = True,
        mask_stride: int = 1,
        mean: np.ndarray = IMAGENET_MEAN,
        std: np.ndarray = IMAGENET_STD,
        extra_transforms: Optional[Sequence] = None,
        canvas_buckets: bool = False,
        emit_uint8: bool = False,
        pack_masks: bool = False,
        keep_ratio: bool = True,
        with_seg: bool = False,
        seg_stride: int = 4,
        max_proposals: int = 0,
    ):
        # keep_ratio=False: stretch to exactly ``scale`` (w, h) like the
        # reference SSD pipeline (Resize keep_ratio=False,
        # ssd300_coco.py); per-axis factors, emitted as a (4,)
        # [fx, fy, fx, fy] scale_factor. Bbox-only (the reference SSD
        # pipeline carries no masks either).
        if not keep_ratio and with_mask:
            raise ValueError("keep_ratio=False is bbox-only "
                             "(reference SSD pipeline parity)")
        self.keep_ratio = keep_ratio
        # emit_uint8: keep the canvas as uint8 pixels and normalize ON
        # DEVICE inside the jitted step (MaskRCNN.extract_feat) — 4x less
        # host->device transfer + no 8MP float math per sample on the
        # host. Padding uses the rounded per-channel mean pixel so the
        # normalized pad is ~0 (within uint8 rounding) like the float
        # path's zero pad. Requires the default ImageNet mean/std (the
        # device side owns the constants).
        if emit_uint8 and not (np.allclose(mean, IMAGENET_MEAN)
                               and np.allclose(std, IMAGENET_STD)):
            raise ValueError("emit_uint8 requires the default ImageNet "
                             "mean/std (device-side normalization)")
        self.emit_uint8 = emit_uint8
        # pack_masks: ship gt masks bit-packed (np.packbits along W, 8x
        # smaller) under 'gt_masks_packed'; the loss unpacks on device
        self.pack_masks = pack_masks
        self._pad_pixel = np.round(np.asarray(mean)).astype(np.uint8)
        self.canvas = canvas
        self.scales = list(scales)
        self.flip_prob = flip_prob
        self.max_gt = max_gt
        # max_proposals > 0: carry precomputed proposals (FastRCNN)
        # through resize/flip, score-sorted, padded to this static cap
        # (reference LoadProposals num_max_proposals, loading.py)
        self.max_proposals = max_proposals
        self.with_mask = with_mask
        self.mask_stride = mask_stride
        self.mean = mean
        self.std = std
        # with_seg: carry the dataset's per-pixel semantic map (uint8
        # contiguous labels, 255 = void) through resize/flip/pad and emit
        # it at ``seg_stride`` under 'gt_semantic_seg' — the PanopticFPN
        # stuff-branch target (reference LoadPanopticAnnotations +
        # SegRescale; the loss resizes its logits to this map)
        self.with_seg = with_seg
        self.seg_stride = seg_stride
        if with_seg and extra_transforms:
            raise ValueError("with_seg supports the basic resize/flip "
                             "geometry only (no extra_transforms), like "
                             "the reference panoptic recipe")
        # optional pre-resize transforms (RandomCrop / PhotoMetric-
        # Distortion / CutOut / Albu), train-time only
        self.extra_transforms = list(extra_transforms or [])
        self._extra_transforms_all = list(self.extra_transforms)
        # multiscale canvas buckets: each train scale gets the smallest
        # 32-divisible canvas that holds its content instead of the one
        # max canvas. mmdet pads per-batch max shape (dynamic shapes);
        # TPU-first we keep a FEW static canvases (one compiled step per
        # bucket, amortized by the persistent compile cache) and the
        # loader picks the bucket per batch — scale (1333,640) content on
        # an 800x1344 canvas wastes ~37% of the conv work otherwise.
        self.canvas_of = [tuple(canvas)] * len(self.scales)
        if canvas_buckets and len(self.scales) > 1:
            ch, cw = canvas
            self.canvas_of = [
                (min(ch, -(-min(s) // 32) * 32), cw) for s in self.scales]
        # bucket id -> (canvas, [scale indices])
        self.buckets = []
        for idx, cv in enumerate(self.canvas_of):
            for b in self.buckets:
                if b[0] == cv:
                    b[1].append(idx)
                    break
            else:
                self.buckets.append((cv, [idx]))

    def update_skip_type_keys(self, skip_type_keys) -> None:
        """YOLOXModeSwitchHook support (reference
        yolox_mode_switch_hook.py:35-37 calling ``MultiImageMixDataset.
        update_skip_type_keys``, dataset_wrappers.py:319-330): drop the
        named extra transforms (matched by class name, e.g. 'Mosaic',
        'RandomAffine', 'MixUp') for every subsequent sample. Idempotent;
        the full set is kept so a later call can re-filter from scratch."""
        skip = set(skip_type_keys)
        # match by the registry *type key* (the name a config uses — e.g.
        # "MixUp" builds class DetMixUp), falling back to the class name
        name_of = {cls: key for key, cls in EXTRA_TRANSFORMS.items()}
        self.extra_transforms = [
            t for t in self._extra_transforms_all
            if name_of.get(type(t), type(t).__name__) not in skip]

    def _rasterize(self, ann: Dict, n: int) -> np.ndarray:
        masks = np.zeros((n, ann["height"], ann["width"]), np.uint8)
        for i in range(n):
            segm = ann["segms"][i]
            if segm is None:
                x1, y1, x2, y2 = ann["boxes"][i].astype(int)
                masks[i, y1:y2, x1:x2] = 1
            else:
                masks[i] = segm_to_bitmap(segm, ann["height"], ann["width"])
        return masks

    def eval_view(self, image: np.ndarray, scale: Tuple[int, int],
                  flip: bool) -> Dict[str, np.ndarray]:
        """One TTA view (``MultiScaleFlipAug``): keep-ratio resize to
        ``scale``, optional hflip, normalize, pad to the static canvas.
        No annotations — inference only."""
        import cv2

        h0, w0 = image.shape[:2]
        ch, cw = self.canvas
        if self.keep_ratio:
            factor = keep_ratio_scale(h0, w0, scale)
            factor = min(factor, ch / h0, cw / w0)
            nh, nw = int(h0 * factor + 0.5), int(w0 * factor + 0.5)
            sf_out = np.float32(factor)
        else:
            nw, nh = min(scale[0], cw), min(scale[1], ch)
            fx, fy = nw / w0, nh / h0
            sf_out = np.array([fx, fy, fx, fy], np.float32)
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if flip:
            img = img[:, ::-1]
        if self.emit_uint8:
            out_img = np.empty((ch, cw, 3), np.uint8)
            out_img[:] = self._pad_pixel
            out_img[:nh, :nw] = img
        else:
            out_img = np.zeros((ch, cw, 3), np.float32)
            out_img[:nh, :nw] = (img.astype(np.float32) - self.mean) \
                / self.std
        return {
            "image": out_img,
            "img_shape": np.array([nh, nw], np.int32),
            "scale_factor": sf_out,
            "flip": np.bool_(flip),
        }

    def __call__(self, image: np.ndarray, ann: Dict, rng: np.random.RandomState,
                 train: bool = True, mix_fetch=None,
                 scale_idx: Optional[int] = None,
                 proposals: Optional[np.ndarray] = None
                 ) -> Dict[str, np.ndarray]:
        """``mix_fetch(rng, n) -> [sample dict, ...]`` supplies partner
        images for multi-image transforms (Mosaic/MixUp) — the
        ``MultiImageMixDataset`` role (``dataset_wrappers.py:289``), owned
        here by ``DetectionLoader`` since our pipeline is loader-driven."""
        import cv2

        ann_boxes = ann["boxes"]
        ann_labels = ann["labels"]
        mask_bitmaps = None            # full-res (N, H0, W0) when extras ran
        if train and self.extra_transforms:
            if self.with_mask:
                mask_bitmaps = self._rasterize(ann, len(ann_boxes))
            sample = {"image": image, "boxes": ann_boxes.copy(),
                      "labels": np.asarray(ann_labels).copy(),
                      "masks": mask_bitmaps}
            for t in self.extra_transforms:
                n_mix = getattr(t, "num_mix", 0)
                if n_mix:
                    if self.with_mask:
                        raise ValueError(
                            f"{type(t).__name__} is bbox-only (as in the "
                            "reference YOLOX pipeline); use with_mask=False")
                    if mix_fetch is None:
                        raise ValueError(
                            f"{type(t).__name__} needs a mix_fetch source "
                            "(run through DetectionLoader)")
                    sample["mix_results"] = mix_fetch(rng, n_mix)
                sample = t(sample, rng)
            image = sample["image"]
            ann_boxes = sample["boxes"]
            ann_labels = sample["labels"]
            mask_bitmaps = sample.get("masks")

        h0, w0 = image.shape[:2]
        if train:
            s_i = rng.randint(len(self.scales)) if scale_idx is None \
                else int(scale_idx)
            scale = self.scales[s_i]
            ch, cw = self.canvas_of[s_i]
        else:
            scale = self.scales[0]
            ch, cw = self.canvas
        if self.keep_ratio:
            factor = keep_ratio_scale(h0, w0, scale)
            # never exceed the (bucket) static canvas
            factor = min(factor, ch / h0, cw / w0)
            nh, nw = int(h0 * factor + 0.5), int(w0 * factor + 0.5)
            sf_out = np.float32(factor)
            box_scale = factor
        else:
            nw, nh = min(scale[0], cw), min(scale[1], ch)
            fx, fy = nw / w0, nh / h0
            factor = min(fx, fy)        # only used by the mask path (off)
            sf_out = np.array([fx, fy, fx, fy], np.float32)
            box_scale = sf_out[None, :]
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)

        boxes = ann_boxes * box_scale
        flip = train and rng.rand() < self.flip_prob
        if flip:
            img = img[:, ::-1]
            flipped = boxes.copy()
            flipped[:, 0] = nw - boxes[:, 2]
            flipped[:, 2] = nw - boxes[:, 0]
            boxes = flipped

        prop_out = prop_valid_out = None
        if self.max_proposals > 0:
            # precomputed proposals follow the image geometry exactly like
            # gt boxes (reference Resize/RandomFlip also transform the
            # 'proposals' key, transforms.py)
            p = (np.zeros((0, 5), np.float32) if proposals is None
                 else np.asarray(proposals, np.float32))
            if p.shape[-1] == 5:        # score-sorted cap, then drop score
                p = p[np.argsort(-p[:, 4])][:, :4]
            p = p * box_scale
            if flip:
                pf = p.copy()
                pf[:, 0] = nw - p[:, 2]
                pf[:, 2] = nw - p[:, 0]
                p = pf
            k = min(len(p), self.max_proposals)
            prop_out = np.zeros((self.max_proposals, 4), np.float32)
            prop_valid_out = np.zeros(self.max_proposals, bool)
            prop_out[:k] = p[:k]
            prop_valid_out[:k] = True

        if self.emit_uint8:
            out_img = np.empty((ch, cw, 3), np.uint8)
            out_img[:] = self._pad_pixel
            out_img[:nh, :nw] = img
        else:
            out_img = np.zeros((ch, cw, 3), np.float32)
            out_img[:nh, :nw] = (img.astype(np.float32) - self.mean) \
                / self.std

        g = self.max_gt
        n = min(len(boxes), g)
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_labels = np.zeros(g, np.int64)
        gt_valid = np.zeros(g, bool)
        gt_boxes[:n] = boxes[:n]
        gt_labels[:n] = ann_labels[:n]
        gt_valid[:n] = True

        out = {
            "image": out_img,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_valid": gt_valid,
            "img_shape": np.array([nh, nw], np.int32),
            "scale_factor": sf_out,
            "flip": np.bool_(flip),
        }
        if prop_out is not None:
            out["proposals"] = prop_out
            out["proposals_valid"] = prop_valid_out

        if self.with_mask:
            s = self.mask_stride
            mh, mw = ch // s, cw // s
            # rasterize only the n valid instances; the g-n padding slots
            # exist only in the (8x smaller) packed output — cuts the
            # per-sample mask-memory traffic ~8x at LVIS scale (g=100,
            # ~12 real objects)
            masks = np.zeros((n if self.pack_masks else g, mh, mw),
                             np.uint8)
            for i in range(n):
                segm = None if mask_bitmaps is not None \
                    else ann["segms"][i]
                if mask_bitmaps is not None:       # extras pre-rasterized
                    m = mask_bitmaps[i]
                elif segm is None:
                    x1, y1, x2, y2 = boxes[i].astype(int)
                    masks[i, y1 // s:y2 // s, x1 // s:x2 // s] = 1
                    continue
                elif isinstance(segm, (list, tuple)):
                    # polygon: rasterize DIRECTLY at stride resolution
                    # with scaled (+flipped) coords — PolygonMasks
                    # rescale semantics (mmdet structures.py:533 keeps
                    # polygons as polygons through resize); skips the two
                    # full-canvas nearest resizes of the bitmap path
                    # (the host-pipeline hot spot at LVIS scale)
                    for p in segm:
                        q = np.asarray(p, np.float32).reshape(-1, 2) \
                            * factor
                        if flip:
                            q[:, 0] = nw - q[:, 0]
                        cv2.fillPoly(
                            masks[i],
                            [np.round(q / s).astype(np.int32)], 1)
                    continue
                else:                              # RLE dict
                    m = segm_to_bitmap(segm, ann["height"], ann["width"])
                m = cv2.resize(m, (nw, nh),
                               interpolation=cv2.INTER_NEAREST)
                if flip:
                    m = m[:, ::-1]
                if s > 1:
                    m = cv2.resize(m, (nw // s, nh // s),
                                   interpolation=cv2.INTER_NEAREST)
                masks[i, :m.shape[0], :m.shape[1]] = m
            if self.pack_masks:
                # 8x smaller transfer; big-endian bit order — the device
                # unpack (detector.unpack_mask_bits) mirrors np.packbits
                packed = np.zeros((g, mh, (mw + 7) // 8), np.uint8)
                if n:
                    packed[:n] = np.packbits(masks, axis=-1)
                out["gt_masks_packed"] = packed
            else:
                out["gt_masks"] = masks

        if self.with_seg and "semantic_seg" in ann:
            sem = np.asarray(ann["semantic_seg"], np.uint8)
            ss = self.seg_stride
            sh, sw = max(nh // ss, 1), max(nw // ss, 1)
            sm = cv2.resize(sem, (sw, sh), interpolation=cv2.INTER_NEAREST)
            if flip:
                sm = sm[:, ::-1]
            canvas_sem = np.full((ch // ss, cw // ss), 255, np.uint8)
            canvas_sem[:sh, :sw] = sm
            out["gt_semantic_seg"] = canvas_sem.astype(np.int32)
        return out


class DetectionLoader:
    """Batches a CocoStyleDataset through the pipeline with repeat-factor
    + aspect-group epoch ordering. Yields host numpy batch dicts."""

    def __init__(self, dataset: CocoStyleDataset, pipeline: DetectionPipeline,
                 batch_size: int, oversample_thr: float = 0.0,
                 seed: int = 0, train: bool = True, num_workers: int = 8,
                 prefetch: int = 3):
        from iif_tpu.detection.datasets import (expand_indices_by_repeat,
                                                group_epoch_order,
                                                repeat_factors)

        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.seed = seed
        self.train = train
        self.epoch = 0
        # host-parallel decode+pipeline (the reference's DataLoader
        # num_workers; threads suffice — cv2 releases the GIL)
        self.num_workers = num_workers
        # producer-thread depth: batches built ahead of the consumer so the
        # host pipeline overlaps the device step (the reference hides
        # data_time under the iter via DataLoader worker prefetch,
        # mmdet/datasets/builder.py:84); 0 disables
        self.prefetch = prefetch
        if train and oversample_thr > 0:
            self.base_indices = expand_indices_by_repeat(
                repeat_factors(dataset, oversample_thr))
        else:
            self.base_indices = np.arange(len(dataset))
        self._group_order = group_epoch_order

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.base_indices) // self.batch_size

    def _load_image(self, idx: int) -> np.ndarray:
        import cv2

        path = self.dataset.image_path(idx)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def __iter__(self):
        """Prefetching iterator: ``_batches`` runs in a producer thread
        with a bounded queue so decode+pipeline for batch N+1..N+prefetch
        overlaps the device step on batch N. Worker exceptions re-raise in
        the consumer."""
        if self.prefetch <= 0:
            yield from self._batches()
            return
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=self.prefetch)
        _DONE, _ERR = object(), object()

        def _producer():
            try:
                for b in self._batches():
                    q.put(b)
                q.put(_DONE)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put((_ERR, e))

        t = threading.Thread(target=_producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield item

    def _batches(self):
        if self.train:
            order = self._group_order(self.dataset.flag[self.base_indices]
                                      if len(self.dataset.flag) else
                                      np.zeros(len(self.base_indices), np.uint8),
                                      np.arange(len(self.base_indices)),
                                      self.epoch, self.batch_size, self.seed)
            order = self.base_indices[order]
        else:
            order = self.base_indices
        from concurrent.futures import ThreadPoolExecutor

        base_rng = np.random.RandomState(self.seed + self.epoch)

        needs_mix = self.train and any(
            getattr(t, "num_mix", 0)
            for t in self.pipeline.extra_transforms)

        def _mix_fetch(rng, n):
            # MultiImageMixDataset.get_indexes + partner load
            # (dataset_wrappers.py:289-340): random co-samples as raw
            # bbox-level sample dicts
            out = []
            for _ in range(n):
                j = int(rng.randint(len(self.dataset)))
                ann_j = self.dataset.get_ann(j)
                out.append({"image": self._load_image(j),
                            "boxes": ann_j["boxes"].copy(),
                            "labels": np.asarray(ann_j["labels"]).copy()})
            return out

        buckets = self.pipeline.buckets if self.train else []
        multi_bucket = len(buckets) > 1

        with_props = (self.pipeline.max_proposals > 0
                      and getattr(self.dataset, "with_proposals", False))

        def _one(args):
            i, sample_seed, scale_idx = args
            img = self._load_image(int(i))
            ann = self.dataset.get_ann(int(i))
            props = (self.dataset.get_proposals(int(i))
                     if with_props else None)
            return self.pipeline(img, ann, np.random.RandomState(sample_seed),
                                 self.train,
                                 mix_fetch=_mix_fetch if needs_mix else None,
                                 scale_idx=scale_idx, proposals=props)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b0 in range(0, len(order) - self.batch_size + 1,
                            self.batch_size):
                idxs = order[b0:b0 + self.batch_size]
                seeds = base_rng.randint(0, 2 ** 31, size=len(idxs))
                if multi_bucket:
                    # canvas-homogeneous batch: pick the bucket with prob
                    # proportional to its scale count (keeps the marginal
                    # per-image scale distribution uniform), then sample
                    # each image's scale uniformly within the bucket
                    weights = np.array([len(b[1]) for b in buckets],
                                       np.float64)
                    bidx = base_rng.choice(len(buckets),
                                           p=weights / weights.sum())
                    scale_ids = base_rng.choice(buckets[bidx][1],
                                                size=len(idxs))
                else:
                    scale_ids = [None] * len(idxs)
                samples = list(pool.map(_one, zip(idxs, seeds, scale_ids)))
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                batch["image_ids"] = np.array(
                    [self.dataset.img_infos[int(i)]["id"] for i in idxs])
                yield batch
