"""Instance-mask structure API: ``BitmapMasks`` / ``PolygonMasks``.

Parity surface for the reference's ``mmdet/core/mask/structures.py:193``
(BitmapMasks) and ``:533`` (PolygonMasks) — the host-side mask containers
a pipeline author manipulates (rescale/resize/flip/pad/crop/
crop_and_resize/expand/translate/shear/rotate/areas/conversions).
The required-path functionality (RLE codec, rasterization, training
mask targets) lives in ``mask_utils.py`` / ``mask_head.py``; this module
completes the *structure* surface so reference pipelines port 1:1.

Implementation is repo-idiomatic rather than transcribed: whole-stack
vectorized numpy (the reference loops per mask), cv2 ``warpAffine`` for
the geometric warps (the reference's mmcv ``imtranslate``/``imshear``/
``imrotate`` are cv2 wrappers), and ``to_tensor`` returns a ``jnp``
array (device-side consumer is jax, not torch).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from iif_tpu.detection.mask_utils import polygons_to_bitmap


def _rescale_size(w: int, h: int, scale) -> Tuple[int, int]:
    """mmcv.rescale_size: scale is a factor or a (long, short) cap kept
    aspect-true. Returns (new_w, new_h)."""
    if isinstance(scale, (int, float)):
        f = float(scale)
    else:
        long_side, short_side = max(scale), min(scale)
        f = min(long_side / max(w, h), short_side / min(w, h))
    return int(w * f + 0.5), int(h * f + 0.5)


def _warp_stack(masks: np.ndarray, matrix: np.ndarray,
                out_shape: Tuple[int, int], fill_val,
                interpolation: str) -> np.ndarray:
    """cv2.warpAffine over an (N, H, W) stack, chunked to cv2's channel
    cap; nearest/bilinear supported, uint8-preserving."""
    import cv2

    interp = (cv2.INTER_NEAREST if interpolation == "nearest"
              else cv2.INTER_LINEAR)
    n = masks.shape[0]
    out_h, out_w = out_shape
    out = np.empty((n, out_h, out_w), masks.dtype)
    for lo in range(0, n, 256):
        chunk = masks[lo:lo + 256].transpose(1, 2, 0)
        warped = cv2.warpAffine(chunk, matrix[:2], (out_w, out_h),
                                flags=interp, borderValue=fill_val)
        if warped.ndim == 2:
            warped = warped[:, :, None]
        out[lo:lo + 256] = warped.transpose(2, 0, 1)
    return out


class BitmapMasks:
    """(N, H, W) uint8 instance masks (``structures.py:193-530``)."""

    def __init__(self, masks, height: int, width: int):
        self.height = int(height)
        self.width = int(width)
        if len(masks) == 0:
            self.masks = np.empty((0, self.height, self.width), np.uint8)
        else:
            masks = np.stack(masks) if isinstance(masks, list) \
                else np.asarray(masks)
            assert masks.ndim == 3 and masks.shape[1:] == (self.height,
                                                           self.width)
            self.masks = masks

    def __getitem__(self, index) -> "BitmapMasks":
        m = self.masks[index].reshape(-1, self.height, self.width)
        return BitmapMasks(m, self.height, self.width)

    def __iter__(self):
        return iter(self.masks)

    def __len__(self) -> int:
        return len(self.masks)

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(num_masks={len(self)}, "
                f"height={self.height}, width={self.width})")

    # ------------------------------------------------------------- geometry
    def rescale(self, scale, interpolation: str = "nearest"
                ) -> "BitmapMasks":
        new_w, new_h = _rescale_size(self.width, self.height, scale)
        return self.resize((new_h, new_w), interpolation)

    def resize(self, out_shape: Tuple[int, int],
               interpolation: str = "nearest") -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], *out_shape)
        import cv2

        interp = (cv2.INTER_NEAREST if interpolation == "nearest"
                  else cv2.INTER_LINEAR)
        out_h, out_w = out_shape
        n = len(self)
        out = np.empty((n, out_h, out_w), self.masks.dtype)
        for lo in range(0, n, 256):
            chunk = self.masks[lo:lo + 256].transpose(1, 2, 0)
            r = cv2.resize(chunk, (out_w, out_h), interpolation=interp)
            if r.ndim == 2:
                r = r[:, :, None]
            out[lo:lo + 256] = r.transpose(2, 0, 1)
        return BitmapMasks(out, out_h, out_w)

    def flip(self, flip_direction: str = "horizontal") -> "BitmapMasks":
        assert flip_direction in ("horizontal", "vertical", "diagonal")
        m = self.masks
        if flip_direction in ("horizontal", "diagonal"):
            m = m[:, :, ::-1]
        if flip_direction in ("vertical", "diagonal"):
            m = m[:, ::-1, :]
        return BitmapMasks(np.ascontiguousarray(m), self.height,
                           self.width)

    def pad(self, out_shape: Tuple[int, int], pad_val=0) -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], *out_shape)
        out_h, out_w = out_shape
        padded = np.full((len(self), out_h, out_w), pad_val,
                         self.masks.dtype)
        padded[:, :self.height, :self.width] = \
            self.masks[:, :out_h, :out_w]
        return BitmapMasks(padded, out_h, out_w)

    def crop(self, bbox: np.ndarray) -> "BitmapMasks":
        assert isinstance(bbox, np.ndarray) and bbox.ndim == 1
        bbox = bbox.copy()
        bbox[0::2] = np.clip(bbox[0::2], 0, self.width)
        bbox[1::2] = np.clip(bbox[1::2], 0, self.height)
        x1, y1, x2, y2 = bbox.astype(np.int64)
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)
        if len(self) == 0:
            return BitmapMasks([], h, w)
        return BitmapMasks(self.masks[:, y1:y1 + h, x1:x1 + w], h, w)

    def crop_and_resize(self, bboxes: np.ndarray,
                        out_shape: Tuple[int, int], inds: np.ndarray,
                        device=None, interpolation: str = "bilinear",
                        binarize: bool = True) -> "BitmapMasks":
        """Per-box aligned RoIAlign of the selected masks to
        ``out_shape`` (the reference runs mmcv ``roi_align`` with
        ``aligned=True``; here a vectorized numpy bilinear with the
        repo's static 2-tap sampling, ``ops/roi_align.py``)."""
        out_h, out_w = out_shape
        if len(self) == 0 or len(bboxes) == 0:
            return BitmapMasks([], out_h, out_w)
        sel = self.masks[inds].astype(np.float32)     # (R, H, W)
        r = len(bboxes)
        s = 2
        x1 = bboxes[:, 0] - 0.5
        y1 = bboxes[:, 1] - 0.5
        bw = (bboxes[:, 2] - bboxes[:, 0]) / out_w
        bh = (bboxes[:, 3] - bboxes[:, 1]) / out_h
        iy = (np.arange(out_h * s) + 0.5) / s
        ix = (np.arange(out_w * s) + 0.5) / s
        ys = np.clip(y1[:, None] + bh[:, None] * iy[None, :], 0,
                     self.height - 1)
        xs = np.clip(x1[:, None] + bw[:, None] * ix[None, :], 0,
                     self.width - 1)
        y0 = np.floor(ys).astype(np.int64)
        x0 = np.floor(xs).astype(np.int64)
        y1i = np.minimum(y0 + 1, self.height - 1)
        x1i = np.minimum(x0 + 1, self.width - 1)
        ly = (ys - y0)[:, :, None]
        lx = (xs - x0)[:, None, :]
        ridx = np.arange(r)[:, None, None]
        v00 = sel[ridx, y0[:, :, None], x0[:, None, :]]
        v01 = sel[ridx, y0[:, :, None], x1i[:, None, :]]
        v10 = sel[ridx, y1i[:, :, None], x0[:, None, :]]
        v11 = sel[ridx, y1i[:, :, None], x1i[:, None, :]]
        taps = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
                + v10 * ly * (1 - lx) + v11 * ly * lx)
        vals = taps.reshape(r, out_h, s, out_w, s).mean(axis=(2, 4))
        if binarize:
            vals = (vals >= 0.5).astype(np.uint8)
        return BitmapMasks(vals.astype(self.masks.dtype
                                       if binarize else np.float32),
                           out_h, out_w)

    def expand(self, expanded_h: int, expanded_w: int, top: int,
               left: int) -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], expanded_h, expanded_w)
        out = np.zeros((len(self), expanded_h, expanded_w),
                       self.masks.dtype)
        out[:, top:top + self.height, left:left + self.width] = self.masks
        return BitmapMasks(out, expanded_h, expanded_w)

    def translate(self, out_shape: Tuple[int, int], offset,
                  direction: str = "horizontal", fill_val=0,
                  interpolation: str = "bilinear") -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], *out_shape)
        dx, dy = (offset, 0) if direction == "horizontal" else (0, offset)
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        return BitmapMasks(
            _warp_stack(self.masks, m, out_shape, fill_val,
                        interpolation), *out_shape)

    def shear(self, out_shape: Tuple[int, int], magnitude,
              direction: str = "horizontal", border_value=0,
              interpolation: str = "bilinear") -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], *out_shape)
        if direction == "horizontal":
            m = np.float32([[1, magnitude, 0], [0, 1, 0]])
        else:
            m = np.float32([[1, 0, 0], [magnitude, 1, 0]])
        return BitmapMasks(
            _warp_stack(self.masks, m, out_shape, border_value,
                        interpolation), *out_shape)

    def rotate(self, out_shape: Tuple[int, int], angle,
               center: Optional[Tuple[float, float]] = None,
               scale: float = 1.0, fill_val=0) -> "BitmapMasks":
        if len(self) == 0:
            return BitmapMasks([], *out_shape)
        import cv2

        if center is None:
            center = ((self.width - 1) * 0.5, (self.height - 1) * 0.5)
        # mmcv.imrotate negates the angle before warpAffine; keep that
        # convention so bitmap and polygon rotations agree
        m = cv2.getRotationMatrix2D(center, -angle, scale)
        return BitmapMasks(
            _warp_stack(self.masks, m, out_shape, fill_val, "bilinear"),
            *out_shape)

    # ---------------------------------------------------------- conversions
    @property
    def areas(self) -> np.ndarray:
        return self.masks.sum((1, 2))

    def to_ndarray(self) -> np.ndarray:
        return self.masks

    def to_tensor(self, dtype=None, device=None):
        """jnp array (the TPU-native consumer; reference returns torch)."""
        import jax.numpy as jnp

        return jnp.asarray(self.masks, dtype)

    @classmethod
    def random(cls, num_masks: int = 3, height: int = 32,
               width: int = 32, dtype=np.uint8, rng=None) -> "BitmapMasks":
        rng = rng or np.random.RandomState(0)
        masks = (rng.rand(num_masks, height, width) > 0.6).astype(dtype)
        return cls(masks, height, width)


class PolygonMasks:
    """Per-instance polygon lists (``structures.py:533-1023``); each mask
    is a list of flat [x0, y0, x1, y1, ...] float arrays."""

    def __init__(self, masks: Sequence[Sequence[np.ndarray]],
                 height: int, width: int):
        self.height = int(height)
        self.width = int(width)
        self.masks = [[np.asarray(p, np.float32) for p in obj]
                      for obj in masks]

    def __getitem__(self, index) -> "PolygonMasks":
        if isinstance(index, np.ndarray):
            index = index.tolist()
        if isinstance(index, list):
            masks = [self.masks[i] for i in index]
        else:
            try:
                masks = self.masks[index]
            except Exception:
                raise ValueError(f"unsupported index {index!r}")
            if isinstance(masks, list) and (
                    not masks or isinstance(masks[0], np.ndarray)):
                masks = [masks]
        return PolygonMasks(masks, self.height, self.width)

    def __iter__(self):
        return iter(self.masks)

    def __len__(self) -> int:
        return len(self.masks)

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(num_masks={len(self)}, "
                f"height={self.height}, width={self.width})")

    def _map(self, fn, height: int, width: int) -> "PolygonMasks":
        """Apply ``fn(flat_xy) -> flat_xy`` to every polygon."""
        return PolygonMasks([[fn(p.copy()) for p in obj]
                             for obj in self.masks], height, width)

    # ------------------------------------------------------------- geometry
    def rescale(self, scale, interpolation=None) -> "PolygonMasks":
        new_w, new_h = _rescale_size(self.width, self.height, scale)
        return self.resize((new_h, new_w))

    def resize(self, out_shape: Tuple[int, int], interpolation=None
               ) -> "PolygonMasks":
        h_scale = out_shape[0] / self.height
        w_scale = out_shape[1] / self.width

        def _f(p):
            p[0::2] *= w_scale
            p[1::2] *= h_scale
            return p

        return self._map(_f, *out_shape)

    def flip(self, flip_direction: str = "horizontal") -> "PolygonMasks":
        assert flip_direction in ("horizontal", "vertical", "diagonal")

        def _f(p):
            if flip_direction in ("horizontal", "diagonal"):
                p[0::2] = self.width - p[0::2]
            if flip_direction in ("vertical", "diagonal"):
                p[1::2] = self.height - p[1::2]
            return p

        return self._map(_f, self.height, self.width)

    def crop(self, bbox: np.ndarray) -> "PolygonMasks":
        assert isinstance(bbox, np.ndarray) and bbox.ndim == 1
        bbox = bbox.copy()
        bbox[0::2] = np.clip(bbox[0::2], 0, self.width)
        bbox[1::2] = np.clip(bbox[1::2], 0, self.height)
        x1, y1, x2, y2 = bbox
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)

        def _f(p):
            p[0::2] -= x1
            p[1::2] -= y1
            return p

        return self._map(_f, h, w)

    def pad(self, out_shape: Tuple[int, int], pad_val=0
            ) -> "PolygonMasks":
        return PolygonMasks(self.masks, *out_shape)

    def expand(self, *args, **kwargs):
        raise NotImplementedError(
            "expand is undefined for polygons (matches the reference)")

    def crop_and_resize(self, bboxes: np.ndarray,
                        out_shape: Tuple[int, int], inds: np.ndarray,
                        device=None, interpolation: str = "bilinear",
                        binarize: bool = True) -> "PolygonMasks":
        out_h, out_w = out_shape
        if len(self) == 0:
            return PolygonMasks([], out_h, out_w)
        if not binarize:
            raise ValueError("polygons are always binary")
        out = []
        for i in range(len(bboxes)):
            x1, y1, x2, y2 = bboxes[i, :4]
            w = max(x2 - x1, 1)
            h = max(y2 - y1, 1)
            w_scale = out_w / max(w, 0.1)
            h_scale = out_h / max(h, 0.1)
            obj = []
            for p in self.masks[inds[i]]:
                p = p.copy()
                p[0::2] = (p[0::2] - x1) * w_scale
                p[1::2] = (p[1::2] - y1) * h_scale
                obj.append(p)
            out.append(obj)
        return PolygonMasks(out, out_h, out_w)

    def translate(self, out_shape: Tuple[int, int], offset,
                  direction: str = "horizontal", fill_val=None,
                  interpolation=None) -> "PolygonMasks":
        assert fill_val is None or fill_val == 0

        def _f(p):
            if direction == "horizontal":
                p[0::2] = np.clip(p[0::2] + offset, 0, out_shape[1])
            else:
                p[1::2] = np.clip(p[1::2] + offset, 0, out_shape[0])
            return p

        return self._map(_f, *out_shape)

    def shear(self, out_shape: Tuple[int, int], magnitude,
              direction: str = "horizontal", border_value=0,
              interpolation: str = "bilinear") -> "PolygonMasks":
        if direction == "horizontal":
            mat = np.float32([[1, magnitude], [0, 1]])
        else:
            mat = np.float32([[1, 0], [magnitude, 1]])

        def _f(p):
            xy = mat @ np.stack([p[0::2], p[1::2]])
            p[0::2] = np.clip(xy[0], 0, out_shape[1])
            p[1::2] = np.clip(xy[1], 0, out_shape[0])
            return p

        return self._map(_f, *out_shape)

    def rotate(self, out_shape: Tuple[int, int], angle,
               center: Optional[Tuple[float, float]] = None,
               scale: float = 1.0, fill_val=0) -> "PolygonMasks":
        import cv2

        if center is None:
            center = ((self.width - 1) * 0.5, (self.height - 1) * 0.5)
        # the reference rotates coordinates with -angle so the raster
        # effect matches BitmapMasks.rotate(angle)
        mat = cv2.getRotationMatrix2D(center, -angle, scale)

        def _f(p):
            coords = np.stack([p[0::2], p[1::2], np.ones(len(p) // 2)])
            xy = mat @ coords
            p[0::2] = np.clip(xy[0], 0, out_shape[1])
            p[1::2] = np.clip(xy[1], 0, out_shape[0])
            return p

        return self._map(_f, *out_shape)

    # ---------------------------------------------------------- conversions
    def to_bitmap(self) -> BitmapMasks:
        return BitmapMasks(self.to_ndarray(), self.height, self.width)

    @property
    def areas(self) -> np.ndarray:
        """Shoelace area per instance (sum over components)."""
        out = []
        for obj in self.masks:
            a = 0.0
            for p in obj:
                x, y = p[0::2], p[1::2]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1))
                               - np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out)

    def to_ndarray(self) -> np.ndarray:
        if len(self) == 0:
            return np.empty((0, self.height, self.width), np.uint8)
        return np.stack([
            polygons_to_bitmap(obj, self.height, self.width)
            for obj in self.masks]).astype(np.uint8)

    def to_tensor(self, dtype=None, device=None):
        import jax.numpy as jnp

        return jnp.asarray(self.to_ndarray(), dtype)

    @classmethod
    def random(cls, num_masks: int = 3, height: int = 32,
               width: int = 32, n_verts: int = 5, dtype=np.float32,
               rng=None) -> "PolygonMasks":
        rng = rng or np.random.RandomState(0)
        masks = []
        for _ in range(num_masks):
            ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
            rad = rng.uniform(0.2, 0.45, n_verts)
            cx, cy = rng.uniform(0.3, 0.7, 2)
            xs = np.clip(cx + rad * np.cos(ang), 0, 1) * width
            ys = np.clip(cy + rad * np.sin(ang), 0, 1) * height
            masks.append([np.stack([xs, ys], 1).reshape(-1)
                          .astype(dtype)])
        return cls(masks, height, width)
