"""Host-side detection dataset: decode, fit-resize, pad, fixed-shape targets.

Counterpart of the reference's torch dataset adapter
(`miso/object_detection/dataset/dataset.py:9-51`): images are PIL-decoded and
RGB-converted (:18), boxes become xyxy float targets (:20-24), and labels are
1-based indices into ``project.label_names`` with background=0 (:21).

TPU-first differences (SURVEY.md §7 "hard part (1)"): instead of
variable-sized tensors per image, every sample is fit-resized
(aspect-preserving) onto a fixed canvas and padded bottom/right, and targets
are fixed-capacity ``[max_gt]`` arrays with a validity mask — the shapes XLA
compiles against never change.  The resize scale is kept so detections can be
mapped back to original image coordinates.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from podtpu.data.project import Project
from podtpu.data.imageio import pil_to_rgb


@dataclass
class Sample:
    image: np.ndarray        # [H, W, 3] float32 in [0,1], canvas-sized
    boxes: np.ndarray        # [G, 4] float32 xyxy, canvas coords
    labels: np.ndarray       # [G] int32, 1-based; 0 on invalid slots
    valid: np.ndarray        # [G] bool
    scale: float             # canvas px per original px
    original_size: Tuple[int, int]  # (h, w)
    index: int
    masks: Optional[np.ndarray] = None  # [G, H/ms, W/ms] float32 bitmaps
    # [G, K, 3] float32 (x, y, visibility) in canvas coords (Keypoint R-CNN
    # targets; visibility 0 also marks padded slots).
    keypoints: Optional[np.ndarray] = None
    # False when the image failed to decode: the sample is a zero canvas
    # with no gt, and the loader folds it into batch_valid so training and
    # evaluation ignore it (the reference skips unreadable images with a
    # print at project load, `cvat_web_api.py:231-233`; this extends the
    # same policy to decode-time failures instead of crashing the run).
    ok: bool = True


def fit_resize(image: np.ndarray, canvas: Tuple[int, int]):
    """Aspect-preserving resize so the image fits the canvas; returns the
    resized array and the scale factor."""
    h, w = image.shape[:2]
    ch, cw = canvas
    scale = min(ch / h, cw / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    try:
        import cv2
        interp = cv2.INTER_LINEAR if scale >= 1 else cv2.INTER_AREA
        resized = cv2.resize(image, (nw, nh), interpolation=interp)
    except ImportError:  # pragma: no cover - cv2 is present in this image
        resized = np.asarray(
            Image.fromarray(image).resize((nw, nh), Image.BILINEAR))
    return resized, scale


class DetectionDataset:
    """Fixed-shape samples from a :class:`Project`."""

    def __init__(
        self,
        project: Project,
        image_size: Tuple[int, int] = (1024, 1024),
        max_gt: int = 100,
        label_names: Optional[Sequence[str]] = None,
        with_masks: bool = False,
        mask_stride: int = 8,
        with_keypoints: bool = False,
        num_keypoints: int = 17,
        cache: object = "auto",
        cache_budget_bytes: Optional[int] = None,
    ):
        self.project = project
        self.images = list(project.image_dict.values())
        self.image_size = tuple(image_size)
        self.max_gt = max_gt
        # Mask R-CNN targets: per-gt bitmaps at 1/mask_stride canvas
        # resolution, rasterized from polygon annotations (rectangles fall
        # back to filled boxes).
        self.with_masks = with_masks
        self.mask_stride = mask_stride
        # Keypoint R-CNN targets: per-gt (x, y, visibility) triples from
        # annotations carrying a COCO-style ``keypoints`` list; instances
        # without one get all-invisible rows (they still train the box
        # head, contribute nothing to the keypoint loss).
        self.with_keypoints = with_keypoints
        self.num_keypoints = num_keypoints
        # Label -> 1-based index (background = 0), same convention as the
        # reference (`dataset.py:21`).
        names = list(label_names) if label_names is not None \
            else list(project.label_names)
        self.label_names = names
        self.label_to_index = {n: i + 1 for i, n in enumerate(names)}
        # Decoded-canvas cache.  Samples are deterministic per index
        # (augmentation is device-side in the jitted step), so after the
        # first epoch the host pipeline can skip JPEG decode entirely —
        # the dominant loader cost on CPU-poor hosts (the reference
        # re-decodes every epoch through its DataLoader workers,
        # `miso/object_detection/training.py:64-83`).  ``cache``:
        # True / False / "auto" (enable when the whole dataset fits
        # ``cache_budget_bytes``, default 2 GiB or $PODTPU_CACHE_BYTES).
        import os as _os

        budget = cache_budget_bytes if cache_budget_bytes is not None else \
            int(_os.environ.get("PODTPU_CACHE_BYTES", 2 << 30))
        ch, cw = self.image_size
        per_sample = ch * cw * 3 + max_gt * 16
        if with_masks:
            per_sample += max_gt * (ch // mask_stride) * (cw // mask_stride) * 4
        fits = len(self.images) * per_sample <= budget
        enabled = (cache is True) or (cache == "auto" and fits)
        self._cache: Optional[Dict[int, Sample]] = {} if enabled else None
        self._warned: set = set()

    def __len__(self) -> int:
        return len(self.images)

    def _failed(self, meta, i) -> Sample:
        if meta.full_path not in self._warned:
            self._warned.add(meta.full_path)
            print(f"[podtpu] could not decode {meta.full_path}; "
                  "skipping image")
        ch, cw = self.image_size
        g = self.max_gt
        mh, mw = ch // self.mask_stride, cw // self.mask_stride
        return Sample(
            image=np.zeros((ch, cw, 3), np.uint8),
            boxes=np.zeros((g, 4), np.float32),
            labels=np.zeros((g,), np.int32),
            valid=np.zeros((g,), bool), scale=1.0, original_size=(ch, cw),
            index=i, ok=False,
            masks=np.zeros((g, mh, mw), np.float32) if self.with_masks
            else None,
            keypoints=np.zeros((g, self.num_keypoints, 3), np.float32)
            if self.with_keypoints else None)

    def load(self, i: int) -> Sample:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        meta = self.images[i]
        try:
            with Image.open(meta.full_path) as im:
                arr = pil_to_rgb(im)
        except Exception:
            sample = self._failed(meta, i)
            if self._cache is not None:
                self._cache[i] = sample
            return sample
        orig_h, orig_w = arr.shape[:2]
        resized, scale = fit_resize(arr, self.image_size)
        ch, cw = self.image_size
        # Canvases stay uint8: 4x fewer bytes over the host->device link;
        # the jitted steps convert to [0,1] float on device.
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        sample = self._finish(meta, canvas, scale, (orig_h, orig_w), i)
        if self._cache is not None:
            self._cache[i] = sample
        return sample

    def _finish(self, meta, canvas, scale, original_size, i) -> Sample:
        ch, cw = self.image_size
        g = self.max_gt
        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        kept = [b for b in meta.boxes if b.label in self.label_to_index][:g]
        for j, box in enumerate(kept):
            x1, y1, x2, y2 = box.coords
            boxes[j] = np.array([x1, y1, x2, y2]) * scale
            labels[j] = self.label_to_index[box.label]
            valid[j] = True
        np.clip(boxes[:, 0::2], 0, cw, out=boxes[:, 0::2])
        np.clip(boxes[:, 1::2], 0, ch, out=boxes[:, 1::2])
        masks = None
        if self.with_masks:
            mh, mw = ch // self.mask_stride, cw // self.mask_stride
            masks = np.zeros((g, mh, mw), np.float32)
            mscale = scale / self.mask_stride
            for j, box in enumerate(kept):
                if hasattr(box, "rasterize"):
                    masks[j] = box.rasterize(mh, mw, scale=mscale)
                else:  # rectangle: filled box
                    x1, y1, x2, y2 = (np.asarray(box.coords) * mscale)
                    masks[j,
                          int(max(y1, 0)): int(min(np.ceil(y2), mh)),
                          int(max(x1, 0)): int(min(np.ceil(x2), mw))] = 1.0
        keypoints = None
        if self.with_keypoints:
            k = self.num_keypoints
            keypoints = np.zeros((g, k, 3), np.float32)
            for j, box in enumerate(kept):
                kp = getattr(box, "keypoints", None)
                if not kp:
                    continue
                arr = np.asarray(kp, np.float32).reshape(-1, 3)[:k]
                arr = arr.copy()
                arr[:, :2] *= scale
                # Points scaled off the canvas become invisible.
                off = ((arr[:, 0] < 0) | (arr[:, 0] >= cw)
                       | (arr[:, 1] < 0) | (arr[:, 1] >= ch))
                arr[off, 2] = 0.0
                keypoints[j, : arr.shape[0]] = arr
        return Sample(image=canvas, boxes=boxes, labels=labels, valid=valid,
                      scale=scale, original_size=tuple(original_size),
                      index=i, masks=masks, keypoints=keypoints)

    def load_batch(self, indices) -> List[Sample]:
        """Batch load; uses the native C++ threaded decode pipeline when
        available (podtpu/core/native.py), falling back to per-sample PIL.
        Cached samples skip decode entirely."""
        from podtpu.core import native

        indices = [int(i) for i in indices]
        todo = indices if self._cache is None else \
            [i for i in indices if i not in self._cache]
        fresh: Dict[int, Sample] = {}
        if todo:
            metas = [self.images[i] for i in todo]
            paths = [m.full_path for m in metas]
            res = native.decode_resize_batch(paths, self.image_size)
            if res is None:
                for i in todo:
                    fresh[i] = self.load(i)
            else:
                canvases, scales, orig_hw = res
                for j, (meta, idx) in enumerate(zip(metas, todo)):
                    fresh[idx] = self._finish(
                        meta, canvases[j], float(scales[j]),
                        (int(orig_hw[j, 0]), int(orig_hw[j, 1])), idx)
                if self._cache is not None:
                    self._cache.update(fresh)
        return [fresh[i] if i in fresh else self._cache[i] for i in indices]


def train_test_split(
    n: int, fraction: float = 0.2, seed: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Random split: last ``fraction`` of a seeded permutation is the test
    set — the reference's scheme (`miso/object_detection/training.py:53-57`,
    fixed seed 1, 20% test; SURVEY.md notes the test images come from the
    same tasks)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = int(fraction * n)
    if k == 0:
        return perm, perm[:0]
    return perm[:-k], perm[-k:]


def collate(samples: Sequence[Sample]) -> Dict[str, np.ndarray]:
    """Stack samples into one fixed-shape batch dict."""
    batch = {
        "image": np.stack([s.image for s in samples]),
        "boxes": np.stack([s.boxes for s in samples]),
        "labels": np.stack([s.labels for s in samples]),
        "valid": np.stack([s.valid for s in samples]),
        "scale": np.asarray([s.scale for s in samples], np.float32),
        "original_size": np.asarray([s.original_size for s in samples],
                                    np.int32),
        "index": np.asarray([s.index for s in samples], np.int32),
    }
    if samples[0].masks is not None:
        batch["masks"] = np.stack([s.masks for s in samples])
    if samples[0].keypoints is not None:
        batch["keypoints"] = np.stack([s.keypoints for s in samples])
    return batch
