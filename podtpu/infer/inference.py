"""Batch inference drivers: auto-annotate a project or a directory.

Counterpart of the reference's inference module
(`miso/object_detection/inference.py:16-131`) with the same contract:

* ``infer``: optional ``_NV`` label suffix (:22-23), ensure labels exist in
  the project (:24-26), keep only images with zero annotations (:35), batch
  forward, per image keep ``score > threshold`` boxes and emit
  ``RectangleAnnotation(x, y, w, h)`` labelled ``model_labels[label - 1]``
  (:54-62); returns a NEW project containing only the detections.
* ``infer_directory``: builds the project by rglob over
  jpg/jpeg/png/bmp/tiff/tif (:78-88) then runs the same loop.

TPU-first: a single jitted static-shape forward per batch; detections are
produced in canvas coordinates and mapped back to original pixels with the
per-image fit-resize scale (torchvision does this inside
GeneralizedRCNNTransform.postprocess).
"""
from __future__ import annotations

import copy
from pathlib import Path
from typing import List, Optional

import numpy as np

from podtpu.data.dataset import DetectionDataset
from podtpu.data.image import ImageMetadata
from podtpu.data.loader import Loader
from podtpu.data.project import Project
from podtpu.data.annotation import RectangleAnnotation
from podtpu.models.detector import make_detector
from podtpu.train.checkpoints import load_model
from podtpu.train.step import make_eval_step, split_eval_output

IMAGE_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}


def load_inference_model(model_dir: str):
    """Load a saved model directory -> (eval_step, params, frozen, cfg, labels)."""
    import jax

    params, frozen, model_cfg, labels = load_model(model_dir)
    # Commit weights to the accelerator once: numpy params passed to a jit
    # are re-uploaded on EVERY call (hundreds of per-leaf transfers per
    # batch on remote-TPU setups).
    params, frozen = jax.device_put((params, frozen), jax.devices()[0])
    model = make_detector(model_cfg)
    return make_eval_step(model), params, frozen, model_cfg, labels


def _run_inference(project: Project, model_dir: str,
                   model_labels: Optional[List[str]],
                   threshold: float, batch_size: int, nv: bool,
                   num_workers: int = 4) -> Project:
    eval_step, params, frozen, model_cfg, saved_labels = \
        load_inference_model(model_dir)
    if model_labels is None:
        model_labels = saved_labels
    if nv:
        model_labels = [label + "_NV" for label in model_labels]
    for label in model_labels:
        project.add_label(None, label, None)

    project = copy.deepcopy(project)
    project.remove_labelled_images()

    # Single pass over the images: the decoded-canvas cache would only
    # burn memory here.
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=model_labels, cache=False)
    loader = Loader(dataset, batch_size, shuffle=False,
                    num_workers=num_workers)

    out = Project()
    out.task_names = dict(project.task_names)
    for batch, batch_valid in loader:
        result = eval_step(params, frozen, batch["image"])
        det, res_masks, res_kps = split_eval_output(result)
        has_masks = res_masks is not None
        dt_masks = np.asarray(res_masks) if has_masks else None
        dt_kps = np.asarray(res_kps) if res_kps is not None else None
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        for i, ok in enumerate(batch_valid):
            if not ok:
                continue
            meta = dataset.images[int(batch["index"][i])]
            scale = float(batch["scale"][i])
            keep = valid[i] & (scores[i] > threshold)
            keep_idx = np.flatnonzero(keep)
            for j, b, s, l in zip(keep_idx, boxes[i][keep] / scale,
                                  scores[i][keep], labels[i][keep]):
                ann = None
                if dt_masks is not None:
                    # Mask models emit polygon contours (the reference's
                    # infer drops masks entirely; CVAT accepts polygons).
                    ann = _mask_to_annotation(
                        dt_masks[i][j], b, model_labels[int(l) - 1],
                        float(s))
                if ann is None:
                    ann = RectangleAnnotation(
                        float(b[0]), float(b[1]),
                        float(b[2] - b[0]), float(b[3] - b[1]),
                        model_labels[int(l) - 1], score=float(s))
                if dt_kps is not None and isinstance(
                        ann, RectangleAnnotation):
                    # Keypoint models attach (x, y, score) triples in
                    # original-image coordinates (the CVAT rectangle
                    # upload has no keypoint channel; the data rides the
                    # annotation object for crop/export consumers).
                    kp = dt_kps[i][j].copy()
                    kp[:, :2] /= scale
                    ann.keypoints = [tuple(float(v) for v in row)
                                     for row in kp]
                meta.boxes.append(ann)
            out.add_image(meta)
    return out


def _mask_to_annotation(mask: np.ndarray, box_orig: np.ndarray, label: str,
                        score: float, max_grid: int = 256):
    """Predicted box-local mask -> PolygonAnnotation in original-image
    coordinates (largest connected component); None if the mask is empty."""
    from podtpu.data.annotation import PolygonAnnotation
    from podtpu.infer.masks import mask_to_polygons, paste_mask

    x0, y0, x1, y1 = [float(v) for v in box_orig]
    bw, bh = x1 - x0, y1 - y0
    if bw <= 0 or bh <= 0:
        return None
    # Trace on a local grid at roughly original-pixel resolution (capped).
    gw = int(np.clip(np.ceil(bw), 2, max_grid))
    gh = int(np.clip(np.ceil(bh), 2, max_grid))
    local = paste_mask(mask, np.array([0.0, 0.0, gw, gh]), gh, gw)
    polys = mask_to_polygons(local)
    if not polys:
        return None
    poly = polys[0]
    xs = x0 + (poly[:, 0] + 0.5) * bw / gw
    ys = y0 + (poly[:, 1] + 0.5) * bh / gh
    return PolygonAnnotation(xs.tolist(), ys.tolist(), label, score=score)


def infer(project: Project,
          model_path: str,
          model_labels: Optional[List[str]] = None,
          threshold: float = 0.5,
          batch_size: int = 2,
          nv: bool = False,
          num_workers: int = 4) -> Project:
    """Auto-annotate the unlabelled images of ``project``.

    ``model_path`` may be the model directory or any file inside it (the
    reference passes ``.../model.pt``; we accept ``.../model.msgpack`` too).
    """
    model_dir = _as_model_dir(model_path)
    return _run_inference(project, model_dir, model_labels, threshold,
                          batch_size, nv, num_workers)


def infer_directory(input_dir: str,
                    model_path: str,
                    model_labels: Optional[List[str]] = None,
                    threshold: float = 0.5,
                    batch_size: int = 2,
                    num_workers: int = 4) -> Project:
    """Auto-annotate every image file under ``input_dir`` (recursive)."""
    p = Path(input_dir)
    if not p.exists():
        raise ValueError(f"Directory does not exist: {input_dir}")
    filepaths = [path for path in sorted(p.rglob("*.*"))
                 if path.suffix.lower() in IMAGE_SUFFIXES]
    project = Project()
    for i, filepath in enumerate(filepaths):
        project.add_image(ImageMetadata(str(filepath), "/", 0, i))
    model_dir = _as_model_dir(model_path)
    return _run_inference(project, model_dir, model_labels, threshold,
                          batch_size, nv=False, num_workers=num_workers)


def _as_model_dir(model_path: str) -> str:
    p = Path(model_path)
    return str(p.parent) if p.suffix else str(p)
