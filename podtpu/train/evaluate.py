"""Evaluation loop: run detections over a loader, score with COCO metrics.

Counterpart of the reference's ``evaluate``
(`miso/object_detection/engine/engine.py:78-117`) minus its per-epoch
full-dataset COCO re-index (`engine/coco_utils.py:146-195` — a known perf
sink, SURVEY.md §"quirks"): ground truth is streamed straight from the
fixed-shape batches.  Detections and gt are mapped back to original image
coordinates (divide by the per-image fit-resize scale) before scoring, the
same frame in which torchvision's postprocess reports boxes.
"""
from __future__ import annotations

import time
from typing import List, Tuple

import numpy as np

from podtpu.core.logging import is_main_process
from podtpu.core.retry import with_transient_retry
from podtpu.train.coco_metrics import COCOEvaluator
from podtpu.train.step import split_eval_output


def evaluate(eval_step, params, frozen, loader, num_classes: int,
             verbose: bool = True) -> Tuple[COCOEvaluator, List[float]]:
    """Returns (evaluator, the 12 COCO stats).

    When the model predicts masks AND the loader's batches carry gt mask
    bitmaps, a segm evaluator runs alongside bbox (the reference's
    iou_types, `miso/object_detection/engine/engine.py:65-74`); its stats
    are exposed as ``evaluator.segm`` / ``evaluator.segm_stats``.
    """
    evaluator = COCOEvaluator(num_classes=num_classes)
    segm_eval = None
    kp_eval = None
    model_time = 0.0
    n_images = 0
    for batch, batch_valid in loader:
        t0 = time.time()
        out = with_transient_retry(eval_step, params, frozen,
                                   batch["image"], label="eval step")
        det, out_masks, out_kps = split_eval_output(out)
        has_masks = out_masks is not None
        det_np = {
            "boxes": np.asarray(det.boxes),
            "scores": np.asarray(det.scores),
            "labels": np.asarray(det.labels),
            "valid": np.asarray(det.valid),
        }
        do_segm = has_masks and "masks" in batch
        if do_segm:
            dt_masks = np.asarray(out_masks)  # [B, D, M, M] probabilities
            if segm_eval is None:
                segm_eval = COCOEvaluator(num_classes=num_classes,
                                          iou_type="segm")
        do_kps = out_kps is not None and "keypoints" in batch
        if do_kps:
            dt_kps = np.asarray(out_kps)  # [B, D, K, 3] (x, y, score)
            if kp_eval is None:
                kp_eval = COCOEvaluator(num_classes=num_classes,
                                        iou_type="keypoints")
        model_time += time.time() - t0
        for i, ok in enumerate(batch_valid):
            if not ok:
                continue
            scale = float(batch["scale"][i])
            gv = batch["valid"][i]
            dv = det_np["valid"][i]
            evaluator.update(
                gt_boxes=batch["boxes"][i][gv] / scale,
                gt_labels=batch["labels"][i][gv],
                dt_boxes=det_np["boxes"][i][dv] / scale,
                dt_scores=det_np["scores"][i][dv],
                dt_labels=det_np["labels"][i][dv],
            )
            if do_segm:
                dataset = getattr(loader, "dataset", None)
                if dataset is not None:
                    # Full-resolution segm eval (the reference RLE-encodes at
                    # full image resolution, `engine/coco_eval.py:110-114`):
                    # gt polygons rasterized at ORIGINAL pixels, predicted
                    # masks pasted at original pixels, both box-bounded so
                    # memory stays O(sum of box areas).  The stride-grid
                    # bitmaps remain the TRAINING loss targets only.
                    from podtpu.infer.masks import (paste_region_masks,
                                                    rasterize_region)
                    oh, ow = (int(v) for v in batch["original_size"][i])
                    meta = dataset.images[int(batch["index"][i])]
                    kept = [b for b in meta.boxes
                            if b.label in dataset.label_to_index]
                    kept = kept[:dataset.max_gt]
                    gm = [rasterize_region(b, oh, ow) for b in kept]
                    dm = paste_region_masks(
                        dt_masks[i][dv], det_np["boxes"][i][dv] / scale,
                        oh, ow)
                    area_scale = 1.0
                else:
                    from podtpu.infer.masks import paste_masks
                    gm = batch["masks"][i][gv] > 0.5      # [Gv, Hm, Wm]
                    hm, wm = gm.shape[-2:]
                    stride = batch["image"].shape[1] / hm
                    dm = paste_masks(dt_masks[i][dv],
                                     det_np["boxes"][i][dv] / stride,
                                     hm, wm) > 0.5
                    area_scale = (stride / scale) ** 2
                segm_eval.update(
                    gt_boxes=batch["boxes"][i][gv] / scale,
                    gt_labels=batch["labels"][i][gv],
                    dt_boxes=det_np["boxes"][i][dv] / scale,
                    dt_scores=det_np["scores"][i][dv],
                    dt_labels=det_np["labels"][i][dv],
                    gt_masks=gm, dt_masks=dm,
                    area_scale=area_scale,
                )
            if do_kps:
                gkp = batch["keypoints"][i][gv].astype(np.float64).copy()
                gkp[:, :, :2] /= scale
                dkp = dt_kps[i][dv].astype(np.float64).copy()
                dkp[:, :, :2] /= scale
                kp_eval.update(
                    gt_boxes=batch["boxes"][i][gv] / scale,
                    gt_labels=batch["labels"][i][gv],
                    dt_boxes=det_np["boxes"][i][dv] / scale,
                    dt_scores=det_np["scores"][i][dv],
                    dt_labels=det_np["labels"][i][dv],
                    gt_keypoints=gkp, dt_keypoints=dkp,
                )
            n_images += 1
    # Multi-host DP: every process evaluated its shard of the test set;
    # merge match results across processes before accumulating (the
    # reference's cross-rank COCO merge, coco_eval.py:161-190).
    import jax
    if jax.process_count() > 1:
        from podtpu.parallel.host import allgather_pickled
        gathered = allgather_pickled((evaluator, segm_eval, kp_eval))
        me = jax.process_index()
        for i, (ev, sg, kp) in enumerate(gathered):
            if i == me:
                continue
            evaluator.merge_from(ev)
            if sg is not None:
                # A process whose shard had no mask batches carries
                # segm_eval=None: adopt the first peer's so every process
                # reports identical segm stats.
                if segm_eval is None:
                    segm_eval = sg
                else:
                    segm_eval.merge_from(sg)
            if kp is not None:
                if kp_eval is None:
                    kp_eval = kp
                else:
                    kp_eval.merge_from(kp)
    stats = evaluator.summarize()
    evaluator.segm = segm_eval
    evaluator.segm_stats = segm_eval.summarize() if segm_eval else None
    evaluator.keypoints = kp_eval
    evaluator.keypoints_stats = kp_eval.summarize() if kp_eval else None
    if verbose and is_main_process():
        print(f"Evaluated {n_images} images "
              f"(model time {model_time:.2f}s)")
        print("IoU metric: bbox")
        print(evaluator.summary_text())
        if segm_eval is not None:
            print("IoU metric: segm")
            print(segm_eval.summary_text())
        if kp_eval is not None:
            print("IoU metric: keypoints")
            print(kp_eval.summary_text())
    return evaluator, stats
