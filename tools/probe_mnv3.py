"""Root-cause instrumentation for the mobilenet_v3_fpn hard-task zero
(round-4 `conv_hard_mnv3.log`: 0.000 on every stat, AR included, at the
1024 canvas — while the same family reaches 0.45 AP50 0.855 on the easy
512 task and every ResNet-FPN family clears 0.74 on this exact task).

Two probes, both host-side-runnable (CPU):

1. ANCHOR COVERAGE (no checkpoint needed): per-gt max IoU against the
   family's anchor grid on the hard task at 1024, next to the flagship's
   grid for contrast — quantifies whether the (32, 32, 64)-stride
   pyramid can even assign RPN positives on this object-scale mix
   (the mnv2 probe's method, `tools/probe_mobilenet_v2.py`).

2. PROPOSAL RECALL (takes a trained model dir, e.g. the
   tools/diagnose_mnv3.py output): run backbone+RPN only
   (``return_proposals=True``, the detector's debugging surface) on a
   few train images and measure gt recall@IoU{0.3,0.5} of the top-k
   proposals, plus objectness score separation — decisively localises
   the failure to RPN ranking vs downstream RoI stages.

Run:  python tools/probe_mnv3.py [model_dir]
"""
import sys
import tempfile

import numpy as np

from podtpu.core.config import ModelConfig, mobilenet_v3_fpn_config
from podtpu.data.dataset import DetectionDataset
from podtpu.ops.anchors import grid_anchors
from tests.synthetic import HARD_CLASSES, make_hard_project
from tools.probe_mobilenet_v2 import iou_np

CANVAS = 1024


def coverage(tag, cfg, dataset):
    anchors = np.concatenate(grid_anchors(
        tuple(cfg.image_size), tuple(cfg.strides), tuple(cfg.anchor_sizes),
        tuple(cfg.anchor_ratios)))
    max_ious, cells, sizes = [], [], []
    for i in range(min(len(dataset), 24)):
        s = dataset.load(i)
        gt = s.boxes[s.valid]
        if not len(gt):
            continue
        max_ious.extend(iou_np(gt, anchors).max(1))
        ext = np.maximum(gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1])
        sizes.extend(ext)
        cells.extend(ext / min(cfg.strides))
    max_ious, cells = np.asarray(max_ious), np.asarray(cells)
    sizes = np.asarray(sizes)
    print(f"[{tag}] strides={cfg.strides} {len(max_ious)} gts "
          f"(extent p10/p50/p90 = {np.percentile(sizes, 10):.0f}/"
          f"{np.percentile(sizes, 50):.0f}/{np.percentile(sizes, 90):.0f} px)")
    print(f"  anchor max-IoU: mean {max_ious.mean():.3f}  "
          f"p10 {np.percentile(max_ious, 10):.3f}  "
          f"frac>=0.7 (RPN positive) {(max_ious >= 0.7).mean():.3f}  "
          f"frac<0.3 (unmatchable) {(max_ious < 0.3).mean():.3f}")
    print(f"  extent in finest-stride cells: mean {cells.mean():.2f}  "
          f"frac<2 {(cells < 2).mean():.3f}", flush=True)


def proposal_recall(model_dir, dataset, num_images=8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from podtpu.models.detector import make_detector
    from podtpu.train.checkpoints import load_model

    params, frozen, model_cfg, labels = load_model(model_dir)
    model = make_detector(model_cfg)

    def fwd(images):
        return model.apply({"params": params, "frozen": frozen}, images,
                           train=False, return_proposals=True)

    fwd = jax.jit(fwd)
    recalls3, recalls5, seps = [], [], []
    for i in range(num_images):
        s = dataset.load(i)
        gt = s.boxes[s.valid]
        if not len(gt):
            continue
        props = fwd(s.image[None])
        boxes = np.asarray(props.boxes[0])
        valid = np.asarray(props.valid[0]).astype(bool)
        scores = np.asarray(props.scores[0])
        boxes = boxes[valid]
        ious = iou_np(gt, boxes)
        best = ious.max(1) if boxes.size else np.zeros(len(gt))
        recalls3.append((best >= 0.3).mean())
        recalls5.append((best >= 0.5).mean())
        # Objectness separation: do proposals NEAR a gt score higher than
        # the rest?  (logit mean difference)
        if boxes.size:
            near = ious.max(0) >= 0.5
            sc = scores[valid]
            if near.any() and (~near).any():
                seps.append(sc[near].mean() - sc[~near].mean())
        print(f"  img {i}: {len(gt)} gts, {valid.sum()} proposals, "
              f"recall@0.5 {(best >= 0.5).mean():.3f}", flush=True)
    print(f"[proposal-recall {model_dir}]")
    print(f"  mean gt recall@0.3 {np.mean(recalls3):.3f}  "
          f"@0.5 {np.mean(recalls5):.3f}  "
          f"objectness separation (near-gt minus rest, logits) "
          f"{np.mean(seps) if seps else float('nan'):.3f}", flush=True)


def main():
    root = tempfile.mkdtemp(prefix="podtpu_probe_mnv3_")
    project = make_hard_project(root, num_images=24,
                                image_size=(CANVAS, CANVAS), max_boxes=24,
                                seed=7)
    mnv3 = mobilenet_v3_fpn_config(ModelConfig(image_size=(CANVAS, CANVAS)))
    flag = ModelConfig(image_size=(CANVAS, CANVAS))
    dataset = DetectionDataset(project, image_size=(CANVAS, CANVAS),
                               max_gt=mnv3.max_gt_boxes,
                               label_names=list(HARD_CLASSES))
    coverage("mobilenet_v3_fpn @1024 hard", mnv3, dataset)
    coverage("resnet50_fpn (flagship) @1024 hard", flag, dataset)
    if len(sys.argv) > 1:
        proposal_recall(sys.argv[1], dataset)


if __name__ == "__main__":
    main()
