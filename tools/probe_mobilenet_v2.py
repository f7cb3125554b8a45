"""Root-cause instrumentation for the MobileNetV2 single-map family's weak
convergence (VERDICT r2: mAP 0.197 on the particle task at a 512 canvas).

Pure host-side analysis, no training: on the exact synthetic task the
convergence run uses, measure
  1. anchor coverage — per-gt max IoU against the stride-32 anchor grid
     (RPN assignment quality; torchvision matcher thresholds 0.3/0.7), and
  2. feature resolution — gt extent in stride-32 feature CELLS (what the
     single-level RoIAlign has to localise from).

Both at the 512 canvas the round-2 run used AND at the 1024 canvas with
512-rendered images (2x load-time upscale — the fixed-canvas analog of the
input blow-up torchvision's GeneralizedRCNNTransform(min_size=800) applies
inside the reference's snippet model,
`miso/instance_segmentation/training.py:7-36`).

Run:  python tools/probe_mobilenet_v2.py
"""
import tempfile

import numpy as np

from podtpu.core.config import mobilenet_config
from podtpu.data.dataset import DetectionDataset
from podtpu.ops.anchors import grid_anchors
from tests.synthetic import make_project


def iou_np(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def probe(canvas, render):
    cfg = mobilenet_config(image_size=(canvas, canvas))
    root = tempfile.mkdtemp(prefix="podtpu_probe_")
    project = make_project(root, num_images=12,
                           image_size=(render, render), max_boxes=6, seed=7)
    dataset = DetectionDataset(project, image_size=(canvas, canvas),
                               max_gt=cfg.max_gt_boxes)
    anchors = np.concatenate(grid_anchors(
        (canvas, canvas), cfg.strides, cfg.anchor_sizes, cfg.anchor_ratios))
    max_ious, cells = [], []
    for i in range(len(dataset)):
        s = dataset.load(i)
        gt = s.boxes[s.valid]
        if not len(gt):
            continue
        max_ious.extend(iou_np(gt, anchors).max(1))
        ext = np.maximum(gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1])
        cells.extend(ext / cfg.strides[0])
    max_ious = np.asarray(max_ious)
    cells = np.asarray(cells)
    print(f"canvas {canvas} (rendered {render}, scale {canvas/render:.2f}x): "
          f"{len(max_ious)} gt boxes")
    print(f"  anchor max-IoU: mean {max_ious.mean():.3f}  "
          f"p10 {np.percentile(max_ious, 10):.3f}  "
          f"frac>=0.7 (RPN positive) {(max_ious >= 0.7).mean():.3f}  "
          f"frac<0.3 (unmatchable) {(max_ious < 0.3).mean():.3f}")
    print(f"  object extent in stride-32 cells: mean {cells.mean():.2f}  "
          f"p10 {np.percentile(cells, 10):.2f}  "
          f"p90 {np.percentile(cells, 90):.2f}  "
          f"frac<2 cells {(cells < 2).mean():.3f}")


if __name__ == "__main__":
    probe(512, 512)    # the round-2 convergence operating point
    probe(1024, 512)   # 2x upscale (torchvision min_size-style blow-up)
