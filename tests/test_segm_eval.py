"""Segm (mask) COCO evaluation tests (VERDICT #4).

The reference evaluates ``segm`` for mask models via pycocotools RLE
(`miso/object_detection/engine/engine.py:65-74`, `coco_eval.py:110-114`);
here mask IoU is computed on bitmap grids.  These tests drive
``evaluate()`` with a fake eval step so the expected APs are exact.
"""
import numpy as np

from podtpu.models.roi_heads import Detections
from podtpu.train.evaluate import evaluate

CANVAS = 64
STRIDE = 4
GRID = CANVAS // STRIDE  # 16


def make_batch():
    boxes = np.array([[8, 8, 24, 24], [32, 32, 56, 48]], np.float32)
    labels = np.array([1, 2], np.int32)
    gm = np.zeros((2, GRID, GRID), np.float32)
    for j, b in enumerate(boxes):
        x1, y1, x2, y2 = (b / STRIDE).astype(int)
        gm[j, y1:y2, x1:x2] = 1.0
    batch = {
        "image": np.zeros((1, CANVAS, CANVAS, 3), np.float32),
        "boxes": boxes[None],
        "labels": labels[None],
        "valid": np.ones((1, 2), bool),
        "scale": np.ones((1,), np.float32),
        "masks": gm[None],
    }
    return batch, boxes, labels


def fake_loader(batch):
    return [(batch, np.array([True]))]


def make_eval_step(boxes, labels, dt_masks):
    det = Detections(
        boxes=boxes[None],
        scores=np.array([[0.9, 0.8]], np.float32),
        labels=labels[None],
        valid=np.ones((1, 2), bool),
    )

    def eval_step(params, frozen, images):
        return det, dt_masks

    return eval_step


class TestSegmEval:
    def test_perfect_masks_ap_1(self):
        batch, boxes, labels = make_batch()
        # A full-on box-local mask pastes to exactly the gt rectangle.
        dt_masks = np.ones((1, 2, 28, 28), np.float32)
        ev, stats = evaluate(make_eval_step(boxes, labels, dt_masks),
                             None, None, fake_loader(batch), num_classes=2,
                             verbose=False)
        assert stats[0] == 1.0                     # bbox mAP
        assert ev.segm_stats is not None
        assert ev.segm_stats[0] == 1.0             # segm mAP
        assert ev.segm_stats[1] == 1.0             # segm AP@0.5

    def test_half_masks_score_below_bbox(self):
        batch, boxes, labels = make_batch()
        # Left half of each box only: mask IoU 0.5 -> matches at thr 0.5 only.
        dt_masks = np.zeros((1, 2, 28, 28), np.float32)
        dt_masks[:, :, :, :14] = 1.0
        ev, stats = evaluate(make_eval_step(boxes, labels, dt_masks),
                             None, None, fake_loader(batch), num_classes=2,
                             verbose=False)
        assert stats[0] == 1.0
        assert ev.segm_stats[1] == 1.0             # AP@0.5 still perfect
        assert ev.segm_stats[0] < stats[0]         # mAP degraded by IoU 0.5

    def test_box_model_has_no_segm(self):
        batch, boxes, labels = make_batch()
        det = Detections(boxes=boxes[None],
                         scores=np.array([[0.9, 0.8]], np.float32),
                         labels=labels[None], valid=np.ones((1, 2), bool))
        ev, _ = evaluate(lambda p, f, im: det, None, None,
                         fake_loader(batch), num_classes=2, verbose=False)
        assert ev.segm is None and ev.segm_stats is None
