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


class TestRegionMask:
    """Full-resolution region-bounded masks (VERDICT r2 #3: the reference
    RLE-encodes at full image resolution, coco_eval.py:110-114)."""

    def test_region_iou_matches_dense(self):
        from podtpu.infer.masks import RegionMask, mask_iou, region_mask_iou
        rng = np.random.default_rng(0)
        H = W = 40
        dense_a, dense_b, reg_a, reg_b = [], [], [], []
        for k in range(4):
            m = np.zeros((H, W), bool)
            x0, y0 = rng.integers(0, 20, 2)
            w, h = rng.integers(5, 18, 2)
            patch = rng.random((h, w)) > 0.4
            m[y0:y0 + h, x0:x0 + w] = patch
            (dense_a if k < 2 else dense_b).append(m)
            (reg_a if k < 2 else reg_b).append(RegionMask(x0, y0, patch))
        expect = mask_iou(np.stack(dense_a), np.stack(dense_b))
        got = region_mask_iou(reg_a, reg_b)
        np.testing.assert_allclose(got, expect, atol=1e-12)

    def test_empty_region(self):
        from podtpu.infer.masks import RegionMask, region_mask_iou
        empty = RegionMask(3, 3, np.zeros((0, 0), bool))
        full = RegionMask(0, 0, np.ones((5, 5), bool))
        assert empty.area == 0
        assert region_mask_iou([empty], [full])[0, 0] == 0.0

    def test_rasterize_region_rectangle_exact(self):
        from podtpu.data.annotation import RectangleAnnotation
        from podtpu.infer.masks import rasterize_region
        ann = RectangleAnnotation(8, 8, 16, 16, "particle")  # x y w h
        rm = rasterize_region(ann, 64, 64)
        assert (rm.x0, rm.y0) == (8, 8)
        assert rm.bitmap.shape == (16, 16)
        assert rm.area == 256

    def test_paste_region_matches_full_paste(self):
        from podtpu.infer.masks import paste_mask, paste_region_mask
        rng = np.random.default_rng(1)
        mask = rng.random((14, 14)).astype(np.float32)
        box = np.array([5.3, 7.1, 33.8, 29.2])
        dense = paste_mask(mask, box, 48, 48) > 0.5
        rm = paste_region_mask(mask, box, 48, 48)
        full = np.zeros((48, 48), bool)
        full[rm.y0:rm.y0 + rm.bitmap.shape[0],
             rm.x0:rm.x0 + rm.bitmap.shape[1]] = rm.bitmap
        np.testing.assert_array_equal(full, dense)


class _StubDataset:
    """The slice of DetectionDataset the full-res eval path touches."""

    def __init__(self, metas, label_to_index, max_gt=8):
        self.images = metas
        self.label_to_index = label_to_index
        self.max_gt = max_gt


class _StubMeta:
    def __init__(self, boxes):
        self.boxes = boxes


class _StubLoader(list):
    def __init__(self, batches, dataset):
        super().__init__(batches)
        self.dataset = dataset


class TestFullResolutionSegmEval:
    """Pins the segm evaluator's resolution to ORIGINAL pixels: the IoU of
    two 16px-wide boxes overlapping by 11px is exactly 11/21 = 0.5238 — a
    value a stride-8 grid cannot represent (its cells quantize the overlap
    to 0, 1/3 or 2/3).  AP@.50 must pass, AP@.55 must fail."""

    def test_pixel_exact_iou_through_evaluate(self):
        from podtpu.data.annotation import RectangleAnnotation

        gt_box = np.array([[8.0, 8.0, 24.0, 24.0]], np.float32)
        dt_box = np.array([[13.0, 8.0, 29.0, 24.0]], np.float32)
        meta = _StubMeta([RectangleAnnotation(8, 8, 16, 16, "particle")])
        ds = _StubDataset([meta], {"particle": 1})
        batch = {
            "image": np.zeros((1, CANVAS, CANVAS, 3), np.float32),
            "boxes": gt_box[None] if gt_box.ndim == 2 else gt_box,
            "labels": np.array([[1]], np.int32),
            "valid": np.ones((1, 1), bool),
            "scale": np.ones((1,), np.float32),
            "masks": np.ones((1, 1, GRID, GRID), np.float32),
            "original_size": np.array([[CANVAS, CANVAS]], np.int32),
            "index": np.array([0], np.int32),
        }
        loader = _StubLoader([(batch, np.array([True]))], ds)
        det = Detections(boxes=dt_box[None],
                         scores=np.array([[0.9]], np.float32),
                         labels=np.array([[1]], np.int32),
                         valid=np.ones((1, 1), bool))
        dt_masks = np.ones((1, 1, 8, 8), np.float32)

        def eval_step(params, frozen, images):
            return det, dt_masks

        ev, _ = evaluate(eval_step, None, None, loader, num_classes=1,
                         verbose=False)
        segm = ev.segm_stats
        # box IoU == mask IoU == 11/21 here; matched at 0.50, not 0.55.
        assert segm is not None
        ap50 = segm[1]
        assert ap50 == 1.0
        # mAP averages 10 thresholds; only .50 matches.
        assert abs(segm[0] - 0.1) < 1e-6

    def test_perfect_full_res_masks_ap_1(self):
        from podtpu.data.annotation import RectangleAnnotation

        b = np.array([[10.0, 12.0, 42.0, 40.0]], np.float32)
        meta = _StubMeta([RectangleAnnotation(10, 12, 32, 28, "particle")])
        ds = _StubDataset([meta], {"particle": 1})
        batch = {
            "image": np.zeros((1, CANVAS, CANVAS, 3), np.float32),
            "boxes": b[None] if b.ndim == 2 else b,
            "labels": np.array([[1]], np.int32),
            "valid": np.ones((1, 1), bool),
            "scale": np.ones((1,), np.float32),
            "masks": np.ones((1, 1, GRID, GRID), np.float32),
            "original_size": np.array([[CANVAS, CANVAS]], np.int32),
            "index": np.array([0], np.int32),
        }
        loader = _StubLoader([(batch, np.array([True]))], ds)
        det = Detections(boxes=b[None], scores=np.array([[0.9]], np.float32),
                         labels=np.array([[1]], np.int32),
                         valid=np.ones((1, 1), bool))

        def eval_step(params, frozen, images):
            return det, np.ones((1, 1, 8, 8), np.float32)

        ev, _ = evaluate(eval_step, None, None, loader, num_classes=1,
                         verbose=False)
        assert ev.segm_stats[0] == 1.0
