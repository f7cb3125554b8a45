"""SSD family tests: default boxes, SSD matcher, hard-negative mining,
postprocess oracle, tiny training, checkpoint round-trip, weight import.

Oracle semantics follow torchvision's ``SSD`` meta-architecture /
``DefaultBoxGenerator`` (the ``ssd300_vgg16`` and
``ssdlite320_mobilenet_v3_large`` zoo models the reference's vendored
trainer dispatches to, `miso/object_detection/engine/train.py:219-221`).
"""
import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import (
    ModelConfig,
    mobilenet_v3_feature_shapes,
    ssd_config,
    ssdlite_config,
    vgg_ssd_feature_shapes,
)
from podtpu.models.ssd import (
    SSD_BOX_WEIGHTS,
    match_ssd,
    smooth_l1,
    ssd_losses,
    ssd_postprocess,
)
from podtpu.ops.anchors import default_boxes
from podtpu.ops import boxes as box_ops


class TestDefaultBoxes:
    def test_ssd300_counts(self):
        cfg = ssd_config()
        grids = default_boxes(
            tuple(cfg.image_size), tuple(cfg.ssd_feature_shapes),
            tuple(cfg.ssd_scales), tuple(cfg.ssd_aspect_ratios),
            steps=tuple(cfg.ssd_steps))
        counts = [g.shape[0] for g in grids]
        # torchvision ssd300: 4/6/6/6/4/4 anchors per location.
        assert counts == [38 * 38 * 4, 19 * 19 * 6, 10 * 10 * 6,
                          5 * 5 * 6, 3 * 3 * 4, 1 * 1 * 4]
        assert sum(counts) == 8732

    def test_ssdlite_counts(self):
        cfg = ssdlite_config()
        grids = default_boxes(
            tuple(cfg.image_size), tuple(cfg.ssd_feature_shapes),
            tuple(cfg.ssd_scales), tuple(cfg.ssd_aspect_ratios))
        counts = [g.shape[0] for g in grids]
        shapes = [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]
        assert counts == [h * w * 6 for h, w in shapes]

    def test_values_against_hand_oracle(self):
        # One 2x2 level, scales (0.5, 1.0), one aspect ratio 2.0 -> 4
        # anchors per location, image 100x100, grid-size normalisation.
        (grid,) = default_boxes((100, 100), ((2, 2),), (0.5, 1.0),
                                ((2.0,),))
        assert grid.shape == (2 * 2 * 4, 4)
        s, sp = 0.5, math.sqrt(0.5 * 1.0)
        sq = math.sqrt(2.0)
        wh = [(s, s), (sp, sp), (min(s * sq, 1.0), s / sq),
              (s / sq, min(s * sq, 1.0))]
        expect = []
        for cy in (0.25, 0.75):
            for cx in (0.25, 0.75):
                for w, h in wh:
                    expect.append([(cx - w / 2) * 100, (cy - h / 2) * 100,
                                   (cx + w / 2) * 100, (cy + h / 2) * 100])
        np.testing.assert_allclose(grid, np.asarray(expect, np.float32),
                                   atol=1e-4)

    def test_steps_normalisation(self):
        # Explicit steps change the centre spacing: ssd300's first level
        # uses step 8 -> centres at (i + 0.5) * 300/37.5... i.e. * 8.
        cfg = ssd_config()
        grids = default_boxes(
            tuple(cfg.image_size), tuple(cfg.ssd_feature_shapes),
            tuple(cfg.ssd_scales), tuple(cfg.ssd_aspect_ratios),
            steps=tuple(cfg.ssd_steps))
        first = grids[0].reshape(38, 38, 4, 4)
        cx = (first[0, 0, 0, 0] + first[0, 0, 0, 2]) / 2
        assert abs(float(cx) - 0.5 * 8) < 1e-3
        cx2 = (first[0, 1, 0, 0] + first[0, 1, 0, 2]) / 2
        assert abs(float(cx2 - cx) - 8.0) < 1e-3


class TestFeatureShapes:
    def test_vgg300(self):
        assert vgg_ssd_feature_shapes((300, 300)) == (
            (38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))

    def test_mobilenet_v3_320(self):
        assert mobilenet_v3_feature_shapes((320, 320)) == (
            (20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1))

    def test_vgg_shapes_match_backbone(self):
        # The static table must agree with what the conv stack produces.
        from podtpu.models.vgg import VGG16SSD

        model = VGG16SSD(dtype=jnp.float32)
        x = jnp.zeros((1, 300, 300, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda v, x: model.apply(v, x),
            jax.eval_shape(model.init, jax.random.key(0), x), x)
        got = tuple((s.shape[1], s.shape[2]) for s in shapes)
        assert got == vgg_ssd_feature_shapes((300, 300))

    def test_mobilenet_shapes_match_backbone(self):
        from podtpu.models.mobilenet_v3 import MobileNetV3SSDLite

        model = MobileNetV3SSDLite(dtype=jnp.float32)
        x = jnp.zeros((1, 320, 320, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda v, x: model.apply(v, x),
            jax.eval_shape(model.init, jax.random.key(0), x), x)
        got = tuple((s.shape[1], s.shape[2]) for s in shapes)
        assert got == mobilenet_v3_feature_shapes((320, 320))
        chans = tuple(s.shape[3] for s in shapes)
        assert chans == (672, 960, 512, 256, 256, 128)


class TestMatchSSD:
    def test_threshold_band(self):
        anchors_vs_gt = jnp.asarray([[0.6], [0.4], [0.0]])
        m = match_ssd(anchors_vs_gt, jnp.asarray([True]), 0.5)
        # 0.6 -> fg; 0.4 -> bg (no ignore band in SSDMatcher)... except the
        # best anchor per gt is forced fg: anchor 0 is the best, stays fg.
        assert m.labels.tolist() == [1, 0, 0]

    def test_forced_best_anchor(self):
        # No anchor reaches the threshold; each gt still claims its best.
        iou = jnp.asarray([[0.3, 0.1], [0.2, 0.4], [0.05, 0.1]])
        m = match_ssd(iou, jnp.asarray([True, True]), 0.5)
        assert m.labels.tolist() == [1, 1, 0]
        assert m.matched_idx.tolist()[:2] == [0, 1]

    def test_collision_last_gt_wins(self):
        # Both gts' best anchor is anchor 0: the later gt index wins (torch
        # scatter last-write semantics).
        iou = jnp.asarray([[0.3, 0.4], [0.1, 0.1]])
        m = match_ssd(iou, jnp.asarray([True, True]), 0.5)
        assert int(m.labels[0]) == 1
        assert int(m.matched_idx[0]) == 1

    def test_invalid_gt_ignored(self):
        iou = jnp.asarray([[0.9, 0.95], [0.1, 0.99]])
        m = match_ssd(iou, jnp.asarray([True, False]), 0.5)
        assert int(m.matched_idx[0]) == 0   # gt 1 masked out
        assert int(m.labels[1]) == 0        # only overlap was the invalid gt

    def test_no_gt_all_background(self):
        iou = jnp.zeros((4, 2))
        m = match_ssd(iou, jnp.asarray([False, False]), 0.5)
        assert m.labels.tolist() == [0, 0, 0, 0]


def _mini_cfg(**kw):
    kw.setdefault("num_classes", 3)
    kw.setdefault("image_size", (100, 100))
    kw.setdefault("approx_topk", False)
    return dataclasses.replace(ssd_config(), **kw)


class TestSSDLoss:
    def test_hard_negative_mining_matches_oracle(self):
        rng = np.random.default_rng(0)
        n, c = 32, 3
        anchors = np.zeros((n, 4), np.float32)
        anchors[:, 0] = np.arange(n) * 10
        anchors[:, 1] = 0
        anchors[:, 2] = anchors[:, 0] + 10
        anchors[:, 3] = 10
        # One gt exactly equal to anchor 5 -> single foreground.
        gt_boxes = np.zeros((1, 4, 4), np.float32)
        gt_boxes[0, 0] = anchors[5]
        gt = {
            "boxes": jnp.asarray(gt_boxes),
            "labels": jnp.asarray([[2, 0, 0, 0]], jnp.int32),
            "valid": jnp.asarray([[True, False, False, False]]),
        }
        logits = rng.normal(size=(1, n, c)).astype(np.float32)
        deltas = rng.normal(size=(1, n, 4)).astype(np.float32) * 0.1
        cfg = _mini_cfg()
        out = ssd_losses(jnp.asarray(logits), jnp.asarray(deltas),
                         jnp.asarray(anchors), gt, cfg)

        # numpy oracle (torchvision compute_loss): fg anchor 5, class 2.
        def softmax_ce(lg, t):
            lg = lg - lg.max()
            return -(lg[t] - np.log(np.exp(lg).sum()))

        ce = np.array([softmax_ce(logits[0, i], 2 if i == 5 else 0)
                       for i in range(n)])
        fg_loss = ce[5]
        neg = np.delete(np.arange(n), 5)
        hard = neg[np.argsort(-ce[neg], kind="stable")[:3]]  # 3:1 ratio, 1 fg
        cls_expect = (fg_loss + ce[hard].sum()) / 1.0
        enc = np.asarray(box_ops.encode_boxes(
            jnp.asarray(anchors[5:6]), jnp.asarray(anchors[5:6]),
            weights=SSD_BOX_WEIGHTS))[0]
        diff = deltas[0, 5] - enc
        reg = np.where(np.abs(diff) < 1, 0.5 * diff ** 2, np.abs(diff) - .5)
        np.testing.assert_allclose(float(out["classification"]), cls_expect,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(out["bbox_regression"]),
                                   reg.sum(), rtol=1e-4)

    def test_image_weight_zeroes_contribution(self):
        rng = np.random.default_rng(1)
        n = 16
        anchors = np.zeros((n, 4), np.float32)
        anchors[:, 2] = anchors[:, 3] = 10
        anchors[:, 0] = np.arange(n) * 12
        anchors[:, 2] += anchors[:, 0]
        gt_b = np.tile(anchors[2][None, None], (2, 1, 1))
        gt = {
            "boxes": jnp.asarray(gt_b),
            "labels": jnp.ones((2, 1), jnp.int32),
            "valid": jnp.ones((2, 1), bool),
            "image_weight": jnp.asarray([1.0, 0.0]),
        }
        logits = jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32)
        deltas = jnp.asarray(rng.normal(size=(2, n, 4)), jnp.float32)
        cfg = _mini_cfg()
        both = ssd_losses(logits, deltas, jnp.asarray(anchors), gt, cfg)
        solo = ssd_losses(logits[:1], deltas[:1], jnp.asarray(anchors),
                          {k: v[:1] for k, v in gt.items()}, cfg)
        for k in both:
            np.testing.assert_allclose(float(both[k]), float(solo[k]),
                                       rtol=1e-5)


def _numpy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = ((boxes[rest, 2] - boxes[rest, 0])
             * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= thresh]
    return keep


class TestSSDPostprocess:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(3)
        n, c = 40, 3
        anchors = np.zeros((n, 4), np.float32)
        anchors[:, 0] = rng.uniform(0, 80, n)
        anchors[:, 1] = rng.uniform(0, 80, n)
        anchors[:, 2] = anchors[:, 0] + rng.uniform(5, 20, n)
        anchors[:, 3] = anchors[:, 1] + rng.uniform(5, 20, n)
        logits = rng.normal(size=(1, n, c)).astype(np.float32) * 2
        deltas = (rng.normal(size=(1, n, 4)) * 0.5).astype(np.float32)
        cfg = _mini_cfg(ssd_topk_per_class=10, detections_per_image=8,
                        score_thresh=0.05, nms_thresh=0.5)

        det = ssd_postprocess(jnp.asarray(logits), jnp.asarray(deltas),
                              jnp.asarray(anchors), cfg)

        # Oracle: torchvision postprocess_detections.
        sm = np.exp(logits[0] - logits[0].max(-1, keepdims=True))
        sm = sm / sm.sum(-1, keepdims=True)
        dec = np.asarray(box_ops.decode_boxes(
            jnp.asarray(deltas[0]), jnp.asarray(anchors),
            weights=SSD_BOX_WEIGHTS))
        dec = np.clip(dec, 0, 100)
        cand = []
        for cls in range(1, c):
            sc = sm[:, cls].copy()
            ok = sc > cfg.score_thresh
            idx = np.argsort(-np.where(ok, sc, -np.inf),
                             kind="stable")[:10]
            for i in idx:
                if ok[i]:
                    cand.append((dec[i], sc[i], cls))
        cb = np.asarray([x[0] for x in cand])
        cs = np.asarray([x[1] for x in cand])
        cl = np.asarray([x[2] for x in cand])
        # Class-aware NMS via coordinate offset.
        off = cb + cl[:, None] * 1000.0
        keep = _numpy_nms(off, cs, 0.5)
        keep = sorted(keep, key=lambda i: -cs[i])[:8]

        got_valid = int(det.valid.sum())
        assert got_valid == len(keep)
        got_scores = np.sort(np.asarray(det.scores[0])[: got_valid])[::-1]
        want_scores = np.sort(cs[keep])[::-1]
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
        got_boxes = np.asarray(det.boxes[0])[np.argsort(
            -np.asarray(det.scores[0]))[:got_valid]]
        want_boxes = cb[keep]
        np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4,
                                   atol=1e-3)


class TestBuildModelDispatch:
    def test_family_dispatch(self):
        from podtpu.models.detector import build_model
        from podtpu.models.ssd import SSD

        model, cfg = build_model(3, family="ssd")
        assert isinstance(model, SSD)
        assert cfg.family == "ssd" and cfg.backbone == "vgg16"
        assert cfg.image_size == (300, 300)
        model, cfg = build_model(3, family="ssdlite")
        assert isinstance(model, SSD)
        assert cfg.backbone == "mobilenet_v3"
        assert cfg.image_size == (320, 320)

    def test_invalid_combinations(self):
        from podtpu.models.detector import build_model

        with pytest.raises(ValueError):
            build_model(3, family="ssd", with_mask=True)
        with pytest.raises(ValueError):
            build_model(3, family="ssdlite", backbone="resnet50_fpn")

    def test_config_checkpoint_roundtrip(self, tmp_path):
        from podtpu.train.checkpoints import model_config_from_dict

        cfg = dataclasses.replace(ssd_config(), num_classes=4)
        back = model_config_from_dict(dataclasses.asdict(cfg))
        assert back == cfg
        # The nested tuples must come back hashable for the lru caches.
        default_boxes(tuple(back.image_size),
                      tuple(back.ssd_feature_shapes), tuple(back.ssd_scales),
                      tuple(back.ssd_aspect_ratios),
                      steps=tuple(back.ssd_steps))


class TestSSDLiteTraining:
    def test_loss_decreases(self):
        from podtpu.core.config import Config, DataConfig, TrainConfig
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.train.optim import make_optimizer
        from podtpu.train.step import create_train_state, make_train_step

        model_cfg = ssdlite_config(
            image_size=(160, 160), num_classes=2, max_gt_boxes=4,
            compute_dtype="float32", ssd_topk_per_class=20,
            detections_per_image=8,
            # From-scratch: train the whole backbone (the production
            # train() applies the same unfreeze when no --pretrained).
            trainable_backbone_stages=5)
        cfg = Config(model=model_cfg,
                     train=TrainConfig(batch_size=2, warmup_iters=1),
                     data=DataConfig(photometric_distort=False,
                                     hflip_prob=0.0, vflip_prob=0.0))
        model = make_detector(model_cfg)
        variables = init_variables(model, jax.random.key(0))
        tx = make_optimizer(cfg.train, cfg.model)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, cfg)
        rng = np.random.default_rng(0)
        images = rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32)
        images[0, 40:90, 30:100] = 0.9
        images[1, 10:60, 80:140] = 0.9
        batch = {
            "image": jnp.asarray(images),
            "boxes": jnp.asarray([[[30, 40, 100, 90]] + [[0, 0, 0, 0]] * 3,
                                  [[80, 10, 140, 60]] + [[0, 0, 0, 0]] * 3],
                                 jnp.float32),
            "labels": jnp.asarray([[1, 0, 0, 0], [1, 0, 0, 0]], jnp.int32),
            "valid": jnp.asarray([[True, False, False, False]] * 2),
            "scale": jnp.ones((2,), jnp.float32),
            "original_size": jnp.full((2, 2), 160, jnp.int32),
            "index": jnp.arange(2, dtype=jnp.int32),
            "image_weight": jnp.ones((2,), jnp.float32),
        }
        losses = []
        for i in range(20):
            state, metrics = step(state, batch, jax.random.fold_in(
                jax.random.key(1), i), np.float32(0.05))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.8


def _inverse_layout(value, transform):
    from podtpu.models.weights import _conv, _dense

    v = np.asarray(value)
    if transform is _conv:
        return np.transpose(v, (3, 2, 0, 1))
    if transform is _dense:
        return np.transpose(v, (1, 0))
    return v


def _fake_state_dict(key_map, variables, key_filter=None):
    """Synthesize a checkpoint covering every mappable path once."""
    sd = {}
    rng = np.random.default_rng(0)
    seen = set()
    for tk, (coll, path, transform) in key_map.items():
        if key_filter and not key_filter(tk):
            continue
        sig = (coll, path, tk.split(".")[-1])
        if sig in seen:
            continue
        node = variables[coll]
        ok = True
        for k in path.split("/"):
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        seen.add(sig)
        target = rng.normal(size=np.asarray(node).shape).astype(np.float32)
        sd[tk] = _inverse_layout(target, transform)
    return sd


class TestSSDWeightImport:
    def test_ssd_vgg16_full_import(self):
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (convert_torchvision_state_dict,
                                           ssd_vgg16_key_map)

        cfg = dataclasses.replace(ssd_config(), num_classes=3,
                                  compute_dtype="float32")
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        sd = _fake_state_dict(
            ssd_vgg16_key_map(), variables,
            key_filter=lambda k: k.startswith(("backbone.", "head.")))
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)
        assert loaded == len(sd) and not skipped
        # Every param leaf is covered by the map (full checkpoint import).
        n_leaves = len(jax.tree.leaves(variables["params"]))
        assert loaded == n_leaves
        got = out["params"]["backbone"]["conv4_3"]["kernel"]
        want = np.transpose(sd["backbone.features.21.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        got = out["params"]["backbone"]["l2norm_scale"]
        np.testing.assert_allclose(got, sd["backbone.scale_weight"])
        got = out["params"]["head"]["cls3"]["kernel"]
        want = np.transpose(
            sd["head.classification_head.module_list.3.weight"],
            (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)

    def test_plain_vgg16_trunk_import(self):
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (convert_torchvision_state_dict,
                                           ssd_vgg16_key_map)

        cfg = dataclasses.replace(ssd_config(), num_classes=3,
                                  compute_dtype="float32")
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        sd = _fake_state_dict(
            ssd_vgg16_key_map(), variables,
            key_filter=lambda k: k.startswith("features."))
        # Auto-detect must pick the vgg map for bare ImageNet checkpoints.
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)
        assert loaded == len(sd) and not skipped
        got = out["params"]["backbone"]["conv5_2"]["kernel"]
        want = np.transpose(sd["features.26.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)

    def test_ssdlite_full_import(self):
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (convert_torchvision_state_dict,
                                           ssdlite_key_map)

        cfg = dataclasses.replace(ssdlite_config(), num_classes=3,
                                  compute_dtype="float32")
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        sd = _fake_state_dict(ssdlite_key_map(), variables)
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)
        assert loaded == len(sd) and not skipped
        n_leaves = len(jax.tree.leaves(variables["params"]))
        n_frozen = len(jax.tree.leaves(variables["frozen"]))
        assert loaded == n_leaves + n_frozen
        # Split-block spot checks: block13's expansion comes from part 0,
        # its depthwise from the spliced part-1 Sequential.
        got = out["params"]["backbone"]["block13"]["expand"]["kernel"]
        want = np.transpose(sd["backbone.features.0.13.0.weight"],
                            (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        got = out["params"]["backbone"]["block13"]["dw"]["kernel"]
        want = np.transpose(sd["backbone.features.1.0.0.0.weight"],
                            (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        got = out["frozen"]["backbone"]["block14"]["bn_dw"]["mean"]
        np.testing.assert_allclose(
            got, sd["backbone.features.1.1.block.1.1.running_mean"])
        got = out["params"]["head"]["reg5"]["pw"]["kernel"]
        want = np.transpose(
            sd["head.regression_head.module_list.5.1.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
