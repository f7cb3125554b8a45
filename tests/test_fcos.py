"""FCOS family (podtpu/models/fcos.py).

The anchor-free one-stage detector the reference's vendored trainer exposes
via the torchvision zoo (`engine/train.py:219-221`, ``fcos_resnet50_fpn``).
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, fcos_config
from tests.conftest import tiny_config


def micro_fcos_cfg():
    base = tiny_config().model
    cfg = fcos_config(base)
    return dataclasses.replace(
        cfg, num_classes=3, image_size=(128, 128), max_gt_boxes=8,
        detections_per_image=8, compute_dtype="float32",
        retinanet_topk_per_level=64, retinanet_nms_candidates=128)


class TestConfig:
    def test_fcos_config(self):
        cfg = fcos_config(ModelConfig())
        assert cfg.family == "fcos"
        assert cfg.strides == (8, 16, 32, 64, 128)
        # Anchor-free: ONE stride-sized cell box per location.
        assert cfg.anchors_per_location == 1
        assert cfg.score_thresh == 0.2
        assert cfg.nms_thresh == 0.6
        assert cfg.detections_per_image == 100

    def test_incompatible_combos_rejected(self):
        from podtpu.models.detector import build_model

        with pytest.raises(ValueError, match="fcos"):
            build_model(3, family="fcos", with_mask=True)
        with pytest.raises(ValueError, match="fcos"):
            build_model(3, family="fcos", backbone="mobilenet_v2")

    def test_make_detector_dispatch(self):
        from podtpu.models.detector import make_detector
        from podtpu.models.fcos import FCOS

        assert isinstance(make_detector(micro_fcos_cfg()), FCOS)


class TestLinearBoxCoder:
    def test_roundtrip(self):
        """decode(encode(x)) == x for boxes containing the anchor centre
        (torchvision BoxLinearCoder(normalize_by_size=True))."""
        from podtpu.ops import boxes as box_ops

        rng = np.random.default_rng(0)
        anchors = np.stack([
            rng.uniform(10, 100, 32), rng.uniform(10, 100, 32),
        ], -1).astype(np.float32)
        anchors = np.concatenate([anchors, anchors + 8.0], -1)
        # gt boxes strictly containing each anchor centre.
        cx = anchors[:, 0] + 4.0
        cy = anchors[:, 1] + 4.0
        l = rng.uniform(1, 30, 32).astype(np.float32)
        t = rng.uniform(1, 30, 32).astype(np.float32)
        r = rng.uniform(1, 30, 32).astype(np.float32)
        b = rng.uniform(1, 30, 32).astype(np.float32)
        gt = np.stack([cx - l, cy - t, cx + r, cy + b], -1)
        codes = box_ops.encode_boxes_linear(jnp.asarray(anchors),
                                            jnp.asarray(gt))
        # Normalised by the 8-px cell: code 1.0 == one cell size.
        np.testing.assert_allclose(np.asarray(codes[:, 0]), l / 8.0,
                                   rtol=1e-5)
        back = box_ops.decode_boxes_linear(codes, jnp.asarray(anchors))
        np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4,
                                   atol=1e-3)

    def test_giou_matches_iou_when_aligned(self):
        from podtpu.ops import boxes as box_ops

        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        # Identical boxes: GIoU == IoU == 1.
        np.testing.assert_allclose(
            np.asarray(box_ops.elementwise_giou(a, a)), [1.0], atol=1e-5)
        # Disjoint boxes far apart: GIoU -> -1 as distance grows.
        b = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
        g = float(box_ops.elementwise_giou(a, b)[0])
        assert -1.0 <= g < -0.9

    def test_giou_degenerate_is_finite(self):
        """Zero-area boxes (masked background slots) keep finite value AND
        gradient — the loss masks by multiplication."""
        from podtpu.ops import boxes as box_ops

        z = jnp.zeros((1, 4))

        def f(x):
            return box_ops.elementwise_giou(x, z).sum()

        val, grad = jax.value_and_grad(f)(z)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grad)))


class TestFcosMatch:
    def _constants(self, cfg):
        from podtpu.models.detector import make_detector

        model = make_detector(cfg)
        bound = model.bind({"params": {}, "frozen": {}})
        anchors = jnp.concatenate(bound._anchors(), axis=0)
        sizes, lower, upper = bound._level_constants()
        return anchors, sizes, lower, upper

    def test_center_inside_and_scale_range(self):
        """A 40-px gt is owned by the 8-px-cell level whose scale range
        (32, 64) contains it; coarser levels reject it; locations outside
        the centre-sampling radius stay background."""
        from podtpu.models.fcos import fcos_match

        cfg = micro_fcos_cfg()
        anchors, sizes, lower, upper = self._constants(cfg)
        gt = jnp.asarray([[40.0, 40.0, 80.0, 80.0]])  # 40x40, centre (60,60)
        valid = jnp.asarray([True])
        m = np.asarray(fcos_match(anchors, sizes, lower, upper, gt, valid,
                                  cfg.fcos_center_radius))
        fg = np.nonzero(m >= 0)[0]
        assert fg.size > 0
        a = np.asarray(anchors)
        s = np.asarray(sizes)
        centers = 0.5 * (a[:, :2] + a[:, 2:])
        for i in fg:
            # A location inside this 40-px gt sees dmax in ~(20, 40):
            # level 0's range is (0, 64) (first-level lower bound 0) and
            # level 1's (64, 128) excludes it — only the size-8 level owns
            # this gt.
            assert s[i] == 8.0
            # centre sampling: within 1.5 * cell of the gt centre.
            assert np.max(np.abs(centers[i] - 60.0)) < 1.5 * s[i]
            # strictly inside the gt box.
            assert np.all(centers[i] > 40.0) and np.all(centers[i] < 80.0)

    def test_min_area_tiebreak(self):
        """Two nested gts: contested locations go to the smaller one."""
        from podtpu.models.fcos import fcos_match

        cfg = micro_fcos_cfg()
        anchors, sizes, lower, upper = self._constants(cfg)
        gt = jnp.asarray([[20.0, 20.0, 100.0, 100.0],
                          [40.0, 40.0, 80.0, 80.0]])
        valid = jnp.asarray([True, True])
        m = np.asarray(fcos_match(anchors, sizes, lower, upper, gt, valid,
                                  cfg.fcos_center_radius))
        a = np.asarray(anchors)
        centers = 0.5 * (a[:, :2] + a[:, 2:])
        # Any foreground location whose centre is near (60, 60) — inside
        # both boxes and both centre-sampling windows — matches gt 1
        # (smaller area).
        near = (np.max(np.abs(centers - 60.0), axis=1) < 6.0) & (m >= 0)
        assert near.any()
        assert np.all(m[near] == 1)

    def test_no_gt_all_background(self):
        from podtpu.models.fcos import fcos_match

        cfg = micro_fcos_cfg()
        anchors, sizes, lower, upper = self._constants(cfg)
        gt = jnp.zeros((4, 4))
        valid = jnp.zeros((4,), bool)
        m = np.asarray(fcos_match(anchors, sizes, lower, upper, gt, valid,
                                  cfg.fcos_center_radius))
        assert np.all(m == -1)


class TestFCOSModel:
    @pytest.fixture(scope="class")
    def setup(self):
        from podtpu.models.detector import init_variables, make_detector

        cfg = micro_fcos_cfg()
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        return cfg, model, variables

    def test_head_weights_shared_across_levels(self, setup):
        _, _, variables = setup
        head = variables["params"]["head"]
        assert set(head) == {
            "cls_conv0", "cls_conv1", "cls_conv2", "cls_conv3",
            "cls_gn0", "cls_gn1", "cls_gn2", "cls_gn3", "cls_logits",
            "box_conv0", "box_conv1", "box_conv2", "box_conv3",
            "box_gn0", "box_gn1", "box_gn2", "box_gn3",
            "box_deltas", "ctrness"}

    def test_train_and_eval_shapes(self, setup):
        cfg, model, variables = setup
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)),
                             jnp.float32)
        gxy = rng.uniform(0, 80, (2, 8, 2)).astype(np.float32)
        gwh = rng.uniform(10, 40, (2, 8, 2)).astype(np.float32)
        gt = {"boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
              "labels": jnp.asarray(rng.integers(1, 3, (2, 8)), jnp.int32),
              "valid": jnp.ones((2, 8), bool)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert set(losses) == {"classification", "bbox_regression",
                               "bbox_ctrness"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (2, 8, 4)
        assert det.scores.shape == det.labels.shape == det.valid.shape \
            == (2, 8)

    def test_all_background_losses_finite(self, setup):
        """No gt at all: regression/ctrness mask to zero (the eps guards
        keep NaNs out of masked slots), classification stays bounded."""
        cfg, model, variables = setup
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        gt = {"boxes": jnp.zeros((1, 8, 4)),
              "labels": jnp.zeros((1, 8), jnp.int32),
              "valid": jnp.zeros((1, 8), bool)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert float(losses["bbox_regression"]) == 0.0
        assert float(losses["bbox_ctrness"]) == 0.0
        assert np.isfinite(float(losses["classification"]))
        assert float(losses["classification"]) < 100.0  # prior bias init

    def test_loss_decreases_when_overfitting(self, setup):
        cfg, model, variables = setup
        import optax

        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)),
                             jnp.float32)
        gxy = np.array([[[20.0, 20.0], [70.0, 60.0]]], np.float32)
        gwh = np.array([[[40.0, 40.0], [30.0, 30.0]]], np.float32)
        boxes = np.zeros((1, 8, 4), np.float32)
        boxes[0, :2] = np.concatenate([gxy, gxy + gwh], -1)[0]
        valid = np.zeros((1, 8), bool)
        valid[0, :2] = True
        labels = np.zeros((1, 8), np.int32)
        labels[0, :2] = [1, 2]
        gt = {"boxes": jnp.asarray(boxes),
              "labels": jnp.asarray(labels),
              "valid": jnp.asarray(valid)}
        tx = optax.adam(1e-3)
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                losses = model.apply(
                    {"params": p, "frozen": variables["frozen"]}, images,
                    gt=gt, train=True, rng=jax.random.key(0))
                return sum(losses.values())
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for _ in range(15):
            params, opt_state, loss = step(params, opt_state)
            first = first if first is not None else float(loss)
        assert np.isfinite(float(loss))
        assert float(loss) < first * 0.9, (first, float(loss))


class TestPostprocessIndexing:
    def test_hot_location_decodes_to_expected_box(self):
        """Pin the (location, class) decomposition + the linear decode: a
        single hot logit with high centre-ness must come back as a
        detection at exactly its decoded box with its label."""
        from podtpu.models.detector import make_detector
        from podtpu.ops import boxes as box_ops
        from podtpu.ops.anchors import grid_anchors

        cfg = micro_fcos_cfg()
        model = make_detector(cfg)
        anchors = [np.asarray(g) for g in grid_anchors(
            tuple(cfg.image_size), tuple(cfg.strides),
            tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))]
        counts = [a.shape[0] for a in anchors]
        total = sum(counts)
        c = cfg.num_classes
        hot_loc_l1, hot_class = 23, 2
        flat_hot = counts[0] + hot_loc_l1
        logits = np.full((1, total, c), -20.0, np.float32)
        logits[0, flat_hot, hot_class] = 8.0
        deltas = np.zeros((1, total, 4), np.float32)
        deltas[0, flat_hot] = [1.0, 2.0, 1.5, 0.5]  # l,t,r,b in cell units
        ctr = np.full((1, total), -20.0, np.float32)
        ctr[0, flat_hot] = 8.0

        level_logits, level_deltas, level_ctr, off = [], [], [], 0
        for n in counts:
            level_logits.append(jnp.asarray(logits[:, off:off + n]))
            level_deltas.append(jnp.asarray(deltas[:, off:off + n]))
            level_ctr.append(jnp.asarray(ctr[:, off:off + n]))
            off += n
        bound = model.bind({"params": {}, "frozen": {}})
        det = bound._postprocess(level_logits, level_deltas, level_ctr,
                                 [jnp.asarray(a) for a in anchors])
        sc = np.asarray(det.scores[0])
        assert sc[0] > 0.99  # sqrt(sigmoid(8)^2) ~ 0.9997
        assert int(det.labels[0, 0]) == hot_class
        want = box_ops.clip_boxes(
            box_ops.decode_boxes_linear(
                jnp.asarray(deltas[0, flat_hot]),
                jnp.asarray(anchors[1][hot_loc_l1])),
            cfg.image_size)
        np.testing.assert_allclose(np.asarray(det.boxes[0, 0]),
                                   np.asarray(want), atol=1e-3)
        assert int(np.asarray(det.valid[0]).sum()) == 1

    def test_low_centerness_downweights_score(self):
        """Same logit, low ctrness -> score ~ sqrt(sigmoid(8) * sigmoid(-2))
        (the centre-ness multiplies INTO the ranking score)."""
        from podtpu.models.detector import make_detector
        from podtpu.ops.anchors import grid_anchors

        cfg = micro_fcos_cfg()
        model = make_detector(cfg)
        anchors = [jnp.asarray(g) for g in grid_anchors(
            tuple(cfg.image_size), tuple(cfg.strides),
            tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))]
        counts = [a.shape[0] for a in anchors]
        total = sum(counts)
        logits = np.full((1, total, cfg.num_classes), -20.0, np.float32)
        logits[0, 5, 1] = 8.0
        deltas = np.ones((1, total, 4), np.float32)
        ctr = np.full((1, total), -2.0, np.float32)
        level_logits, level_deltas, level_ctr, off = [], [], [], 0
        for n in counts:
            level_logits.append(jnp.asarray(logits[:, off:off + n]))
            level_deltas.append(jnp.asarray(deltas[:, off:off + n]))
            level_ctr.append(jnp.asarray(ctr[:, off:off + n]))
            off += n
        bound = model.bind({"params": {}, "frozen": {}})
        det = bound._postprocess(level_logits, level_deltas, level_ctr,
                                 anchors)
        want = np.sqrt((1 / (1 + np.exp(-8.0))) * (1 / (1 + np.exp(2.0))))
        got = float(det.scores[0, 0])
        if want > cfg.score_thresh:
            np.testing.assert_allclose(got, want, rtol=1e-4)
        else:
            assert int(np.asarray(det.valid[0]).sum()) == 0


class TestFCOSWeightImport:
    def test_torchvision_layout_roundtrip(self):
        """A full fake ``fcos_resnet50_fpn`` state_dict (torch layouts,
        GroupNorm towers) imports into every mappable path, auto-detected
        from the ctrness key."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (_conv, fcos_key_map,
                                           convert_torchvision_state_dict)

        cfg = micro_fcos_cfg()
        variables = init_variables(make_detector(cfg), jax.random.key(0))
        rng = np.random.default_rng(0)
        sd, targets = {}, {}
        seen = set()
        for torch_key, (coll, path, tr) in fcos_key_map().items():
            dedupe = (coll, path, torch_key.rsplit(".", 1)[-1])
            if dedupe in seen:
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
            seen.add(dedupe)
            target = rng.normal(size=np.asarray(node).shape).astype(
                np.float32)
            targets[(coll, path)] = target
            sd[torch_key] = np.transpose(target, (3, 2, 0, 1)) \
                if tr is _conv else target
        assert len(sd) > 300
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)  # no key_map: auto-detect
        assert loaded == len(sd)
        assert not skipped
        for (coll, path), want in targets.items():
            node = out[coll]
            for k in path.split("/"):
                node = node[k]
            np.testing.assert_allclose(np.asarray(node), want, rtol=1e-6)


class TestFCOSE2E:
    @pytest.mark.slow
    def test_train_infer_roundtrip(self, synthetic_root, tmp_path):
        """Product path: train(family='fcos') -> artifacts -> the saved
        config.json rebuilds an FCOS for inference."""
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="fcos", batch_size=2, max_epochs=2, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, family="fcos",
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        assert os.path.exists(os.path.join(out, "results.txt"))
        import json
        with open(os.path.join(out, "config.json")) as fp:
            saved = json.load(fp)
        assert saved["model"]["family"] == "fcos"
        assert saved["model"]["trainable_backbone_stages"] == 5

        from podtpu.infer.inference import load_inference_model
        eval_step, params, frozen, cfg, labels = load_inference_model(out)
        assert cfg.family == "fcos"
        rng = np.random.default_rng(0)
        images = (rng.uniform(0, 255, (1,) + tuple(cfg.image_size) + (3,))
                  .astype(np.uint8))
        det = eval_step(params, frozen, images)
        assert det.boxes.shape[0] == 1

    @pytest.mark.slow
    def test_train_dp_mesh(self, synthetic_root, tmp_path):
        """family='fcos' rides the same shard_map DP step as the rest."""
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="fcos_dp", batch_size=2, max_epochs=1, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, family="fcos", num_devices=2,
        )
        assert os.path.exists(os.path.join(out, "results.txt"))
