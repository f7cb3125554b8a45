"""RetinaNet family (podtpu/models/retinanet.py).

The one-stage focal-loss detector the reference's vendored trainer exposes
via the torchvision zoo (`engine/train.py:219-221`).
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, retinanet_config
from tests.conftest import tiny_config


def micro_retina_cfg():
    base = tiny_config().model
    cfg = retinanet_config(base)
    return dataclasses.replace(
        cfg, num_classes=3, image_size=(128, 128), max_gt_boxes=8,
        detections_per_image=8, compute_dtype="float32",
        retinanet_topk_per_level=64, retinanet_nms_candidates=128)


class TestConfig:
    def test_retinanet_config_anchors(self):
        cfg = retinanet_config(ModelConfig())
        assert cfg.family == "retinanet"
        assert cfg.strides == (8, 16, 32, 64, 128)
        # 3 octave scales x 3 ratios = 9 anchors per location.
        assert cfg.anchors_per_location == 9
        assert len(cfg.anchor_sizes) == 5
        assert abs(cfg.anchor_sizes[0][1] - 32 * 2 ** (1 / 3)) < 1e-6

    def test_incompatible_combos_rejected(self):
        from podtpu.models.detector import build_model

        with pytest.raises(ValueError, match="retinanet"):
            build_model(3, family="retinanet", with_mask=True)
        with pytest.raises(ValueError, match="retinanet"):
            build_model(3, family="retinanet", backbone="mobilenet_v2")

    def test_make_detector_dispatch(self):
        from podtpu.models.detector import make_detector
        from podtpu.models.retinanet import RetinaNet

        assert isinstance(make_detector(micro_retina_cfg()), RetinaNet)
        assert type(make_detector(tiny_config().model)).__name__ == \
            "FasterRCNN"


class TestFocalLoss:
    def test_matches_naive(self):
        from podtpu.models.retinanet import sigmoid_focal_loss

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(0, 2, (64, 5)), jnp.float32)
        targets = jnp.asarray(rng.integers(0, 2, (64, 5)), jnp.float32)
        got = np.asarray(sigmoid_focal_loss(logits, targets, 0.25, 2.0))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        t = np.asarray(targets)
        ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
        p_t = p * t + (1 - p) * (1 - t)
        a_t = 0.25 * t + 0.75 * (1 - t)
        want = a_t * ce * (1 - p_t) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_prior_bias_keeps_initial_loss_small(self):
        """With the -log((1-p)/p) bias init the background focal loss per
        anchor starts near p*|log p| rather than ~0.7 (the focal paper's
        initialisation rationale)."""
        from podtpu.models.detector import init_variables, make_detector

        cfg = micro_retina_cfg()
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        gt = {"boxes": jnp.zeros((1, 8, 4)),
              "labels": jnp.zeros((1, 8), jnp.int32),
              "valid": jnp.zeros((1, 8), bool)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        # All-background image: classification loss normalised by
        # max(num_fg, 1) stays bounded (would be ~1e4 without the prior).
        assert float(losses["classification"]) < 100.0


class TestRetinaNetModel:
    @pytest.fixture(scope="class")
    def setup(self):
        from podtpu.models.detector import init_variables, make_detector

        cfg = micro_retina_cfg()
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        return cfg, model, variables

    def test_head_weights_shared_across_levels(self, setup):
        _, _, variables = setup
        head = variables["params"]["head"]
        # ONE subnet parameter set (applied to all 5 levels), torchvision's
        # shared-head semantics.
        assert set(head) == {"cls_conv0", "cls_conv1", "cls_conv2",
                             "cls_conv3", "cls_logits", "box_conv0",
                             "box_conv1", "box_conv2", "box_conv3",
                             "box_deltas"}

    def test_train_and_eval_shapes(self, setup):
        cfg, model, variables = setup
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)),
                             jnp.float32)
        gxy = rng.uniform(0, 90, (2, 8, 2)).astype(np.float32)
        gwh = rng.uniform(8, 30, (2, 8, 2)).astype(np.float32)
        gt = {"boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
              "labels": jnp.asarray(rng.integers(1, 3, (2, 8)), jnp.int32),
              "valid": jnp.ones((2, 8), bool)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert set(losses) == {"classification", "bbox_regression"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (2, 8, 4)
        assert det.scores.shape == det.labels.shape == det.valid.shape \
            == (2, 8)

    def test_loss_decreases_when_overfitting(self, setup):
        """A few SGD steps on one fixed batch reduce the summed loss —
        gradients flow through the focal + regression path."""
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
        assert float(loss) < first * 0.9, (first, float(loss))


class TestRetinaNetE2E:
    @pytest.mark.slow
    def test_train_infer_roundtrip(self, synthetic_root, tmp_path):
        """Product path: train(family='retinanet') -> artifacts ->
        load_inference_model reconstructs a RetinaNet from config.json ->
        detections come back through the standard eval surface."""
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="retina", batch_size=2, max_epochs=2, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, family="retinanet",
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        assert os.path.exists(os.path.join(out, "results.txt"))
        import json
        with open(os.path.join(out, "config.json")) as fp:
            saved = json.load(fp)
        assert saved["model"]["family"] == "retinanet"
        # No pretrained weights -> the whole backbone trains (torchvision
        # _validate_trainable_layers semantics; frozen random stages stall
        # one-stage training).
        assert saved["model"]["trainable_backbone_stages"] == 5

        from podtpu.infer.inference import load_inference_model
        eval_step, params, frozen, cfg, labels = load_inference_model(out)
        assert cfg.family == "retinanet"
        rng = np.random.default_rng(0)
        images = (rng.uniform(0, 255, (1,) + tuple(cfg.image_size) + (3,))
                  .astype(np.uint8))
        det = eval_step(params, frozen, images)
        assert det.boxes.shape[0] == 1

    @pytest.mark.slow
    def test_train_dp_mesh(self, synthetic_root, tmp_path):
        """family='retinanet' rides the same shard_map DP step as the
        flagship (the model is swapped under an unchanged engine)."""
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="retina_dp", batch_size=2, max_epochs=1, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, family="retinanet", num_devices=2,
        )
        assert os.path.exists(os.path.join(out, "results.txt"))


class TestRetinaNetWeightImport:
    def test_torchvision_layout_roundtrip(self):
        """A full fake ``retinanet_resnet50_fpn`` state_dict (torch OIHW
        layouts) imports into every mappable path, auto-detected from the
        head key prefix."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (_conv,
                                           convert_torchvision_state_dict,
                                           retinanet_key_map)

        cfg = micro_retina_cfg()
        variables = init_variables(make_detector(cfg), jax.random.key(0))
        rng = np.random.default_rng(0)
        sd, targets = {}, {}
        seen = set()
        for torch_key, (coll, path, tr) in retinanet_key_map().items():
            dedupe = (coll, path, torch_key.rsplit(".", 1)[-1])
            if dedupe in seen:  # alias spellings: a checkpoint has one
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
        assert len(sd) > 300  # trunk + fpn + subnets all covered
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)  # no key_map: auto-detect
        assert loaded == len(sd)
        assert not skipped
        for (coll, path), want in targets.items():
            node = out[coll]
            for k in path.split("/"):
                node = node[k]
            np.testing.assert_allclose(np.asarray(node), want, rtol=1e-6)


class TestRetinaNetV2:
    def micro_v2_cfg(self):
        import dataclasses as dc

        from podtpu.core.config import retinanet_v2_config
        return dc.replace(
            retinanet_v2_config(tiny_config().model), num_classes=3,
            image_size=(128, 128), max_gt_boxes=8, detections_per_image=8,
            compute_dtype="float32", retinanet_topk_per_level=64,
            retinanet_nms_candidates=128)

    def test_config_and_build_spelling(self):
        from podtpu.core.config import retinanet_v2_config
        from podtpu.models.detector import build_model

        cfg = retinanet_v2_config()
        assert cfg.family == "retinanet"
        assert cfg.retinanet_head_norm and cfg.retinanet_box_loss == "giou"
        assert cfg.retinanet_p6_on_c5  # LastLevelP6P7(2048, 256)
        _, built = build_model(3, family="retinanet_v2")
        assert built.family == "retinanet"
        assert built.retinanet_head_norm

    def test_v2_config_preserves_tuned_retinanet_fields(self):
        """A cfg already carrying the retinanet preset keeps user-tuned
        anchors/strides (the v1 path's guard, mirrored)."""
        import dataclasses as dc

        from podtpu.core.config import retinanet_config, retinanet_v2_config

        tuned = dc.replace(retinanet_config(),
                           anchor_sizes=((16.0,),) * 5)
        v2 = retinanet_v2_config(tuned)
        assert v2.anchor_sizes == ((16.0,),) * 5
        assert v2.retinanet_box_loss == "giou"

    def test_v2_p6_reads_c5(self):
        """v2's P6 conv consumes the 2048-channel C5 (torchvision
        LastLevelP6P7(2048, 256)); v1's consumes the 256-channel P5."""
        from podtpu.models.detector import init_variables, make_detector

        v2 = init_variables(make_detector(self.micro_v2_cfg()),
                            jax.random.key(0))
        assert v2["params"]["fpn"]["p6"]["kernel"].shape == (3, 3, 2048,
                                                             256)
        v1 = init_variables(make_detector(micro_retina_cfg()),
                            jax.random.key(0))
        assert v1["params"]["fpn"]["p6"]["kernel"].shape == (3, 3, 256,
                                                             256)

    def test_gn_towers_and_giou_loss(self):
        from podtpu.models.detector import init_variables, make_detector

        cfg = self.micro_v2_cfg()
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        head = variables["params"]["head"]
        assert {"cls_gn0", "cls_gn3", "box_gn0", "box_gn3"} <= set(head)
        # Normed tower convs have no bias.
        assert "bias" not in head["cls_conv0"]
        assert "bias" in head["cls_logits"]

        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)),
                             jnp.float32)
        gxy = rng.uniform(0, 80, (1, 8, 2)).astype(np.float32)
        gwh = rng.uniform(10, 40, (1, 8, 2)).astype(np.float32)
        gt = {"boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
              "labels": jnp.ones((1, 8), jnp.int32),
              "valid": jnp.ones((1, 8), bool)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        # GIoU regression is bounded in [0, 2] per foreground anchor
        # (normalised by num_fg), unlike unbounded encoded-delta L1.
        assert 0.0 <= float(losses["bbox_regression"]) <= 2.0
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (1, 8, 4)

    def test_v2_weight_import_roundtrip(self):
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (_conv,
                                           convert_torchvision_state_dict,
                                           retinanet_v2_key_map)

        cfg = self.micro_v2_cfg()
        variables = init_variables(make_detector(cfg), jax.random.key(0))
        rng = np.random.default_rng(0)
        sd, targets = {}, {}
        seen = set()
        for torch_key, (coll, path, tr) in retinanet_v2_key_map().items():
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
        assert "head.classification_head.conv.0.1.weight" in sd  # GN
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


class TestPostprocessIndexing:
    def test_hot_anchor_class_decodes_to_expected_box(self):
        """Pin the (anchor, class) decomposition of the per-level top-k:
        a single hot logit at a known anchor/class must come back as a
        detection at exactly that anchor's decoded box with that label."""
        from podtpu.models.detector import make_detector
        from podtpu.ops import boxes as box_ops
        from podtpu.ops.anchors import grid_anchors

        cfg = micro_retina_cfg()
        model = make_detector(cfg)
        anchors = [np.asarray(g) for g in grid_anchors(
            tuple(cfg.image_size), tuple(cfg.strides),
            tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))]
        counts = [a.shape[0] for a in anchors]
        total = sum(counts)
        c = cfg.num_classes
        # Hot pick: anchor 37 of level 1, class 2.
        hot_anchor_l1, hot_class = 37, 2
        flat_hot = counts[0] + hot_anchor_l1
        logits = np.full((1, total, c), -20.0, np.float32)
        logits[0, flat_hot, hot_class] = 8.0  # sigmoid ~ 0.9997
        deltas = np.zeros((1, total, 4), np.float32)
        deltas[0, flat_hot] = [0.1, -0.2, 0.05, 0.1]

        # Split back into levels and call the postprocess directly.
        level_logits, level_deltas, off = [], [], 0
        for n in counts:
            level_logits.append(jnp.asarray(logits[:, off:off + n]))
            level_deltas.append(jnp.asarray(deltas[:, off:off + n]))
            off += n
        bound = model.bind({"params": {}, "frozen": {}})
        det = bound._postprocess(level_logits, level_deltas,
                                 [jnp.asarray(a) for a in anchors])
        sc = np.asarray(det.scores[0])
        assert sc[0] > 0.99
        assert int(det.labels[0, 0]) == hot_class
        want = box_ops.clip_boxes(
            box_ops.decode_boxes(jnp.asarray(deltas[0, flat_hot]),
                                 jnp.asarray(anchors[1][hot_anchor_l1])),
            cfg.image_size)
        np.testing.assert_allclose(np.asarray(det.boxes[0, 0]),
                                   np.asarray(want), atol=1e-3)
        # Everything else is below the score threshold.
        assert int(np.asarray(det.valid[0]).sum()) == 1
