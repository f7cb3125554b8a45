"""Faster R-CNN MobileNetV3-Large-FPN backbone variant
(podtpu/models/mobilenet_v3.py::MobileNetV3FPN).

Covers torchvision's ``fasterrcnn_mobilenet_v3_large_fpn`` and the
low-res ``fasterrcnn_mobilenet_v3_large_320_fpn`` recipe — two more
torchvision-zoo models the reference's vendored trainer dispatches to
(`engine/train.py:219-221`).
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, mobilenet_v3_fpn_config
from tests.conftest import tiny_config


def micro_mnv3_cfg(low_res=False):
    base = tiny_config().model
    cfg = mobilenet_v3_fpn_config(base, low_res=low_res)
    return dataclasses.replace(
        cfg, num_classes=3, image_size=(128, 128), max_gt_boxes=8,
        detections_per_image=8, compute_dtype="float32",
        rpn_pre_nms_topk_train=64, rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_train=64, rpn_post_nms_topk_test=32,
        box_batch_per_image=8)


class TestConfig:
    def test_fpn_config(self):
        cfg = mobilenet_v3_fpn_config(ModelConfig())
        assert cfg.backbone == "mobilenet_v3_fpn"
        # torchvision extractor geometry: two stride-32 taps + pool level.
        assert cfg.strides == (32, 32, 64)
        # 5 sizes x 3 ratios on every level.
        assert cfg.anchors_per_location == 15
        # All RoIs pool from map 0 (torchvision's collapsed scale setup).
        assert cfg.roi_strides == (32,)
        assert cfg.rpn_score_thresh == 0.0

    def test_320_recipe(self):
        cfg = mobilenet_v3_fpn_config(ModelConfig(), low_res=True)
        assert cfg.image_size == (320, 320)
        assert cfg.rpn_pre_nms_topk_test == 150
        assert cfg.rpn_post_nms_topk_test == 150
        assert cfg.rpn_score_thresh == 0.05

    def test_build_model_spellings(self):
        from podtpu.models.detector import build_model

        _, cfg = build_model(3, backbone="mobilenet_v3_fpn")
        assert cfg.backbone == "mobilenet_v3_fpn"
        assert cfg.image_size == ModelConfig().image_size
        _, cfg320 = build_model(3, backbone="mobilenet_v3_320_fpn")
        assert cfg320.backbone == "mobilenet_v3_fpn"
        assert cfg320.image_size == (320, 320)
        assert cfg320.rpn_score_thresh == 0.05

    def test_one_stage_families_reject_it(self):
        from podtpu.models.detector import build_model

        with pytest.raises(ValueError):
            build_model(3, family="retinanet", backbone="mobilenet_v3_fpn")
        with pytest.raises(ValueError):
            build_model(3, family="fcos", backbone="mobilenet_v3_fpn")


class TestBackbone:
    def test_tap_shapes(self):
        """The two taps are the 160-channel C4-block output and the
        960-channel final conv — both stride 32 (torchvision
        _mobilenet_extractor returned_layers=[4, 5])."""
        from podtpu.models.mobilenet_v3 import MobileNetV3FPN

        trunk = MobileNetV3FPN(dtype=jnp.float32)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = trunk.init(jax.random.key(0), x)
        c13, head = trunk.apply(variables, x)
        assert c13.shape == (1, 4, 4, 160)
        assert head.shape == (1, 4, 4, 960)

    def test_fpn_same_stride_topdown(self):
        """The FPN handles the two same-size inputs (identity top-down add)
        and emits the stride-2 max-pool extra level."""
        from podtpu.models.fpn import FPN

        fpn = FPN(out_channels=32, dtype=jnp.float32, first_level=0)
        ins = (jnp.ones((1, 4, 4, 160)), jnp.ones((1, 4, 4, 960)))
        variables = fpn.init(jax.random.key(0), ins)
        outs = fpn.apply(variables, ins)
        assert len(outs) == 3
        assert outs[0].shape == (1, 4, 4, 32)
        assert outs[1].shape == (1, 4, 4, 32)
        assert outs[2].shape == (1, 2, 2, 32)
        # Param names line up with the weight-import map.
        assert set(variables["params"]) == {"lateral0", "lateral1",
                                            "post0", "post1"}


class TestModel:
    @pytest.fixture(scope="class")
    def setup(self):
        from podtpu.models.detector import init_variables, make_detector

        cfg = micro_mnv3_cfg()
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        return cfg, model, variables

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
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                               "loss_classifier", "loss_box_reg"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (2, 8, 4)

    def test_rpn_score_thresh_filters(self, setup):
        """With rpn_score_thresh very high, no proposal survives ->
        detections all invalid; threshold 0 restores proposals."""
        cfg, model, variables = setup
        import dataclasses as dc

        from podtpu.models.detector import make_detector

        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)),
            jnp.float32)
        strict = make_detector(dc.replace(cfg, rpn_score_thresh=0.999999))
        det = strict.apply(variables, images, train=False)
        assert int(np.asarray(det.valid).sum()) == 0


class TestWeightImport:
    def test_map_spells_real_torchvision_keys(self):
        """Pin the exact key spellings of the UNSPLIT body (the round-trip
        test below synthesizes its checkpoint FROM the map, so it cannot
        catch a misspelt key): features[0]/[16] are Conv2dNormActivation
        (conv at .0, BN at .1 — no extra nesting), blocks nest under
        .block, and the FPN blocks allow the Conv2dNormActivation alias."""
        from podtpu.models.weights import fasterrcnn_mobilenet_v3_key_map

        m = fasterrcnn_mobilenet_v3_key_map()
        for key in (
            "backbone.body.0.0.weight",            # stem conv
            "backbone.body.0.1.running_mean",      # stem BN
            "backbone.body.1.block.0.0.weight",    # first block dw conv
            "backbone.body.4.block.2.fc1.weight",  # an SE squeeze conv
            "backbone.body.16.0.weight",           # final 960ch conv
            "backbone.body.16.1.running_var",      # final BN
            "backbone.fpn.inner_blocks.0.weight",
            "backbone.fpn.inner_blocks.1.0.weight",
            "rpn.head.cls_logits.weight",
            "roi_heads.box_predictor.bbox_pred.bias",
        ):
            assert key in m, key
        # The split-extractor spellings must NOT appear here.
        assert "backbone.body.0.0.0.weight" not in m
        assert "backbone.body.16.0.0.weight" not in m

    def test_torchvision_layout_roundtrip(self):
        """A full fake ``fasterrcnn_mobilenet_v3_large_fpn`` state_dict
        (unsplit body, 2-level FPN) imports into every mappable path,
        auto-detected from the body stem key."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (
            _conv, _dense, convert_torchvision_state_dict,
            fasterrcnn_mobilenet_v3_key_map)

        cfg = micro_mnv3_cfg()
        variables = init_variables(make_detector(cfg), jax.random.key(0))
        rng = np.random.default_rng(0)
        sd, targets = {}, {}
        seen = set()
        for torch_key, (coll, path, tr) in \
                fasterrcnn_mobilenet_v3_key_map().items():
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
                continue  # class-count heads etc.
            seen.add(dedupe)
            target = rng.normal(size=np.asarray(node).shape).astype(
                np.float32)
            targets[(coll, path)] = target
            if tr is _conv:
                sd[torch_key] = np.transpose(target, (3, 2, 0, 1))
            elif tr is _dense:
                sd[torch_key] = np.transpose(target, (1, 0))
            else:
                sd[torch_key] = target
        # fc6 consumes NCHW-flattened pooled features in torch layout.
        fc6 = targets.get(("params", "box_head/fc6/kernel"))
        if fc6 is not None:
            w = fc6.reshape(7, 7, 256, -1)
            sd["roi_heads.box_head.fc6.weight"] = (
                np.transpose(w, (3, 2, 0, 1)).reshape(-1, 7 * 7 * 256))
        assert len(sd) > 200  # trunk + fpn + heads all covered
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True)  # no key_map: auto-detect
        assert loaded == len(sd)
        assert not skipped
        for (coll, path), want in targets.items():
            node = out[coll]
            for k in path.split("/"):
                node = node[k]
            np.testing.assert_allclose(np.asarray(node), want, rtol=1e-6)


class TestE2E:
    @pytest.mark.slow
    def test_train_infer_roundtrip(self, synthetic_root, tmp_path):
        """Product path: train(backbone='mobilenet_v3_fpn') -> artifacts ->
        config.json rebuilds the variant for inference."""
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="mnv3fpn", batch_size=2, max_epochs=2, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, backbone="mobilenet_v3_fpn",
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        import json
        with open(os.path.join(out, "config.json")) as fp:
            saved = json.load(fp)
        assert saved["model"]["backbone"] == "mobilenet_v3_fpn"

        from podtpu.infer.inference import load_inference_model
        eval_step, params, frozen, cfg, labels = load_inference_model(out)
        assert cfg.backbone == "mobilenet_v3_fpn"
        rng = np.random.default_rng(0)
        images = (rng.uniform(0, 255, (1,) + tuple(cfg.image_size) + (3,))
                  .astype(np.uint8))
        det = eval_step(params, frozen, images)
        assert det.boxes.shape[0] == 1
