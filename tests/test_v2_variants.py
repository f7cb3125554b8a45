"""v2 recipe variants (torchvision ``fasterrcnn_resnet50_fpn_v2`` /
``maskrcnn_resnet50_fpn_v2``): conv_depth-2 RPN tower, ConvFC box head,
normed FPN blocks and mask tower — the improved-recipe members of the
reference's vendored-trainer zoo dispatch (`engine/train.py:219-221`).
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, fasterrcnn_v2_config
from tests.conftest import tiny_config


def micro_v2_cfg(**kw):
    base = tiny_config().model
    cfg = fasterrcnn_v2_config(base)
    return dataclasses.replace(cfg, num_classes=3, **kw)


class TestConfig:
    def test_v2_config(self):
        cfg = fasterrcnn_v2_config(ModelConfig())
        assert cfg.family == "faster_rcnn"  # v2-ness lives in the fields
        assert cfg.rpn_conv_depth == 2
        assert cfg.box_head_type == "convfc"
        assert cfg.fpn_norm and cfg.mask_head_norm

    def test_build_model_spelling(self):
        from podtpu.models.detector import build_model

        _, cfg = build_model(3, family="faster_rcnn_v2")
        assert cfg.family == "faster_rcnn"
        assert cfg.box_head_type == "convfc"
        # Mask R-CNN v2.
        _, mcfg = build_model(3, family="faster_rcnn_v2", with_mask=True)
        assert mcfg.with_mask and mcfg.mask_head_norm

    def test_v2_rejects_mobilenet_backbones(self):
        """No torchvision v2 recipe exists for the mobilenet extractors;
        a silent half-applied recipe (fpn_norm recorded but not built)
        must not be constructible."""
        from podtpu.models.detector import build_model

        for bb in ("mobilenet_v2", "mobilenet_v3_fpn"):
            with pytest.raises(ValueError, match="ResNet-50-FPN"):
                build_model(3, family="faster_rcnn_v2", backbone=bb)


class TestModel:
    @pytest.fixture(scope="class")
    def setup(self):
        from podtpu.models.detector import init_variables, make_detector

        cfg = micro_v2_cfg(with_mask=True)
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        return cfg, model, variables

    def test_param_structure(self, setup):
        _, _, variables = setup
        p, f = variables["params"], variables["frozen"]
        # 2-deep RPN tower.
        assert "conv" in p["rpn_head"] and "conv2" in p["rpn_head"]
        # ConvFC box head: 4 convs + fc + predictors; norms frozen.
        assert {"conv1", "conv2", "conv3", "conv4", "fc", "cls",
                "reg"} <= set(p["box_head"])
        assert {"bn1", "bn2", "bn3", "bn4"} <= set(f["box_head"])
        # Normed FPN blocks.
        assert "lateral2_bn" in f["fpn"] and "post5_bn" in f["fpn"]
        # Normed mask tower.
        assert {"bn1", "bn2", "bn3", "bn4"} <= set(f["mask_head"])

    def test_train_and_eval(self, setup):
        cfg, model, variables = setup
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)),
                             jnp.float32)
        gxy = rng.uniform(10, 60, (1, 8, 2)).astype(np.float32)
        gwh = rng.uniform(20, 40, (1, 8, 2)).astype(np.float32)
        g = cfg.max_gt_boxes
        mh = 128 // cfg.mask_gt_stride
        gt = {"boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
              "labels": jnp.ones((1, g), jnp.int32),
              "valid": jnp.ones((1, g), bool),
              "masks": jnp.ones((1, g, mh, mh), jnp.float32)}
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                               "loss_classifier", "loss_box_reg",
                               "loss_mask"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        det, masks = model.apply(variables, images, train=False)
        assert det.boxes.shape[0] == 1
        assert masks.shape[2:] == (2 * cfg.mask_pool_size,
                                   2 * cfg.mask_pool_size)


class TestWeightImport:
    def test_map_spells_real_torchvision_keys(self):
        from podtpu.models.weights import fasterrcnn_v2_key_map

        m = fasterrcnn_v2_key_map()
        for key in (
            "backbone.body.conv1.weight",
            "backbone.fpn.inner_blocks.0.0.weight",
            "backbone.fpn.inner_blocks.0.1.running_mean",
            "backbone.fpn.layer_blocks.3.1.running_var",
            "rpn.head.conv.0.0.weight",
            "rpn.head.conv.1.0.weight",
            "roi_heads.box_head.0.0.weight",
            "roi_heads.box_head.3.1.running_mean",
            "roi_heads.box_head.5.weight",       # Linear after Flatten@4
            "roi_heads.box_predictor.cls_score.weight",
            "roi_heads.mask_head.0.0.weight",
            "roi_heads.mask_head.3.1.running_var",
            "roi_heads.mask_predictor.conv5_mask.weight",
        ):
            assert key in m, key
        # v1 spellings must NOT leak in.
        assert "roi_heads.box_head.fc6.weight" not in m
        assert "rpn.head.conv.weight" not in m

    def test_torchvision_layout_roundtrip(self):
        """A full fake v2 state_dict (torch layouts) imports into every
        mappable path, auto-detected from the 2-deep RPN tower."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.weights import (_conv, _dense, _deconv,
                                           convert_torchvision_state_dict,
                                           fasterrcnn_v2_key_map)

        cfg = micro_v2_cfg(with_mask=True)
        variables = init_variables(make_detector(cfg), jax.random.key(0))
        rng = np.random.default_rng(0)
        sd, targets = {}, {}
        for torch_key, (coll, path, tr) in fasterrcnn_v2_key_map().items():
            node = variables[coll]
            ok = True
            for k in path.split("/"):
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if not ok:
                continue  # class-count-dependent heads keep fresh init
            target = rng.normal(size=np.asarray(node).shape).astype(
                np.float32)
            targets[(coll, path)] = target
            if tr is _conv:
                sd[torch_key] = np.transpose(target, (3, 2, 0, 1))
            elif tr is _dense:
                sd[torch_key] = np.transpose(target, (1, 0))
            elif tr is _deconv:
                sd[torch_key] = np.transpose(target[::-1, ::-1],
                                             (2, 3, 0, 1))
            elif torch_key == "roi_heads.box_head.5.weight":
                w = target.reshape(7, 7, 256, -1)
                sd[torch_key] = np.transpose(w, (3, 2, 0, 1)).reshape(
                    -1, 7 * 7 * 256)
            else:
                sd[torch_key] = target
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


class TestV2E2E:
    @pytest.mark.slow
    def test_train_infer_roundtrip(self, synthetic_root, tmp_path):
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="v2", batch_size=2, max_epochs=2, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, family="faster_rcnn_v2",
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        import json
        with open(os.path.join(out, "config.json")) as fp:
            saved = json.load(fp)
        assert saved["model"]["box_head_type"] == "convfc"
        assert saved["model"]["rpn_conv_depth"] == 2

        from podtpu.infer.inference import load_inference_model
        eval_step, params, frozen, cfg, labels = load_inference_model(out)
        assert cfg.box_head_type == "convfc"
        rng = np.random.default_rng(0)
        images = (rng.uniform(0, 255, (1,) + tuple(cfg.image_size) + (3,))
                  .astype(np.uint8))
        det = eval_step(params, frozen, images)
        assert det.boxes.shape[0] == 1
