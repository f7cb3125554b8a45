"""MobileNetV2 detector family (reference
`miso/instance_segmentation/training.py:7-36`): backbone, multi-size
anchors, detector assembly, weight import."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, mobilenet_config
from podtpu.ops.anchors import cell_anchors, grid_anchors


def tiny_mobilenet_cfg():
    return mobilenet_config(ModelConfig(
        image_size=(128, 128),
        rpn_pre_nms_topk_train=128,
        rpn_pre_nms_topk_test=128,
        rpn_post_nms_topk_train=64,
        rpn_post_nms_topk_test=32,
        box_batch_per_image=16,
        detections_per_image=8,
        max_gt_boxes=4,
        compute_dtype="float32",
    ))


class TestMultiSizeAnchors:
    def test_cell_anchor_count_and_order(self):
        a = cell_anchors((32.0, 64.0), (0.5, 1.0, 2.0))
        assert a.shape == (6, 4)
        # ratio-major, size-minor (torchvision AnchorGenerator order):
        # entries 0,1 are ratio .5 at sizes 32, 64.
        np.testing.assert_allclose(a[0], [-23, -11, 23, 11])
        np.testing.assert_allclose(a[1], [-45, -23, 45, 23])
        # entry 2 is ratio 1.0 at size 32.
        np.testing.assert_allclose(a[2], [-16, -16, 16, 16])

    def test_scalar_size_unchanged(self):
        a_scalar = cell_anchors(32.0, (0.5, 1.0, 2.0))
        a_tuple = cell_anchors((32.0,), (0.5, 1.0, 2.0))
        np.testing.assert_array_equal(a_scalar, a_tuple)
        assert a_scalar.shape == (3, 4)

    def test_single_level_grid(self):
        grids = grid_anchors((128, 128), strides=(32,),
                             sizes=((32.0, 64.0, 128.0, 256.0, 512.0),),
                             aspect_ratios=(0.5, 1.0, 2.0))
        assert len(grids) == 1
        assert grids[0].shape == (4 * 4 * 15, 4)

    def test_config_anchors_per_location(self):
        assert ModelConfig().anchors_per_location == 3
        assert tiny_mobilenet_cfg().anchors_per_location == 15


class TestMobileNetBackbone:
    def test_feature_shape_and_stride(self):
        from podtpu.models.mobilenet import MobileNetV2

        m = MobileNetV2(dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = m.init(jax.random.key(0), x)
        (feat,) = m.apply(variables, x)
        assert feat.shape == (1, 2, 2, 1280)  # stride 32, 1280 channels

    def test_frozen_stages_have_zero_grad(self):
        from podtpu.models.mobilenet import MobileNetV2

        m = MobileNetV2(dtype=jnp.float32, trainable_stages=3)
        x = jnp.ones((1, 32, 32, 3), jnp.float32)
        variables = m.init(jax.random.key(0), x)

        def loss(params):
            (f,) = m.apply({"params": params,
                            "frozen": variables["frozen"]}, x)
            return jnp.sum(f.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(variables["params"])
        # Units 0-1 frozen: stem and block1..block3 get zero grads.
        assert float(jnp.abs(g["stem"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(g["block2"]["dw"]["kernel"]).max()) == 0.0
        # Trainable tail gets real gradient.
        assert float(jnp.abs(g["head"]["kernel"]).max()) > 0.0


class TestMobileNetDetector:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from podtpu.models.detector import FasterRCNN, init_variables

        cfg = tiny_mobilenet_cfg()
        model = FasterRCNN(cfg=cfg)
        variables = init_variables(model, jax.random.key(0))
        return model, variables, cfg

    def test_train_losses(self, model_and_vars):
        model, variables, cfg = model_and_vars
        images = jnp.zeros((2, 128, 128, 3), jnp.float32)
        gt = {
            "boxes": jnp.asarray([[[10.0, 10, 60, 60], [0, 0, 0, 0],
                                   [0, 0, 0, 0], [0, 0, 0, 0]]] * 2),
            "labels": jnp.asarray([[1, 0, 0, 0]] * 2, jnp.int32),
            "valid": jnp.asarray([[True, False, False, False]] * 2),
        }
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                               "loss_classifier", "loss_box_reg"}
        for v in losses.values():
            assert np.isfinite(float(v))

    def test_inference_shapes(self, model_and_vars):
        model, variables, cfg = model_and_vars
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (1, cfg.detections_per_image, 4)
        assert det.labels.shape == (1, cfg.detections_per_image)

    def test_build_model_factory(self):
        from podtpu.models.detector import build_model

        model, cfg = build_model(3, backbone="mobilenet_v2")
        assert cfg.backbone == "mobilenet_v2"
        assert cfg.strides == (32,)
        assert cfg.anchors_per_location == 15
        assert cfg.roi_strides == (32,)


class TestMobileNetTrainE2E:
    def test_train_and_reload(self, tmp_path):
        """Product path: train(backbone='mobilenet_v2') completes, and the
        saved model reloads with the right family + runs inference."""
        from podtpu.core.config import Config
        from podtpu.models.detector import FasterRCNN
        from podtpu.train.checkpoints import load_model
        from podtpu.train.train import train
        from tests.conftest import tiny_config
        from tests.synthetic import make_project

        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, model=tiny_mobilenet_cfg())
        project = make_project(str(tmp_path / "imgs"), num_images=4)
        out = train(project, labels=["particle"],
                    output_dir=str(tmp_path / "models"), name="mnet",
                    batch_size=2, max_epochs=1, alrs_epochs=2,
                    alrs_startup_factor=1, config=cfg, num_workers=2,
                    backbone="mobilenet_v2")
        params, frozen, model_cfg, labels = load_model(out)
        assert model_cfg.backbone == "mobilenet_v2"
        assert model_cfg.strides == (32,)
        assert isinstance(model_cfg.anchor_sizes[0], tuple)
        model = FasterRCNN(cfg=model_cfg)
        det = model.apply({"params": params, "frozen": frozen},
                          jnp.zeros((1, *model_cfg.image_size, 3)),
                          train=False)
        assert det.boxes.shape[1] == model_cfg.detections_per_image


class TestMobileNetWeightImport:
    def test_imagenet_state_dict_round_trip(self):
        from podtpu.models.mobilenet import MobileNetV2
        from podtpu.models.weights import (convert_torchvision_state_dict,
                                           mobilenet_v2_key_map)
        from tests.test_weights import torch_layout_inverse

        m = MobileNetV2(dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.tree.map(np.asarray,
                                 m.init(jax.random.key(0), x))
        # Build a fake torchvision state_dict with recognisable values for
        # every mapped key, round-trip it, and check every leaf changed to
        # the expected value.
        key_map = mobilenet_v2_key_map(prefix="")
        rng = np.random.default_rng(0)
        sd = {}
        for torch_key, (coll, path, transform) in key_map.items():
            node = variables[coll]
            ok = True
            for k in [p for p in path.split("/") if p]:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            assert ok, f"unmapped path {path}"
            target = rng.normal(size=np.asarray(node).shape).astype(
                np.float32)
            sd[torch_key] = torch_layout_inverse(
                target, transform.__name__.lstrip("_"))

        # The detector nests the backbone under 'backbone'; here the module
        # IS the tree root, so remap with the empty prefix.
        out, (loaded, skipped) = convert_torchvision_state_dict(
            sd, variables, return_stats=True,
            key_map=mobilenet_v2_key_map(prefix=""))
        assert loaded == len(sd)
        assert skipped == []
        # Spot-check one depthwise conv came through in the right layout.
        got = out["params"]["block2"]["dw"]["kernel"]
        want_torch = sd["features.2.conv.1.0.weight"]
        np.testing.assert_allclose(
            got, np.transpose(want_torch, (2, 3, 1, 0)), rtol=1e-6)
