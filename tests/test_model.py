"""Model assembly tests: shapes, finiteness, train/eval paths."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN, build_model


def small_cfg(**kw):
    base = dict(
        num_classes=3,
        image_size=(128, 128),
        rpn_pre_nms_topk_train=64,
        rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_train=64,
        rpn_post_nms_topk_test=32,
        box_batch_per_image=16,
        detections_per_image=8,
        max_gt_boxes=4,
        compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def make_gt(batch=2, g=4):
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 80, (batch, g, 2)).astype(np.float32)
    wh = rng.uniform(8, 40, (batch, g, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=-1)
    return {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(rng.integers(1, 3, (batch, g)), jnp.int32),
        "valid": jnp.asarray([[True, True, True, False]] * batch),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = FasterRCNN(cfg=cfg)
    images = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), images, train=False)
    return model, variables, cfg


class TestFasterRCNN:
    def test_param_structure(self, model_and_params):
        _, variables, _ = model_and_params
        assert set(variables.keys()) == {"params", "frozen"}
        params = variables["params"]
        assert {"backbone", "fpn", "rpn_head", "box_head"} <= set(params.keys())
        # ResNet-50 backbone: stem + 3+4+6+3 blocks.
        assert "layer4_2" in params["backbone"]

    def test_eval_outputs(self, model_and_params):
        model, variables, cfg = model_and_params
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
        det = model.apply(variables, images, train=False)
        assert det.boxes.shape == (2, 8, 4)
        assert det.scores.shape == (2, 8)
        assert det.labels.shape == (2, 8)
        assert bool(jnp.isfinite(det.boxes).all())
        # Boxes inside canvas.
        assert float(det.boxes.min()) >= 0.0
        assert float(det.boxes.max()) <= 128.0
        # Labels of valid detections are in [1, num_classes-1].
        v = np.asarray(det.valid)
        labels = np.asarray(det.labels)
        if v.any():
            assert labels[v].min() >= 1 and labels[v].max() <= 2

    def test_train_losses(self, model_and_params):
        model, variables, cfg = model_and_params
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
        losses = model.apply(variables, images, gt=make_gt(), train=True,
                             rng=jax.random.key(3))
        assert set(losses.keys()) == {
            "loss_objectness", "loss_rpn_box_reg",
            "loss_classifier", "loss_box_reg"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
            assert float(v) >= 0, k

    def test_grads_flow_and_frozen_stages(self, model_and_params):
        model, variables, cfg = model_and_params
        images = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (2, 128, 128, 3)), jnp.float32)
        gt = make_gt()

        def loss_fn(params):
            losses = model.apply(
                {"params": params, "frozen": variables["frozen"]},
                images, gt=gt, train=True, rng=jax.random.key(0))
            return sum(losses.values())

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        g_norm = {"/".join(str(p.key) for p in path): float(jnp.abs(g).sum())
                  for path, g in flat}
        # Trainable: layer2..4, fpn, heads get gradient.
        assert any(v > 0 for k, v in g_norm.items() if "layer3" in k)
        assert any(v > 0 for k, v in g_norm.items() if "fpn" in k)
        assert any(v > 0 for k, v in g_norm.items() if "rpn_head" in k)
        assert any(v > 0 for k, v in g_norm.items() if "box_head" in k)
        # Frozen: stem + layer1 get exactly zero gradient.
        assert all(v == 0 for k, v in g_norm.items()
                   if k.startswith("backbone/conv1") or "layer1_" in k)

    def test_mask_variant(self):
        cfg = dataclasses.replace(small_cfg(), with_mask=True,
                                  mask_pool_size=7, mask_resolution=14)
        model = FasterRCNN(cfg=cfg)
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.key(0), images, train=False)
        det, masks = model.apply(variables, images, train=False)
        assert masks.shape == (1, cfg.detections_per_image, 14, 14)
        gt = {k: v[:1] for k, v in make_gt(1).items()}
        gt["masks"] = jnp.ones((1, 4, 32, 32), jnp.float32)
        losses = model.apply(variables, images, gt=gt, train=True,
                             rng=jax.random.key(1))
        assert "loss_mask" in losses
        assert np.isfinite(float(losses["loss_mask"]))


class TestStemSpaceToDepth:
    def test_equivalent_to_standard_conv(self):
        """4x4/s1 conv on 2x2 space-to-depth input == 7x7/s2 conv, exactly
        (same conv1/kernel parameter)."""
        from podtpu.models.resnet import StemConv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        m_std = StemConv(dtype=jnp.float32, space_to_depth=False)
        m_s2d = StemConv(dtype=jnp.float32, space_to_depth=True)
        v = m_std.init(jax.random.key(0), x)
        out_std = m_std.apply(v, x)
        out_s2d = m_s2d.apply(v, x)
        assert out_std.shape == out_s2d.shape == (2, 16, 16, 64)
        assert float(jnp.abs(out_std - out_s2d).max()) < 1e-4

    def test_param_path_unchanged(self):
        """The stem parameter stays at backbone/conv1/kernel [7,7,3,64] so
        checkpoints and the torchvision import keep working."""
        from podtpu.models.resnet import ResNet

        bb = ResNet(stage_sizes=(3, 4, 6, 3), dtype=jnp.float32)
        v = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        assert v["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    def test_gradients_flow_through_s2d_kernel_reshape(self):
        from podtpu.models.resnet import StemConv

        m = StemConv(dtype=jnp.float32, space_to_depth=True)
        x = jnp.ones((1, 16, 16, 3))
        v = m.init(jax.random.key(0), x)

        def loss(p):
            return jnp.sum(m.apply({"params": p}, x) ** 2)

        g = jax.grad(loss)(v["params"])
        assert g["kernel"].shape == (7, 7, 3, 64)
        assert float(jnp.abs(g["kernel"]).max()) > 0


def test_build_model_factory():
    model, cfg = build_model(5)
    assert cfg.num_classes == 5
    model, cfg = build_model(3, with_mask=True)
    assert cfg.with_mask
