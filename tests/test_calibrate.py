"""FrozenBN statistics calibration (podtpu/train/calibrate.py)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig, mobilenet_v3_fpn_config
from tests.conftest import tiny_config


def _sample_images(seed=1, n=2, size=128):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0.1, 0.3, (n, size, size, 3)).astype(np.float32)
    img[:, 30:70, 20:60] = 0.9
    return jnp.asarray(img)


class TestCalibration:
    def test_restores_mobilenet_v3_feature_scale(self):
        """Identity-init FrozenBN leaves the MobileNetV3 trunk's taps at
        ~1e-4 mean activation (the signal vanishes through 15 hardswish/SE
        blocks); calibration restores an O(1) scale."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.train.calibrate import calibrate_frozen_stats

        cfg = dataclasses.replace(
            mobilenet_v3_fpn_config(tiny_config().model), num_classes=2,
            compute_dtype="float32", trainable_backbone_stages=5)
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        images = _sample_images()

        def tap_scale(v):
            feats = model.apply(v, images,
                                method=lambda m, x: m._features(x))
            return float(np.abs(np.asarray(feats[0])).mean())

        before = tap_scale(variables)
        assert before < 1e-2  # the vanishing-signal symptom
        calibrated = calibrate_frozen_stats(model, variables, images)
        after = tap_scale(calibrated)
        assert 0.05 < after < 50.0, (before, after)

    def test_auto_criterion_separates_backbones(self):
        """needs_calibration fires for the vanishing MobileNetV3 trunk and
        stays off for ResNet and MobileNetV2 (which train better plain)."""
        from podtpu.core.config import mobilenet_config
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.train.calibrate import needs_calibration

        images = _sample_images()
        mnv3 = dataclasses.replace(
            mobilenet_v3_fpn_config(tiny_config().model), num_classes=2,
            compute_dtype="float32", trainable_backbone_stages=5)
        m3 = make_detector(mnv3)
        assert needs_calibration(m3, init_variables(m3, jax.random.key(0)),
                                 images)
        resnet = dataclasses.replace(tiny_config().model, num_classes=2,
                                     compute_dtype="float32")
        mr = make_detector(resnet)
        assert not needs_calibration(
            mr, init_variables(mr, jax.random.key(0)), images)
        mnv2 = dataclasses.replace(mobilenet_config(tiny_config().model),
                                   num_classes=2, compute_dtype="float32",
                                   trainable_backbone_stages=5)
        m2 = make_detector(mnv2)
        assert not needs_calibration(
            m2, init_variables(m2, jax.random.key(0)), images)

    def test_stats_are_finite_and_bounded(self):
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.train.calibrate import calibrate_frozen_stats

        cfg = dataclasses.replace(
            mobilenet_v3_fpn_config(tiny_config().model), num_classes=2,
            compute_dtype="float32", trainable_backbone_stages=5)
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        out = calibrate_frozen_stats(model, variables, _sample_images())

        def check(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    check(v)
            if "mean" in node and "var" in node:
                assert np.isfinite(node["mean"]).all()
                assert np.isfinite(node["var"]).all()
                assert (node["var"] >= 1e-4 - 1e-9).all()
                assert (np.abs(node["mean"]) <= 1e3).all()

        check(out["frozen"])

    def test_bn_free_backbone_is_noop(self):
        """SSD-VGG16 has no FrozenBN: calibration returns unchanged."""
        from podtpu.core.config import ssd_config
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.train.calibrate import calibrate_frozen_stats

        cfg = dataclasses.replace(ssd_config(), num_classes=2,
                                  detections_per_image=4, max_gt_boxes=4,
                                  ssd_topk_per_class=8,
                                  compute_dtype="float32")
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        assert not variables.get("frozen")
        out = calibrate_frozen_stats(model, variables,
                                     _sample_images(size=300))
        assert not out.get("frozen")

    def test_resnet_stats_match_observed_batch(self):
        """After calibration the stem BN's stats equal the observed input
        statistics (identity affine: output stats == input stats), so its
        normalised output is ~zero-mean unit-var on the sample batch."""
        from podtpu.models.detector import init_variables, make_detector
        from podtpu.models.resnet import FrozenBatchNorm
        from podtpu.train.calibrate import calibrate_frozen_stats

        cfg = dataclasses.replace(tiny_config().model, num_classes=2,
                                  compute_dtype="float32")
        model = make_detector(cfg)
        variables = init_variables(model, jax.random.key(0))
        images = _sample_images()
        out = calibrate_frozen_stats(model, variables, images)

        _, state = model.apply(
            out, images, method=lambda m, x: m._features(x),
            capture_intermediates=lambda mdl, _:
                isinstance(mdl, FrozenBatchNorm),
            mutable=["intermediates"])
        o = np.asarray(
            state["intermediates"]["backbone"]["bn1"]["__call__"][0],
            np.float32)
        assert abs(o.mean()) < 0.1
        assert 0.5 < o.std() < 2.0
