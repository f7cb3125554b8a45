"""Spatial partitioning (one canvas sharded over the mesh) vs the
single-device forward: same detections."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN
from podtpu.parallel.spatial import make_spatial_eval_step, spatial_mesh
from podtpu.train.step import make_eval_step


def spatial_cfg():
    # 256 canvas: P6 is 4 rows — divisible by a 2- or 4-device sp axis.
    return ModelConfig(
        num_classes=2,
        image_size=(256, 256),
        rpn_pre_nms_topk_test=64,
        rpn_post_nms_topk_test=32,
        detections_per_image=8,
        max_gt_boxes=4,
        compute_dtype="float32",
    )


class TestSpatialPartitioning:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = spatial_cfg()
        model = FasterRCNN(cfg=cfg)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 256, 256, 3)), train=False)
        rng = np.random.default_rng(0)
        # Blobby image so there are real detections to compare.
        images = rng.uniform(0, 0.2, (1, 256, 256, 3)).astype(np.float32)
        images[0, 60:120, 60:130] = 0.9
        images[0, 170:220, 150:200] = 0.8
        return model, variables, jnp.asarray(images)

    @pytest.mark.parametrize("n_dev", [2, 4])
    @pytest.mark.parametrize("shard_rois", [False, True])
    def test_matches_single_device(self, setup, n_dev, shard_rois):
        """Both RoI modes: replicated heads (shard_rois=False) and the
        round-5 box-axis-sharded RoI stage (the decomposition measured
        replicated RoI heads as ~all the spatial overhead)."""
        model, variables, images = setup
        params, frozen = variables["params"], variables["frozen"]

        ref = make_eval_step(model)(params, frozen, images)

        mesh = spatial_mesh(jax.devices()[:n_dev])
        step = make_spatial_eval_step(model, mesh, shard_rois=shard_rois)
        got = step(params, frozen, images)

        # GSPMD is semantics-preserving; only reduction-order noise allowed.
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
        np.testing.assert_array_equal(np.asarray(got.labels),
                                      np.asarray(ref.labels))
        np.testing.assert_allclose(np.asarray(got.scores),
                                   np.asarray(ref.scores), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.boxes),
                                   np.asarray(ref.boxes), atol=1e-2)

    def test_infer_tiled_spatial_product_path(self, synthetic_root,
                                              trained_model):
        """infer_tiled(tile_size=..., spatial_devices=2): giant-tile path
        through the product API, detections inside the scan bounds."""
        from PIL import Image

        from podtpu.infer.tiled import infer_tiled

        imgs = sorted((synthetic_root / "images").glob("*.jpg"))[:4]
        tiles = [np.asarray(Image.open(p)) for p in imgs]
        top = np.concatenate(tiles[:2], axis=1)
        bot = np.concatenate(tiles[2:], axis=1)
        scan = np.concatenate([top, bot], axis=0)
        dets = infer_tiled(scan, trained_model, threshold=0.05,
                           overlap=0.25, batch_size=2, tile_size=256,
                           spatial_devices=2)
        assert len(dets) > 0
        for d in dets:
            x1, y1, x2, y2 = d.box
            assert 0 <= x1 <= x2 <= scan.shape[1]
            assert 0 <= y1 <= y2 <= scan.shape[0]

    def test_input_actually_sharded(self, setup):
        """The compiled program really consumes a spatially sharded input
        (not a silent full replication of the image)."""
        model, variables, images = setup
        mesh = spatial_mesh(jax.devices()[:2])
        step = make_spatial_eval_step(model, mesh)
        lowered = step.lower(variables["params"], variables["frozen"], images)
        compiled = lowered.compile()
        in_sh = compiled.input_shardings[0]
        img_sharding = jax.tree.leaves(in_sh)[-1]
        from jax.sharding import PartitionSpec as P
        assert img_sharding.spec == P(None, "sp")
