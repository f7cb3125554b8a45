"""Test configuration: fast CPU-only JAX with an 8-device virtual platform.

The container's `sitecustomize` registers the axon TPU plugin and calls
``jax.config.update("jax_platforms", "axon,cpu")`` — which *overrides* the
``JAX_PLATFORMS`` env var and silently routes every test onto the tunneled
TPU chip with ~8 s remote compiles.  Undo that here with a config update of
our own (conftest runs before any test imports jax), and force 8 virtual CPU
devices so multi-device sharding tests exercise the DP/`shard_map` paths
without a real TPU pod (SURVEY.md §4: multi-device tests on CPU via
--xla_force_host_platform_device_count).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def tiny_config():
    """Small-canvas config used by the e2e train/infer tests."""
    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig

    model = ModelConfig(
        image_size=(128, 128),
        rpn_pre_nms_topk_train=128,
        rpn_pre_nms_topk_test=128,
        rpn_post_nms_topk_train=128,
        rpn_post_nms_topk_test=64,
        box_batch_per_image=32,
        detections_per_image=16,
        max_gt_boxes=8,
        compute_dtype="float32",
    )
    train = TrainConfig(warmup_iters=10, log_every=1)
    data = DataConfig(num_workers=2, photometric_distort=False)
    return Config(model=model, train=train, data=data)


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    from tests.synthetic import make_project

    root = tmp_path_factory.mktemp("synthetic")
    make_project(str(root / "images"), num_images=10)
    return root


@pytest.fixture(scope="session")
def trained_model(synthetic_root):
    """Train once per test session; shared by e2e + inference tests."""
    from podtpu.train.train import train
    from tests.synthetic import make_project

    project = make_project(str(synthetic_root / "images"), num_images=10)
    out = train(
        project,
        labels=["particle"],
        output_dir=str(synthetic_root / "models"),
        name="e2e",
        batch_size=2,
        max_epochs=2,
        alrs_epochs=2,
        alrs_startup_factor=1,
        config=tiny_config(),
        num_workers=2,
        seed=0,
    )
    return out
