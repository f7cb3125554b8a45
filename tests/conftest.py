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
