"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests exercise the DP/`shard_map` paths without real TPU
pods (mirrors the reference's lack of multi-GPU CI; see SURVEY.md §4).  Must be
set before JAX initialises its backends, hence module-level in conftest.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep per-test compile times sane on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")
