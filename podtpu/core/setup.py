"""Runtime setup helpers: compilation cache, distributed bring-up.

The reference has no equivalent — torch caches nothing and NCCL init lives
in `miso/object_detection/engine/utils.py:260-283`.  On TPU, XLA compiles
each program shape from scratch (minutes per program on remote-compile
setups); the persistent compilation cache makes the second run of any
command start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Point JAX's persistent compilation cache at a durable directory.

    Called by the CLI entry point; set ``PODTPU_NO_COMPILE_CACHE=1`` to
    disable, ``PODTPU_COMPILE_CACHE=<dir>`` to relocate.  Safe to call
    multiple times.  Returns the cache directory (or "" when disabled).
    """
    if os.environ.get("PODTPU_NO_COMPILE_CACHE"):
        return ""
    import sys

    cache_dir = (cache_dir
                 or os.environ.get("PODTPU_COMPILE_CACHE")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "podtpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    if "jax" not in sys.modules:
        # jax reads these at first import: configuring via env keeps jax
        # (multi-second import + backend plugin registration) OFF the CLI
        # startup path — `podtpu --help` stays instant.
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                              "0")
        return cache_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program (default only caches slow-to-compile ones).
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # knob names vary across jax versions; the dir alone suffices
    return cache_dir
