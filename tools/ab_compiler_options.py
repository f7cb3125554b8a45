"""A/B TPU compiler options on the full train step via the AOT compile
path (client-side XLA_FLAGS cannot reach a tunneled TPU backend; per-
program ``compiler_options`` can).  One JSON line per variant.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.profiling import slope_time

try:
    from tools.bench_common import BATCH, train_setup
except ImportError:  # run as `python tools/ab_compiler_options.py`
    from bench_common import BATCH, train_setup

VARIANTS = {
    "baseline": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "sched_rerun": {"xla_latency_hiding_scheduler_rerun": "3"},
}


def main():
    print("devices:", jax.devices(), flush=True)
    _, _, state0, step, batch = train_setup()
    rng_key = jax.random.key(1)
    lowered = step.lower(state0, batch, rng_key, jnp.float32(0.005))
    # The step donates its state argument: snapshot on host so every
    # variant starts from an intact copy.
    state_host = jax.tree.map(np.asarray, state0)

    for name, opts in VARIANTS.items():
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        holder = {"state": jax.device_put(
            jax.tree.map(jnp.asarray, state_host), jax.devices()[0])}

        def step_once(i, compiled=compiled, holder=holder):
            holder["state"], m = compiled(holder["state"], batch,
                                          jax.random.fold_in(rng_key, i),
                                          jnp.float32(0.005))
            return m["loss"]

        try:
            ms = slope_time(step_once) * 1e3
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "ms": round(ms, 2),
                          "img_per_sec": round(BATCH / ms * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
