"""Quick re-measure of eval forward + train step after kernel changes."""
import json

from podtpu.core.profiling import slope_time
from podtpu.train.step import make_eval_step

try:
    from tools.bench_common import BATCH, stepper, train_setup
except ImportError:  # run as `python tools/remeasure_step.py`
    from bench_common import BATCH, stepper, train_setup


def main():
    import jax

    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    model, cfg, state, step, batch = train_setup()

    eval_step = make_eval_step(model)
    ms = slope_time(lambda i: eval_step(state.params, state.frozen,
                                        batch["image"])) * 1e3
    print(json.dumps({"component": "eval_forward", "ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}), flush=True)

    ms = slope_time(stepper(step, state, batch)) * 1e3
    print(json.dumps({"component": "train_step_full", "ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
