"""A/B the space-to-depth stem in the full train step."""
import json

from podtpu.core.profiling import slope_time

try:
    from tools.bench_common import BATCH, stepper, train_setup
except ImportError:  # run as `python tools/ab_stem.py`
    from bench_common import BATCH, stepper, train_setup


def bench(s2d):
    _, _, state, step, batch = train_setup(stem_space_to_depth=s2d)
    ms = slope_time(stepper(step, state, batch)) * 1e3
    print(json.dumps({"s2d": s2d, "train_step_ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    for s2d in (False, True):
        bench(s2d)
