"""RetinaNet throughput at the bench operating point (b4, 1024, bf16)."""
import json

import jax

from podtpu.core.config import Config, DataConfig, TrainConfig, \
    retinanet_config
from podtpu.core.profiling import slope_time
from podtpu.models.detector import init_variables, make_detector
from podtpu.train.optim import make_optimizer
from podtpu.train.step import create_train_state, make_eval_step, \
    make_train_step

try:
    from tools.bench_common import BATCH, CANVAS, stepper, synthetic_batch
except ImportError:  # run as `python tools/bench_retinanet.py`
    from bench_common import BATCH, CANVAS, stepper, synthetic_batch


def main():
    print("devices:", jax.devices(), flush=True)
    from podtpu.core.config import ModelConfig

    model_cfg = retinanet_config(ModelConfig(
        num_classes=3, image_size=(CANVAS, CANVAS),
        compute_dtype="bfloat16"))
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    model = make_detector(model_cfg)
    variables = init_variables(model, jax.random.key(0))
    batch = synthetic_batch(BATCH, CANVAS, model_cfg.max_gt_boxes)

    eval_step = make_eval_step(model)
    ms = slope_time(lambda i: eval_step(variables["params"],
                                        variables["frozen"],
                                        batch["image"])) * 1e3
    print(json.dumps({"component": "retinanet_eval_forward",
                      "ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}),
          flush=True)

    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    ms = slope_time(stepper(step, state, batch)) * 1e3
    print(json.dumps({"component": "retinanet_train_step",
                      "ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
