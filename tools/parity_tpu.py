"""mAP parity experiment on the real TPU (VERDICT #5).

Trains the detector on a synthetic held-out task, then scores the SAME
parameters under the four inference variants {approx_topk on/off} x
{Pallas RoIAlign on/off} to quantify the two documented approximation
risks (PARITY.md "Known deviations": approx_max_k recall ~0.9, Pallas
RoIAlign sample-point clamp).  Prints one JSON line per variant.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/parity_tpu.py > /tmp/parity.log 2>&1 &
"""
import dataclasses
import json
import tempfile

import numpy as np

import jax

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.data.loader import Loader
from podtpu.models.detector import FasterRCNN
from podtpu.train.evaluate import evaluate
from podtpu.train.step import make_eval_step
from podtpu.train.train import train
from tests.synthetic import make_project

CANVAS = 256


def main():
    print("devices:", jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_parity_")
    project = make_project(root, num_images=80, image_size=(CANVAS, CANVAS),
                           max_boxes=5, seed=7)

    model_cfg = ModelConfig(
        image_size=(CANVAS, CANVAS),
        rpn_pre_nms_topk_train=512, rpn_pre_nms_topk_test=512,
        rpn_post_nms_topk_train=512, rpn_post_nms_topk_test=256,
        box_batch_per_image=128, detections_per_image=32,
        max_gt_boxes=16, compute_dtype="bfloat16",
    )
    cfg = Config(model=model_cfg,
                 train=TrainConfig(warmup_iters=100, log_every=8),
                 data=DataConfig(num_workers=4))

    out_dir = train(
        project, labels=["particle"], output_dir=root, name="parity",
        batch_size=8, max_epochs=8, alrs_epochs=3, alrs_startup_factor=1,
        config=cfg, num_workers=4, seed=0, num_devices=1,
    )
    print("trained:", out_dir, flush=True)

    from podtpu.train.checkpoints import load_model
    params, frozen, saved_cfg, labels = load_model(out_dir)

    # Held-out split identical to train()'s.
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, 8, indices=test_idx, shuffle=False,
                    num_workers=4)

    for approx in (True, False):
        for pallas in (True, False):
            vcfg = dataclasses.replace(saved_cfg, approx_topk=approx,
                                       use_pallas_roi_align=pallas)
            model = FasterRCNN(cfg=vcfg)
            step = make_eval_step(model)
            _, stats = evaluate(step, params, frozen, loader,
                                num_classes=len(labels), verbose=False)
            print(json.dumps({
                "variant": f"approx={approx} pallas={pallas}",
                "mAP": round(stats[0], 4),
                "AP50": round(stats[1], 4),
                "AP75": round(stats[2], 4),
                "AR300": round(stats[8], 4),
            }), flush=True)


if __name__ == "__main__":
    main()
