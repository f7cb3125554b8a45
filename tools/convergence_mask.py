"""Mask R-CNN convergence evidence on TPU: train with_mask on synthetic
polygon annotations at a 512 canvas and report held-out bbox AND segm COCO
stats (the segm evaluator is podtpu's own — the reference's mask path was
dead code, `miso/object_detection/models.py:15-25`).

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/convergence_mask.py > /tmp/conv_mask.log 2>&1 &
"""
import json
import tempfile

import jax

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.data.loader import Loader
from podtpu.models.detector import FasterRCNN
from podtpu.train.checkpoints import load_model
from podtpu.train.evaluate import evaluate
from podtpu.train.step import make_eval_step
from podtpu.train.train import train
from tests.synthetic import make_project

CANVAS = 512


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_convmask_")
    project = make_project(root, num_images=48,
                           image_size=(CANVAS, CANVAS), max_boxes=6, seed=5,
                           polygons=True)
    cfg = Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                   compute_dtype="bfloat16",
                                   with_mask=True),
                 train=TrainConfig(warmup_iters=50, log_every=5),
                 data=DataConfig(num_workers=4))
    out = train(project, labels=["particle"], output_dir=root,
                name="convmask", batch_size=4, max_epochs=8, alrs_epochs=3,
                alrs_startup_factor=1, config=cfg, num_workers=4, seed=0,
                num_devices=1, with_mask=True)
    print("trained:", out, flush=True)

    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels, with_masks=True,
                               mask_stride=model_cfg.mask_gt_stride)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, 4, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = FasterRCNN(cfg=model_cfg)
    ev, stats = evaluate(make_eval_step(model), params, frozen, loader,
                         num_classes=len(labels), verbose=True)
    seg = getattr(ev, "segm_stats", None)
    print(json.dumps({
        "canvas": CANVAS,
        "bbox_mAP": round(stats[0], 4), "bbox_AP50": round(stats[1], 4),
        "segm_mAP": round(seg[0], 4) if seg is not None else None,
        "segm_AP50": round(seg[1], 4) if seg is not None else None,
    }), flush=True)


if __name__ == "__main__":
    main()
