"""Convergence on the HARD synthetic benchmark (multi-class, multi-scale).

`tests.synthetic.make_hard_project`: 5 classes separated by shape alone
(colour randomised per instance), 18-170 px object scales across all FPN
levels, rotation, occlusion up to IoU 0.35, unannotated distractor
speckles and uneven illumination — a substantially harder task than the
single-class particle sets the other convergence tools use.

Trains the requested families through the product `train()` path at the
production 1024 canvas and reports held-out COCO stats.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/convergence_hard.py [faster_rcnn retinanet fcos] \
      > /tmp/conv_hard.log 2>&1 &
"""
import json
import sys
import tempfile

import jax

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.data.loader import Loader
from podtpu.models.detector import make_detector
from podtpu.train.checkpoints import load_model
from podtpu.train.evaluate import evaluate
from podtpu.train.step import make_eval_step
from podtpu.train.train import train
from tests.synthetic import HARD_CLASSES, make_hard_project

CANVAS = 1024
NUM_IMAGES = 200


def run_one(family, project, root, epochs=24):
    cfg = Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(warmup_iters=200, log_every=10,
                                   clip_grad_norm=10.0),
                 data=DataConfig(num_workers=4))
    # Backbone-variant rows (mobilenet trunks) ride train()'s --backbone
    # path; everything else is a --family.
    if family == "faster_rcnn":
        kwargs = {}
    elif family in ("mobilenet_v2", "mobilenet_v3_fpn",
                    "mobilenet_v3_320_fpn"):
        kwargs = {"backbone": family}
    else:
        kwargs = {"family": family}
    out = train(project, labels=list(HARD_CLASSES), output_dir=root,
                name=f"hard_{family}", batch_size=4, max_epochs=epochs,
                alrs_epochs=5, alrs_startup_factor=1, config=cfg,
                num_workers=4, seed=0, num_devices=1, **kwargs)
    print("trained:", out, flush=True)

    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, 4, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = make_detector(model_cfg)
    evaluator, stats = evaluate(make_eval_step(model), params, frozen,
                                loader, num_classes=len(labels),
                                verbose=True)
    print(evaluator.per_class_text(labels), flush=True)
    print(json.dumps({"benchmark": "hard_synthetic", "canvas": CANVAS,
                      "family": family, "images": NUM_IMAGES,
                      "epochs": epochs,
                      "mAP": round(stats[0], 4),
                      "AP50": round(stats[1], 4),
                      "AP75": round(stats[2], 4),
                      "AR300": round(stats[8], 4)}), flush=True)


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    # Each arg is "family" or "family:epochs" (one-stage families from
    # scratch on this task are still descending at 24 epochs).
    families = [(a.split(":")[0],
                 int(a.split(":")[1]) if ":" in a else 24)
                for a in sys.argv[1:]] or [("faster_rcnn", 24)]
    print("devices:", jax.devices(), "families:", families, flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_hard_")
    project = make_hard_project(root, num_images=NUM_IMAGES,
                                image_size=(CANVAS, CANVAS), max_boxes=24,
                                seed=7)
    counts = project.label_counts()
    print("dataset ready:", len(project.image_dict), "images,",
          sum(counts.values()), "boxes", dict(counts), flush=True)
    for family, epochs in families:
        run_one(family, project, root, epochs=epochs)


if __name__ == "__main__":
    main()
