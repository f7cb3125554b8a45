"""Root-cause the mobilenet_v3_fpn hard-task 0.000 (round-4 `conv_hard_mnv3.log`).

Round 4 trained mobilenet_v3_fpn on the hard 5-class task through the
generic hard-tool recipe — lr 0.005, 24 epochs, alrs_epochs 5 — and
scored 0.000 on every COCO stat while RPN objectness plateaued at ~0.33
and ALRS consumed its LR drops on the loss plateau.  But the family's
own documented from-scratch recipe (PARITY.md family table,
`tools/convergence_families.py`) is **lr 0.01 / 48 epochs**: the easy
512-canvas row needed all of that to reach 0.4466 — this trunk is the
slowest-converging family in the zoo from scratch (torchvision never
trains it from scratch either; its zoo entry is ImageNet-pretrained,
`/root/reference/miso/object_detection/engine/train.py:219-221` model
dispatch + pretrained-first `models.py:8-9`).  The variants here
isolate whether the zero was recipe starvation or a real 1024-canvas
pathology:

  recipe   lr 0.01, 48 epochs, alrs_epochs 8  (the family recipe at 1024)
  midlr24  lr 0.01, 24 epochs, alrs_epochs 5  (same budget as r4, right lr)
  nocal    `recipe` with calibrate_bn=False   (is calibration hurting at 1024?)
  repro    the exact r4 recipe (lr 0.005, 24 ep) — baseline confirmation
  up2      `recipe` with the task RENDERED at 512 and upscaled to the 1024
           canvas — the documented mobilenet_v2 small-object recipe applied
           to this family: it doubles every object's extent in stride-32
           cells (the hard task's native 18-170 px draw leaves 53% of gts
           under 2 cells at stride 32, vs 0% for the flagship's stride-4..32
           pyramid — tools/probe_mnv3.py)

Per-epoch COCO stats print from train()'s epoch loop, so the log records
the full mAP trajectory, not just the endpoint.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u \
      tools/diagnose_mnv3.py recipe
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

# name -> (lr, epochs, alrs_epochs, calibrate_bn, render, task, backbone)
# The `mnv2_hard_up2` / `easy_up2` rows are DIFFERENTIALS that partition
# the hypothesis space after `up2` also scored 0.000 (j30): does ANY
# stride-32 family learn the hard task at the up2 rendering
# (mobilenet_v2, the family whose up2 recipe measured 0.79 on the easy
# task)?  And does mobilenet_v3_fpn learn the EASY task at the 1024
# canvas (isolating canvas-specific breakage from task hardness)?
VARIANTS = {
    "recipe": (0.01, 48, 8, "auto", CANVAS, "hard", "mobilenet_v3_fpn"),
    "midlr24": (0.01, 24, 5, "auto", CANVAS, "hard", "mobilenet_v3_fpn"),
    "nocal": (0.01, 48, 8, False, CANVAS, "hard", "mobilenet_v3_fpn"),
    "repro": (0.005, 24, 5, "auto", CANVAS, "hard", "mobilenet_v3_fpn"),
    "up2": (0.01, 48, 8, "auto", 512, "hard", "mobilenet_v3_fpn"),
    "mnv2_hard_up2": (0.01, 48, 8, "auto", 512, "hard", "mobilenet_v2"),
    "easy_up2": (0.01, 48, 8, "auto", 512, "easy", "mobilenet_v3_fpn"),
}


def run_variant(name, project, root):
    lr, epochs, alrs_epochs, calibrate, _, task, backbone = VARIANTS[name]
    print(f"\n##### variant {name}: lr={lr} epochs={epochs} "
          f"alrs_epochs={alrs_epochs} calibrate_bn={calibrate}", flush=True)
    labels = list(HARD_CLASSES) if task == "hard" else ["particle"]
    cfg = Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(warmup_iters=200, log_every=10,
                                   clip_grad_norm=10.0, lr=lr,
                                   calibrate_bn=calibrate),
                 data=DataConfig(num_workers=4))
    out = train(project, labels=labels, output_dir=root,
                name=f"mnv3_{name}", batch_size=4, max_epochs=epochs,
                alrs_epochs=alrs_epochs, alrs_startup_factor=1, config=cfg,
                num_workers=4, seed=0, num_devices=1,
                backbone=backbone)
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
    print(json.dumps({"benchmark": "diagnose_mnv3", "variant": name,
                      "task": task, "backbone": backbone,
                      "canvas": CANVAS, "lr": lr, "epochs": epochs,
                      "mAP": round(stats[0], 4),
                      "AP50": round(stats[1], 4),
                      "AP75": round(stats[2], 4),
                      "AR300": round(stats[8], 4)}), flush=True)
    return stats


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    variants = sys.argv[1:] or ["recipe"]
    print("devices:", jax.devices(), "variants:", variants, flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_mnv3diag_")
    projects = {}
    for name in variants:
        render, task = VARIANTS[name][4], VARIANTS[name][5]
        key = (task, render)
        if key not in projects:
            if task == "hard":
                # render == CANVAS: the EXACT round-4 hard task (200
                # images, seed 7).  render < CANVAS: same distribution
                # drawn at the smaller size, upscaled at load time (up2).
                projects[key] = make_hard_project(
                    f"{root}/{task}{render}", num_images=NUM_IMAGES,
                    image_size=(render, render),
                    max_boxes=24 if render == CANVAS else 12, seed=7)
            else:
                # The EASY particle task at the convergence_families
                # operating point (60 images, seed 7).
                from tests.synthetic import make_project
                projects[key] = make_project(
                    f"{root}/{task}{render}", num_images=60,
                    image_size=(render, render), max_boxes=6, seed=7)
            counts = projects[key].label_counts()
            print(f"dataset ready ({task}, render {render}):",
                  len(projects[key].image_dict), "images,",
                  sum(counts.values()), "boxes", dict(counts), flush=True)
        run_variant(name, projects[key], root)


if __name__ == "__main__":
    main()
