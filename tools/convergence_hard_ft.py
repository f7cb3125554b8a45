"""Fine-tune-first hard-task evidence for the one-stage / mobile families.

The reference operates pretrained-first for EVERY zoo family
(`/root/reference/miso/object_detection/models.py:8-9` weights="DEFAULT";
`Dockerfile:4-5` preloads the COCO checkpoint; the vendored trainer's
model dispatch `engine/train.py:219-221` covers the whole torchvision
detection zoo, all of whose members ship pretrained).  podtpu's
round-4 transfer experiment (`tools/convergence_finetune.py`)
demonstrated the mode for the flagship only; this tool extends it to
the remaining families so the hard-task zoo table carries a measured
number for every row.

Protocol per family (no network in this environment, so "COCO" is a
large disjoint draw from the same distribution — the round-4 protocol):

  1. PRETRAIN on a 240-image draw of the hard 5-class distribution
     (seed 123) at the family's documented from-scratch recipe
     (PARITY.md / tools/convergence_families.py budgets).
  2. FINE-TUNE on the STANDARD hard task (seed 7, 200 images — the
     exact dataset of `tools/convergence_hard.py` round-4 rows) from
     that checkpoint via ``train(pretrained=<dir>)`` at the flagship
     hard-row budget (24 epochs), so rows are comparable.
  3. Report held-out COCO stats for both phases; the fine-tune row is
     the PARITY.md hard-table entry.

`retinanet_scratch48` additionally runs retinanet FROM SCRATCH for 48
epochs on the standard task — the budget the round-4 0.133@24ep row was
flagged as missing (VERDICT r4 weak #4).

SSD families run at their native canvases (300/320 — `ssd_config` /
`ssdlite_config` force them); the hard task is rendered at that canvas
with a reduced box budget so the 18-170 px objects still fit.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u \
      tools/convergence_hard_ft.py retinanet retinanet_v2 ssd ssdlite
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

# family -> (train kwargs, canvas, render, max_boxes,
#            pretrain_epochs, ft_epochs, lr)
RECIPES = {
    "retinanet": (dict(family="retinanet"), 1024, 1024, 24, 48, 24, 0.005),
    "retinanet_v2": (dict(family="retinanet_v2"), 1024, 1024, 24,
                     48, 24, 0.005),
    "ssd": (dict(family="ssd"), 300, 300, 10, 64, 24, 0.005),
    # SSDLite's from-scratch recipe needs the aggressive lr
    # (torchvision: 0.15 @ batch 24 cosine; see convergence_families).
    "ssdlite": (dict(family="ssdlite"), 320, 320, 10, 120, 40, 0.05),
    # The family recipe lr (0.01) ON THE UP2 RENDERING (render 512 ->
    # 1024 canvas): the round-5 diagnosis (tools/diagnose_mnv3.py,
    # tools/probe_mnv3.py) measured the native-render hard task leaving
    # 53% of gts sub-cell at the family's stride-32 pyramid with RPN
    # objectness separation 0.000 — the same resolution bound the
    # documented mobilenet_v2 up2 recipe fixes.
    "mobilenet_v3_fpn": (dict(backbone="mobilenet_v3_fpn"), 1024, 512, 12,
                         48, 24, 0.01),
}

PRETRAIN_IMAGES = 240
PRETRAIN_SEED = 123
FT_IMAGES = 200
FT_SEED = 7


def make_cfg(canvas, lr):
    return Config(model=ModelConfig(image_size=(canvas, canvas),
                                    compute_dtype="bfloat16"),
                  train=TrainConfig(warmup_iters=200, log_every=10,
                                    clip_grad_norm=10.0, lr=lr),
                  data=DataConfig(num_workers=4))


def score(out, project, cfg, batch=4):
    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, batch, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = make_detector(model_cfg)
    evaluator, stats = evaluate(make_eval_step(model), params, frozen,
                                loader, num_classes=len(labels),
                                verbose=True)
    print(evaluator.per_class_text(labels), flush=True)
    return stats


def get_projects(root, render, max_boxes, cache={}):
    key = (render, max_boxes)
    if key not in cache:
        pre = make_hard_project(f"{root}/pre_{render}",
                                num_images=PRETRAIN_IMAGES,
                                image_size=(render, render),
                                max_boxes=max_boxes, seed=PRETRAIN_SEED)
        ft = make_hard_project(f"{root}/ft_{render}", num_images=FT_IMAGES,
                               image_size=(render, render),
                               max_boxes=max_boxes, seed=FT_SEED)
        cache[key] = (pre, ft)
        for tag, p in (("pretrain", pre), ("ft", ft)):
            counts = p.label_counts()
            print(f"{tag} dataset ({render}px render): "
                  f"{len(p.image_dict)} images,",
                  sum(counts.values()), "boxes", dict(counts), flush=True)
    return cache[key]


def emit(row):
    print(json.dumps({"benchmark": "hard_ft", **row}), flush=True)


def run_family(family, root):
    kwargs, canvas, render, max_boxes, pre_epochs, ft_epochs, lr = \
        RECIPES[family]
    pre_project, ft_project = get_projects(root, render, max_boxes)
    cfg = make_cfg(canvas, lr)

    print(f"\n##### {family}: pretrain {pre_epochs} ep @ lr {lr}, "
          f"canvas {canvas}", flush=True)
    pre_out = train(pre_project, labels=list(HARD_CLASSES), output_dir=root,
                    name=f"pre_{family}", batch_size=4,
                    max_epochs=pre_epochs, alrs_epochs=8,
                    alrs_startup_factor=1, config=cfg, num_workers=4,
                    seed=0, num_devices=1, **kwargs)
    pre_stats = score(pre_out, pre_project, cfg)
    emit({"family": family, "phase": "pretrain", "canvas": canvas,
          "render": render, "epochs": pre_epochs, "lr": lr,
          "mAP": round(pre_stats[0], 4), "AP50": round(pre_stats[1], 4),
          "AR300": round(pre_stats[8], 4)})

    print(f"\n##### {family}: fine-tune {ft_epochs} ep on the standard "
          f"hard task (seed {FT_SEED})", flush=True)
    ft_out = train(ft_project, labels=list(HARD_CLASSES), output_dir=root,
                   name=f"ft_{family}", batch_size=4, max_epochs=ft_epochs,
                   alrs_epochs=5, alrs_startup_factor=1, config=cfg,
                   num_workers=4, seed=0, num_devices=1,
                   pretrained=pre_out, **kwargs)
    ft_stats = score(ft_out, ft_project, cfg)
    emit({"family": family, "phase": "finetune", "canvas": canvas,
          "render": render, "epochs": ft_epochs, "lr": lr,
          "mAP": round(ft_stats[0], 4), "AP50": round(ft_stats[1], 4),
          "AP75": round(ft_stats[2], 4), "AR300": round(ft_stats[8], 4)})


def run_retinanet_scratch48(root):
    kwargs, canvas, render, max_boxes, _, _, lr = RECIPES["retinanet"]
    _, ft_project = get_projects(root, render, max_boxes)
    cfg = make_cfg(canvas, lr)
    print("\n##### retinanet: FROM SCRATCH, 48 epochs on the standard "
          "hard task", flush=True)
    out = train(ft_project, labels=list(HARD_CLASSES), output_dir=root,
                name="scratch48_retinanet", batch_size=4, max_epochs=48,
                alrs_epochs=8, alrs_startup_factor=1, config=cfg,
                num_workers=4, seed=0, num_devices=1, **kwargs)
    stats = score(out, ft_project, cfg)
    emit({"family": "retinanet", "phase": "scratch48", "canvas": canvas,
          "epochs": 48, "lr": lr, "mAP": round(stats[0], 4),
          "AP50": round(stats[1], 4), "AP75": round(stats[2], 4),
          "AR300": round(stats[8], 4)})


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    jobs = sys.argv[1:] or ["retinanet", "retinanet_scratch48",
                            "retinanet_v2", "ssd", "ssdlite"]
    print("devices:", jax.devices(), "jobs:", jobs, flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_hardft_")
    for job in jobs:
        if job == "retinanet_scratch48":
            run_retinanet_scratch48(root)
        else:
            run_family(job, root)


if __name__ == "__main__":
    main()
