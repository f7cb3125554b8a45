"""Fine-tune-from-pretrained transfer evidence on TPU.

The reference's PRIMARY operating mode is fine-tuning a COCO-pretrained
checkpoint with the default 3-stage backbone freeze
(`miso/object_detection/models.py:8-12` weights="DEFAULT",
`Dockerfile:4-5` preloads fasterrcnn_resnet50_fpn_coco,
torchvision's trainable_backbone_layers=3 default).  This experiment
demonstrates that podtpu's equivalent mode — ``train(pretrained=<dir>)``
with ``trainable_backbone_stages=3`` — transfers: fine-tuning beats
from-scratch at an equal (small) epoch budget on a small task.

Protocol (COCO -> coccolith analog, fully synthetic):
  1. PRETRAIN the flagship on a large draw from the hard 5-class
     distribution (seed 123, 240 images, all 5 classes) — the "COCO".
  2. FINE-TUNE on a small DISJOINT draw (seed 7, 60 images) restricted
     to 3 of the 5 classes — different label count, so the class-sized
     heads are re-initialised exactly like the reference's
     FastRCNNPredictor replacement, while backbone/FPN/RPN transfer and
     the stem+layer1 freeze stays active (train.py keeps
     trainable_backbone_stages=3 when --pretrained is given).
  3. SCRATCH baseline: identical task, identical epoch budget, no
     pretrained weights (train.py auto-unfreezes to 5 stages).

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/convergence_finetune.py > /tmp/conv_ft.log 2>&1 &
"""
import json
import tempfile

import jax

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.models.detector import make_detector
from podtpu.data.loader import Loader
from podtpu.train.checkpoints import load_model
from podtpu.train.evaluate import evaluate
from podtpu.train.step import make_eval_step
from podtpu.train.train import train
from tests.synthetic import make_hard_project

CANVAS = 1024
FT_LABELS = ["ellipse", "ring", "cross"]
FT_EPOCHS = 8


def make_cfg():
    return Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                    compute_dtype="bfloat16"),
                  train=TrainConfig(warmup_iters=200, log_every=10,
                                    clip_grad_norm=10.0),
                  data=DataConfig(num_workers=4))


def score(out, project, batch=4):
    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels)
    cfg = make_cfg()
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, batch, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = make_detector(model_cfg)
    _, stats = evaluate(make_eval_step(model), params, frozen, loader,
                        num_classes=len(labels), verbose=True)
    return stats


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_ft_")

    # 1. Pretraining corpus: large, all 5 classes, different seed.
    pre_project = make_hard_project(root + "/pre", num_images=240,
                                    image_size=(CANVAS, CANVAS),
                                    max_boxes=24, seed=123)
    pre_out = train(pre_project, output_dir=root, name="pretrain",
                    batch_size=4, max_epochs=16, alrs_epochs=5,
                    alrs_startup_factor=1, config=make_cfg(),
                    num_workers=4, seed=0, num_devices=1)
    pre_stats = score(pre_out, pre_project)
    print(json.dumps({"phase": "pretrain", "mAP": round(pre_stats[0], 4),
                      "AP50": round(pre_stats[1], 4)}), flush=True)

    # 2. Small disjoint fine-tune task, 3 of 5 classes (head re-init).
    ft_project = make_hard_project(root + "/ft", num_images=60,
                                   image_size=(CANVAS, CANVAS),
                                   max_boxes=24, seed=7)

    results = {}
    for mode in ("finetune", "scratch"):
        kw = {"pretrained": pre_out} if mode == "finetune" else {}
        out = train(ft_project, labels=list(FT_LABELS), output_dir=root,
                    name=f"ft_{mode}", batch_size=4, max_epochs=FT_EPOCHS,
                    alrs_epochs=5, alrs_startup_factor=1,
                    config=make_cfg(), num_workers=4, seed=0,
                    num_devices=1, **kw)
        stats = score(out, ft_project)
        results[mode] = {"mAP": round(stats[0], 4),
                         "AP50": round(stats[1], 4),
                         "AP75": round(stats[2], 4),
                         "AR300": round(stats[8], 4)}
        print(json.dumps({"phase": mode, "epochs": FT_EPOCHS,
                          **results[mode]}), flush=True)

    print(json.dumps({"benchmark": "finetune_transfer", "canvas": CANVAS,
                      "ft_images": 60, "ft_epochs": FT_EPOCHS,
                      "ft_labels": FT_LABELS, **{
                          f"{m}_{k}": v for m, r in results.items()
                          for k, v in r.items()}}), flush=True)


if __name__ == "__main__":
    main()
