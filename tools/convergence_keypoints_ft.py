"""Keypoint R-CNN fine-tune-first evidence (VERDICT r4 ask #2: every zoo
family's intended pretrained-first mode demonstrated, "and keypoint").

Protocol mirrors tools/convergence_hard_ft.py, on the synthetic
5-keypoint task of tools/convergence_keypoints.py (512 canvas,
`keypoint_roi_expand=1.3` — the documented decode recipe):

  1. PRETRAIN on a 96-image draw (seed 11) for 24 epochs.
  2. FINE-TUNE on the STANDARD keypoint task (seed 5, 48 images — the
     round-4 `conv_keypoints.log` dataset) for 12 epochs from that
     checkpoint (half the from-scratch budget of the r4 row's 24).
  3. Report bbox + OKS stats for both; the fine-tune row lands in
     PARITY.md next to the from-scratch keypoint row.

The reference's analog: `keypointrcnn_resnet50_fpn` ships
COCO-pretrained in the torchvision zoo the vendored trainer dispatches
over (`/root/reference/miso/object_detection/engine/train.py:219-221`).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u \
      tools/convergence_keypoints_ft.py
"""
import json
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
from tests.synthetic import make_project

CANVAS = 512
K = 5
FT_EPOCHS = 12


def make_cfg():
    return Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                    compute_dtype="bfloat16",
                                    keypoint_roi_expand=1.3),
                  train=TrainConfig(warmup_iters=50, log_every=5),
                  data=DataConfig(num_workers=4))


def score(out, project, cfg):
    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels, with_keypoints=True,
                               num_keypoints=K)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, 4, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = make_detector(model_cfg)
    ev, stats = evaluate(make_eval_step(model), params, frozen, loader,
                         num_classes=len(labels), verbose=True)
    kp = getattr(ev, "keypoints_stats", None)
    return stats, kp


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_kpft_")
    cfg = make_cfg()

    pre_project = make_project(root + "/pre", num_images=96,
                               image_size=(CANVAS, CANVAS), max_boxes=6,
                               seed=11, keypoints=True)
    pre_out = train(pre_project, labels=["particle"], output_dir=root,
                    name="kp_pre", batch_size=4, max_epochs=24,
                    alrs_epochs=4, alrs_startup_factor=1, config=cfg,
                    num_workers=4, seed=0, num_devices=1,
                    with_keypoints=True, num_keypoints=K)
    pre_stats, pre_kp = score(pre_out, pre_project, cfg)
    print(json.dumps({"benchmark": "keypoint_ft", "phase": "pretrain",
                      "epochs": 24,
                      "bbox_mAP": round(pre_stats[0], 4),
                      "oks_mAP": round(pre_kp[0], 4) if pre_kp is not None
                      else None}), flush=True)

    # The standard round-4 keypoint task (seed 5, 48 images).
    ft_project = make_project(root + "/ft", num_images=48,
                              image_size=(CANVAS, CANVAS), max_boxes=6,
                              seed=5, keypoints=True)
    ft_out = train(ft_project, labels=["particle"], output_dir=root,
                   name="kp_ft", batch_size=4, max_epochs=FT_EPOCHS,
                   alrs_epochs=4, alrs_startup_factor=1, config=cfg,
                   num_workers=4, seed=0, num_devices=1,
                   with_keypoints=True, num_keypoints=K,
                   pretrained=pre_out)
    ft_stats, ft_kp = score(ft_out, ft_project, cfg)
    print(json.dumps({"benchmark": "keypoint_ft", "phase": "finetune",
                      "epochs": FT_EPOCHS, "canvas": CANVAS,
                      "bbox_mAP": round(ft_stats[0], 4),
                      "bbox_AP50": round(ft_stats[1], 4),
                      "oks_mAP": round(ft_kp[0], 4) if ft_kp is not None
                      else None,
                      "oks_AP50": round(ft_kp[1], 4) if ft_kp is not None
                      else None}), flush=True)


if __name__ == "__main__":
    main()
