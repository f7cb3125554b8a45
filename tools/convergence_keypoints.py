"""Keypoint R-CNN convergence evidence on TPU: train with_keypoints on
synthetic 5-keypoint annotations (ellipse centre + axis extremes) at a 512
canvas and report held-out bbox AND keypoint-OKS COCO stats (the OKS
evaluator is podtpu's own — the reference never had a keypoint path;
the torchvision zoo member is ``keypointrcnn_resnet50_fpn``).

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/convergence_keypoints.py > /tmp/conv_kp.log 2>&1 &
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


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="podtpu_convkp_")
    project = make_project(root, num_images=48,
                           image_size=(CANVAS, CANVAS), max_boxes=6, seed=5,
                           keypoints=True)
    # keypoint_roi_expand=1.3: the synthetic task's keypoints sit ON the
    # box border, so the torchvision-parity heatmap domain (== the box)
    # clamps their argmax to border cells whenever the predicted box is a
    # few px tight — flooring strict OKS at ~0.40 regardless of heatmap
    # quality (oracle study in tests/test_keypoints.py).
    cfg = Config(model=ModelConfig(image_size=(CANVAS, CANVAS),
                                   compute_dtype="bfloat16",
                                   keypoint_roi_expand=1.3),
                 train=TrainConfig(warmup_iters=50, log_every=5),
                 data=DataConfig(num_workers=4))
    out = train(project, labels=["particle"], output_dir=root,
                name="convkp", batch_size=4, max_epochs=24, alrs_epochs=4,
                alrs_startup_factor=1, config=cfg, num_workers=4, seed=0,
                num_devices=1, with_keypoints=True, num_keypoints=K)
    print("trained:", out, flush=True)

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
    print(json.dumps({
        "canvas": CANVAS, "num_keypoints": K,
        "bbox_mAP": round(stats[0], 4), "bbox_AP50": round(stats[1], 4),
        "oks_mAP": round(kp[0], 4) if kp is not None else None,
        "oks_AP50": round(kp[1], 4) if kp is not None else None,
    }), flush=True)


if __name__ == "__main__":
    main()
