"""Convergence evidence for the remaining detector families on TPU.

Trains each family from scratch on the synthetic particle task through
the product ``train()`` path and scores the held-out split — the same rig
as tools/convergence_1024.py / convergence_retinanet.py / convergence_fcos
.py, covering the families those scripts don't: the SSD zoo pair (their
own 300/320 canvases) and the two mobilenet Faster R-CNN variants.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/convergence_families.py > /tmp/conv_fams.log 2>&1 &
Select a subset:  ... convergence_families.py ssd ssdlite
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
from tests.synthetic import make_project

# name -> (train() kwargs, canvas for the synthetic images, max epochs)
# A 4th tuple element, when present, is the RENDER size of the synthetic
# images (canvas != render exercises the load-time resize).
RUNS = {
    # SSD families carry their own canvas; images are rendered at it so
    # the fit-resize is identity.
    "ssd": (dict(family="ssd"), 300, 40),
    # SSDLite from scratch needs an aggressive lr (torchvision's recipe:
    # 0.15 at batch 24, cosine, 660 COCO epochs); 0.005 barely moves in 40.
    "ssdlite": (dict(family="ssdlite", lr=0.05), 320, 120),
    # batch 4: the 1280-channel single-map RoI path OOMs 16G HBM at batch 8.
    "mobilenet_v2": (dict(backbone="mobilenet_v2", batch_size=4, lr=0.01),
                     512, 48),
    # The single stride-32 map cannot localise the 24-56 px particles
    # (<2 feature cells/object).  torchvision's snippet model would
    # UPSCALE such inputs (GeneralizedRCNNTransform min_size=800, a
    # 1.56x blow-up of a 512 micrograph); the fixed-canvas equivalent is
    # rendering at 512 and training at a 1024 canvas (2x upscale ->
    # 1.5-3.5 cells/object).  tools/probe_mobilenet_v2.py quantifies it.
    "mobilenet_v2_up2": (dict(backbone="mobilenet_v2", batch_size=4,
                              lr=0.01), 1024, 48, 512),
    "mobilenet_v3_fpn": (dict(backbone="mobilenet_v3_fpn", batch_size=4,
                              lr=0.01), 512, 48),
}


def run_one(name, kwargs, canvas, epochs, render=None):
    root = tempfile.mkdtemp(prefix=f"podtpu_conv_{name}_")
    render = render or canvas
    project = make_project(root, num_images=60,
                           image_size=(render, render), max_boxes=6, seed=7)
    kwargs = dict(kwargs)
    batch = kwargs.pop("batch_size", 8)
    lr = kwargs.pop("lr", 0.005)
    cfg = Config(model=ModelConfig(image_size=(canvas, canvas),
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(warmup_iters=100, log_every=10,
                                   clip_grad_norm=10.0, lr=lr),
                 data=DataConfig(num_workers=4))
    out = train(project, labels=["particle"], output_dir=root,
                name=f"conv_{name}", batch_size=batch, max_epochs=epochs,
                alrs_epochs=4, alrs_startup_factor=1, config=cfg,
                num_workers=4, seed=0, num_devices=1, **kwargs)
    params, frozen, model_cfg, labels = load_model(out)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels)
    _, test_idx = train_test_split(len(dataset), cfg.train.split_fraction,
                                   cfg.train.split_seed)
    loader = Loader(dataset, 4, indices=test_idx, shuffle=False,
                    num_workers=4)
    model = make_detector(model_cfg)
    _, stats = evaluate(make_eval_step(model), params, frozen, loader,
                        num_classes=len(labels), verbose=True)
    print(json.dumps({"family": name, "canvas": canvas, "epochs": epochs,
                      "mAP": round(stats[0], 4),
                      "AP50": round(stats[1], 4),
                      "AP75": round(stats[2], 4)}), flush=True)


def main():
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    names = sys.argv[1:] or list(RUNS)
    for name in names:
        kwargs, canvas, epochs, *render = RUNS[name]
        print(f"===== {name} =====", flush=True)
        try:
            run_one(name, kwargs, canvas, epochs,
                    render=render[0] if render else None)
        except SystemExit as e:  # NaN guard exits; keep the other runs
            print(f"{name}: training exited ({e})", flush=True)


if __name__ == "__main__":
    main()
