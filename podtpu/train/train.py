"""Training driver: project in, trained model directory out.

Counterpart of the reference's ``train()``
(`miso/object_detection/training.py:16-160`) with the same contract:

* deep-copy the project, filter to the requested labels, drop unlabelled
  images (:27-32);
* 80/20 random split with a fixed seed (:53-57);
* SGD(lr .005, momentum .9, wd 5e-4) or Adam(1e-3) (:96-106);
* epoch loop of train -> evaluate -> ALRS step, stopping after 4 LR drops
  (:120-127);
* artifacts: model + ``labels.txt`` + ``results.txt`` in
  ``output_dir/<name or timestamp>`` (:135-160).

TPU-first: one jitted step (augment+forward+loss+grad+update), device-side
augmentation, static-shape batches, LR injected from host (warmup + ALRS),
COCO gt indexed once (not per epoch).  Additions over the reference:
per-epoch resume checkpoints and a ``sum-loss`` NaN guard enforced at metric
fetch (the reference sys.exit(1)s per step, engine.py:42-45).
"""
from __future__ import annotations

import copy
import dataclasses
import os
import sys
from typing import List, Optional

import jax
import numpy as np

from podtpu.core.config import Config
from podtpu.core.logging import MetricLogger, is_main_process
from podtpu.core.retry import with_transient_retry
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.data.loader import Loader
from podtpu.data.project import Project
from podtpu.models.detector import init_variables, make_detector
from podtpu.shared.utils import now_as_str
from podtpu.train import checkpoints as ckpt
from podtpu.train.schedules import make_scheduler
from podtpu.train.coco_metrics import STAT_NAMES
from podtpu.train.evaluate import evaluate
from podtpu.train.optim import make_optimizer
from podtpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    warmup_factor,
)


class ZeroMapMonitor:
    """Total-failure detection: consecutive epochs of eval mAP 0.000.

    The reference cannot notice a run that learns nothing — its ALRS sees
    only the LOSS (`miso/shared/learning_rate_scheduler.py:98`), so a
    model whose loss plateaus at garbage walks through the LR drops and
    terminates "as if converged" (the round-4 mobilenet_v3 hard run
    burned 24 epochs exactly that way, 0.000 on every stat).  podtpu
    evaluates COCO stats every epoch anyway, so noticing is free: after
    ``warn_epochs`` consecutive zero-mAP evals a loud diagnostic prints
    each epoch, and with ``abort=True`` (``TrainConfig.abort_on_zero_map``)
    the run stops instead of spending the rest of its budget.
    """

    def __init__(self, warn_epochs: int = 5, abort: bool = False):
        self.warn_epochs = max(1, int(warn_epochs))
        self.abort = abort
        self.zero_epochs = 0

    def update(self, epoch: int, map_value: float,
               ar_value: float = float("nan")) -> bool:
        """Record one epoch's eval mAP (and AR, for the diagnostic).
        Returns True when the run should abort."""
        if map_value > 0.0:
            self.zero_epochs = 0
            return False
        self.zero_epochs += 1
        if self.zero_epochs < self.warn_epochs:
            return False
        print("!" * 78)
        print(f"WARNING: eval mAP has been 0.000 for {self.zero_epochs} "
              f"consecutive epochs (epoch {epoch}, AR={ar_value:.3f}) — "
              "the model is detecting NOTHING while the loss-driven ALRS "
              "schedule proceeds as if converging.")
        print("Likely causes: a from-scratch recipe mismatch (this "
              "family may need a higher lr / longer budget — see the "
              "PARITY.md family table), missing pretrained weights, or "
              "anchors that cannot cover the object scale "
              "(tools/probe_mobilenet_v2.py quantifies coverage).")
        if self.abort:
            print("Aborting (TrainConfig.abort_on_zero_map=True).")
            print("!" * 78)
            return True
        print("Set TrainConfig.abort_on_zero_map=True to stop such runs "
              "automatically; raise zero_map_warn_epochs if this recipe "
              "is expected to start slowly.")
        print("!" * 78)
        return False


def _dispatch_groups(loader, k: int):
    """Group a loader's ``(batch, bvalid)`` stream into FULL groups of
    ``k`` (one multi-step dispatch each) plus single-item tail groups
    (a padded step would not be a no-op: weight decay and momentum decay
    apply even at zero loss weight)."""
    buf = []
    for item in loader:
        buf.append(item)
        if len(buf) == k:
            yield buf
            buf = []
    for item in buf:
        yield [item]


def train(project: Project,
          labels: Optional[List[str]] = None,
          output_dir: Optional[str] = None,
          name: Optional[str] = None,
          batch_size: int = 2,
          alrs_epochs: int = 10,
          alrs_drops: int = 4,
          alrs_startup_factor: int = 2,
          optimiser: str = "sgd",
          max_epochs: int = 500,
          config: Optional[Config] = None,
          pretrained: Optional[str] = None,
          resume: bool = False,
          seed: int = 0,
          num_workers: int = 4,
          with_mask: bool = False,
          with_keypoints: bool = False,
          num_keypoints: int = 17,
          num_devices: Optional[int] = None,
          backbone: Optional[str] = None,
          family: Optional[str] = None,
          test_project: Optional[Project] = None) -> str:
    """Train a detector on ``project``; returns the model directory path.

    ``batch_size`` is PER DEVICE (the reference's per-GPU semantics,
    `engine/train.py:69-71`); the global batch is ``batch_size * num_devices``.
    ``num_devices=None`` uses every local accelerator device (single device
    on the CPU backend); the multi-device path is the shard_map DP step
    (``podtpu.parallel.dp``), the reference's DDP recipe
    (`engine/train.py:165-296`) expressed as one pjit-compiled program.

    ``test_project``: an optional HELD-OUT evaluation set (e.g. separate
    CVAT tasks, ``--test-tasks`` on the CLI).  When given, ALL of
    ``project`` trains and evaluation runs on ``test_project`` — the
    fix for the reference's same-tasks random split (its own TODO,
    `miso/cli.py:118`; SURVEY.md §7 quirks).  Default keeps the
    reference's seeded 80/20 split for parity.
    """
    # -- project fixup (reference training.py:27-32) -------------------------
    project = copy.deepcopy(project)
    if labels is not None:
        project.keep_annotations_with_label(labels)
    project.remove_unlabelled_images()
    project.update_label_dict()
    labels = project.label_names
    if not project.image_dict or not labels:
        raise ValueError(
            "Project has no annotated images (check --image-root / task "
            "ids / label filters)")

    cfg = config or Config()
    model_cfg = cfg.model
    if family == "faster_rcnn_v2":
        # torchvision fasterrcnn/maskrcnn_resnet50_fpn_v2 heads; the
        # stored family stays 'faster_rcnn' (v2-ness lives in config
        # fields, so resume/inference rebuild exactly).
        from podtpu.core.config import fasterrcnn_v2_config
        model_cfg = fasterrcnn_v2_config(model_cfg)
        family = "faster_rcnn"
    if family == "retinanet_v2":
        # GroupNorm subnets + GIoU regression (retinanet_resnet50_fpn_v2);
        # the stored family stays 'retinanet'.
        from podtpu.core.config import retinanet_v2_config
        model_cfg = retinanet_v2_config(model_cfg)
        family = "retinanet"
    elif family == "retinanet" and model_cfg.family != "retinanet":
        # One-stage focal-loss family (the torchvision-zoo model the
        # reference's vendored trainer exposes, `engine/train.py:219-221`).
        from podtpu.core.config import retinanet_config
        model_cfg = retinanet_config(model_cfg)
    if family == "fcos" and model_cfg.family != "fcos":
        # Anchor-free one-stage family (torchvision `fcos_resnet50_fpn`,
        # same zoo dispatch).
        from podtpu.core.config import fcos_config
        model_cfg = fcos_config(model_cfg)
    if family in ("ssd", "ssdlite") and model_cfg.family != family:
        # The SSD zoo families (`ssd300_vgg16` /
        # `ssdlite320_mobilenet_v3_large`, `engine/train.py:219-221`) —
        # note these carry their own native canvas (300 / 320).
        from podtpu.core.config import ssd_config, ssdlite_config
        model_cfg = (ssd_config if family == "ssd"
                     else ssdlite_config)(model_cfg)
    if model_cfg.family in ("ssd", "ssdlite"):
        if backbone is not None and backbone != model_cfg.backbone:
            raise ValueError(
                f"family={model_cfg.family!r} is tied to its backbone "
                f"({model_cfg.backbone}); --backbone is not applicable")
        if with_mask or cfg.model.with_mask:
            raise ValueError(
                "with_mask requires family='faster_rcnn' (SSD has no RoI "
                "stage)")
    if model_cfg.family in ("retinanet", "fcos"):
        if (backbone not in (None, "resnet50_fpn")
                or model_cfg.backbone != "resnet50_fpn"):
            raise ValueError(
                f"family={model_cfg.family!r} requires the ResNet-50-FPN "
                "backbone (its P3-P7 pyramid head doesn't fit other "
                "backbone layouts)")
        if with_mask or cfg.model.with_mask:
            raise ValueError(
                "with_mask requires family='faster_rcnn' (the Mask R-CNN "
                f"head pools RoIs; {model_cfg.family} has no RoI stage)")
    if (with_keypoints or cfg.model.with_keypoints) \
            and model_cfg.family not in ("faster_rcnn",):
        raise ValueError(
            "with_keypoints requires family='faster_rcnn' (the keypoint "
            "head pools RoIs — torchvision keypointrcnn_resnet50_fpn)")
    if (with_mask or cfg.model.with_mask) \
            and (with_keypoints or cfg.model.with_keypoints):
        raise ValueError(
            "with_mask and with_keypoints are mutually exclusive (the "
            "torchvision zoo has no combined model)")
    if backbone == "mobilenet_v2" and model_cfg.backbone != "mobilenet_v2":
        # The reference's second detector family (MobileNetV2 single-map
        # Faster R-CNN, `miso/instance_segmentation/training.py:7-36`).
        from podtpu.core.config import mobilenet_config
        model_cfg = mobilenet_config(model_cfg)
    elif backbone in ("mobilenet_v3_fpn", "mobilenet_v3_320_fpn") \
            and model_cfg.backbone != "mobilenet_v3_fpn":
        # torchvision fasterrcnn_mobilenet_v3_large_fpn / ..._320_fpn.
        from podtpu.core.config import mobilenet_v3_fpn_config
        model_cfg = mobilenet_v3_fpn_config(
            model_cfg, low_res=(backbone == "mobilenet_v3_320_fpn"))
    elif backbone is not None:
        model_cfg = dataclasses.replace(model_cfg, backbone=backbone)
    if (model_cfg.rpn_conv_depth != 1 or model_cfg.box_head_type != "mlp"
            or model_cfg.fpn_norm) and model_cfg.backbone != "resnet50_fpn":
        raise ValueError(
            "family='faster_rcnn_v2' requires the ResNet-50-FPN backbone "
            "(torchvision has no v2 recipe for the mobilenet extractors)")

    print()
    print("=" * 80)
    if output_dir is None:
        output_dir = os.getcwd()
    if name is None:
        name = now_as_str()
    output_dir = os.path.join(output_dir, name)

    # A resumed run must rebuild the EXACT architecture/optimizer the
    # checkpoint was trained with — re-deriving it from this call's
    # arguments can silently diverge (e.g. run 1 passed --pretrained and
    # kept the 3-stage freeze; resuming without it would unfreeze the
    # backbone and the optax.masked opt_state would no longer match).
    restored = ckpt.load_train_checkpoint(output_dir) if resume else None
    resumed_model_cfg = False
    if restored is not None and "model_cfg" in restored:
        from podtpu.train.checkpoints import model_config_from_dict
        model_cfg = model_config_from_dict(restored["model_cfg"])
        resumed_model_cfg = True
        print("Resuming: model config restored from the checkpoint")
    elif (pretrained is None and restored is None
            and model_cfg.trainable_backbone_stages == 3):
        # torchvision `_validate_trainable_layers` semantics: the 3-stage
        # freeze exists to protect PRETRAINED early features; without
        # pretrained weights it would freeze the stem+layer1 at their
        # RANDOM init, which stalls training (one-stage detectors never
        # recover from it).  Train the whole backbone instead.  (Legacy
        # checkpoints without a stored config resume with the old
        # frozen-3 semantics they were trained under.)
        model_cfg = dataclasses.replace(model_cfg,
                                        trainable_backbone_stages=5)
        print("No pretrained weights: training all backbone stages "
              "(freezing random features would stall learning)")
    if (pretrained is None and restored is None
            and model_cfg.backbone in ("mobilenet_v2", "mobilenet_v3_fpn",
                                       "mobilenet_v3")
            and model_cfg.backbone_norm == "frozen"):
        # torchvision's from-scratch norm rule (``norm_layer =
        # FrozenBatchNorm2d if is_trained else nn.BatchNorm2d``): frozen
        # identity-init BN leaves the deep mobile trunks normalisation-
        # free, and one-shot calibration is measurably insufficient (the
        # round-5 mobilenet_v3 diagnosis: RPN objectness separation
        # 0.000 on the 1024-canvas hard task).  ResNet trains well from
        # scratch frozen and is left alone.
        model_cfg = dataclasses.replace(model_cfg, backbone_norm="batch")
        print("No pretrained weights: mobile trunk uses trainable "
              "BatchNorm (torchvision's from-scratch norm rule)")
    if pretrained and os.path.isdir(pretrained) and not resumed_model_cfg:
        # Fine-tuning from a podtpu model dir: adopt its backbone_norm —
        # a batch-norm-trained trunk's BN affine lives in `params` and
        # would silently reset to identity under the frozen-mode layout.
        import json as _json
        pcfg_path = os.path.join(pretrained, "config.json")
        if os.path.exists(pcfg_path):
            with open(pcfg_path) as fp:
                stored_norm = _json.load(fp).get("model", {}).get(
                    "backbone_norm", "frozen")
            if stored_norm != model_cfg.backbone_norm:
                model_cfg = dataclasses.replace(model_cfg,
                                                backbone_norm=stored_norm)
                print(f"Pretrained model uses backbone_norm="
                      f"{stored_norm}; matching it")
    if resumed_model_cfg:
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, batch_size=batch_size, optimiser=optimiser,
                alrs_epochs=alrs_epochs, alrs_drops=alrs_drops,
                alrs_startup_factor=alrs_startup_factor,
                max_epochs=max_epochs),
            model=model_cfg)
    else:
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, batch_size=batch_size, optimiser=optimiser,
                alrs_epochs=alrs_epochs, alrs_drops=alrs_drops,
                alrs_startup_factor=alrs_startup_factor,
                max_epochs=max_epochs),
            model=dataclasses.replace(
                model_cfg, num_classes=len(labels) + 1,
                with_mask=with_mask or cfg.model.with_mask,
                with_keypoints=with_keypoints or cfg.model.with_keypoints,
                num_keypoints=(num_keypoints if with_keypoints
                               else cfg.model.num_keypoints)),
        )
    if cfg.model.with_keypoints and cfg.model.num_keypoints == 17 \
            and not cfg.model.keypoint_hflip_inds and not resumed_model_cfg:
        # COCO person-17 default: horizontal flips must swap left/right
        # joints or the model trains on chirally inconsistent targets.
        from podtpu.core.config import COCO_17_HFLIP_INDS
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, keypoint_hflip_inds=COCO_17_HFLIP_INDS))
    print("Object detector training (podtpu)")
    print(f"- output directory: {output_dir}")
    project.summary()

    # -- data ---------------------------------------------------------------
    def make_ds(p):
        return DetectionDataset(p, image_size=cfg.model.image_size,
                                max_gt=cfg.model.max_gt_boxes,
                                label_names=labels,
                                with_masks=cfg.model.with_mask,
                                mask_stride=cfg.model.mask_gt_stride,
                                with_keypoints=cfg.model.with_keypoints,
                                num_keypoints=cfg.model.num_keypoints,
                                cache=cfg.data.decode_cache)

    dataset = make_ds(project)
    if test_project is not None:
        # Held-out task evaluation: train on everything, evaluate on the
        # separate project (same label universe).
        tp = copy.deepcopy(test_project)
        tp.keep_annotations_with_label(labels)
        tp.remove_unlabelled_images()
        test_dataset = make_ds(tp)
        if len(test_dataset) == 0:
            raise ValueError("test_project has no annotated images with the "
                             "requested labels")
        train_idx = np.arange(len(dataset))
        test_idx = np.arange(len(test_dataset))
    else:
        test_dataset = dataset
        train_idx, test_idx = train_test_split(
            len(dataset), cfg.train.split_fraction, cfg.train.split_seed)
    print("Training set images")
    print(f"- total: {len(dataset)}")
    print(f"- train: {len(train_idx)}")
    print(f"- test:  {len(test_idx)}"
          + (" (held-out tasks)" if test_project is not None else ""))

    # -- device mesh ----------------------------------------------------------
    if num_devices is None:
        num_devices = len(jax.devices()) if jax.default_backend() != "cpu" \
            else 1
    num_devices = max(1, min(num_devices, len(jax.devices())))
    use_dp = num_devices > 1
    global_batch = batch_size * num_devices
    if use_dp:
        from jax.sharding import NamedSharding, PartitionSpec
        from podtpu.parallel.dp import make_mesh
        mesh = make_mesh(jax.devices()[:num_devices])
        train_place = NamedSharding(mesh, PartitionSpec("data"))
        print(f"Data parallel over {num_devices} devices "
              f"(global batch {global_batch})")
    else:
        mesh = None
        train_place = jax.devices()[0]

    # Device-resident training data: for miso-scale datasets on a single
    # device, pin every canvas in HBM once and gather batches on device —
    # no per-step host->device image upload (podtpu/data/device_cache.py).
    # Falls back to the streaming Loader under DP or past the HBM budget.
    from podtpu.data import device_cache as dcache

    use_device_cache = (
        cfg.data.device_data_cache is not False
        # Multi-host: the mesh spans non-addressable devices, so a host
        # cannot device_put its numpy arrays replicated across it — the
        # streaming loader (per-host shards) is the multi-host path.
        and jax.process_count() == 1
        and (cfg.data.device_data_cache is True or dcache.fits(dataset)))
    device_arrays = None
    if use_device_cache:
        if use_dp:
            # SHARD the pinned dataset by sample over the mesh (1/N per
            # device — scales to real datasets on a pod, unlike a
            # replicated cache's N× HBM); the loader homes each batch
            # slice on its shard so the in-step gather stays local.
            place = NamedSharding(mesh, PartitionSpec("data"))
            cache = dcache.DeviceDataCache(dataset, device=place,
                                           pad_to_multiple=num_devices)
            loader_train = dcache.ShardedDeviceLoader(
                cache, global_batch, num_shards=num_devices,
                indices=train_idx, shuffle=True, seed=seed)
        else:
            cache = dcache.DeviceDataCache(dataset,
                                           device=jax.devices()[0])
            loader_train = dcache.DeviceLoader(
                cache, global_batch, indices=train_idx, shuffle=True,
                seed=seed, raw=True)
        device_arrays = cache.arrays
        total_mib = dcache.dataset_device_bytes(
            len(dataset), cfg.model.image_size, cfg.model.max_gt_boxes,
            cfg.model.with_mask, cfg.model.mask_gt_stride) >> 20
        per_dev = f", ~{total_mib // num_devices} MiB/device" if use_dp else ""
        print(f"Training data pinned on device ({total_mib} MiB{per_dev})")
    # Datasets past the HBM budget stream through the WINDOWED cache:
    # double-buffered window uploads overlap compute, and batches are
    # still gathered on device (the >HBM streaming fix; VERDICT r2 #5).
    # Under DP / multi-host each window is sample-SHARDED over the mesh
    # (1/N per device, per-host decode) — same per-device budget, N× the
    # window (VERDICT r3 #3: big datasets on a pod must not fall back to
    # the per-step host-upload path).
    use_window_stream = (
        not use_device_cache
        and cfg.data.device_data_cache is not False)
    if use_window_stream:
        if use_dp:
            loader_train = dcache.ShardedWindowedStreamLoader(
                dataset, global_batch, num_shards=num_devices,
                sharding=NamedSharding(mesh, PartitionSpec("data")),
                indices=train_idx, shuffle=True, seed=seed)
            print(f"Streaming via sharded windowed device cache "
                  f"({loader_train.window} samples/window, "
                  f"{loader_train.block}/device, double-buffered)")
        else:
            loader_train = dcache.WindowedStreamLoader(
                dataset, global_batch, indices=train_idx, shuffle=True,
                seed=seed, device=jax.devices()[0])
            print(f"Streaming via windowed device cache "
                  f"({loader_train.window} samples/window, double-buffered)")
    elif not use_device_cache:
        # With device_prefetch, train batches are placed on device (or
        # sharded over the mesh) by the loader's producer thread,
        # overlapping host->device transfer with the previous step's
        # compute; the eval loader stays host-side (evaluation indexes
        # batch fields on the host).
        loader_train = Loader(
            dataset, global_batch, indices=train_idx, shuffle=True,
            seed=seed, num_workers=num_workers,
            place=train_place if cfg.data.device_prefetch else None)
    # Multi-host: each process evaluates a DISJOINT slice of the test set;
    # evaluate() merges match results across processes (duplicating the
    # full set on every process would double-count every image in the
    # merged COCO stats).
    if jax.process_count() > 1:
        test_idx = test_idx[jax.process_index()::jax.process_count()]
    loader_test = Loader(test_dataset, global_batch, indices=test_idx,
                         shuffle=False, num_workers=num_workers)

    # -- model + optimizer ---------------------------------------------------
    num_classes = len(labels) + 1
    print(f"Number of classes: {num_classes}")
    print(f"Optimiser: {cfg.train.optimiser}")
    model = make_detector(cfg.model)
    init_rng, loop_rng = jax.random.split(jax.random.key(seed))
    variables = init_variables(model, init_rng)
    if pretrained:
        from podtpu.models.weights import load_pretrained
        variables = load_pretrained(variables, pretrained)
    elif restored is None and cfg.train.calibrate_bn is not False \
            and cfg.model.backbone_norm != "batch" \
            and variables.get("frozen"):
        # (Trainable-BN trunks need no one-shot calibration: the batch
        # statistics normalise continuously from step 0.)
        # From scratch: set FrozenBN statistics from one real batch
        # (LSUV-style; see podtpu/train/calibrate.py — identity-init
        # frozen BN leaves deep mobile trunks normalisation-free).
        # "auto" calibrates only when the feature taps are pathologically
        # small — backbones that still carry signal train better plain.
        from podtpu.train.calibrate import (calibrate_frozen_stats,
                                            needs_calibration)
        sample = dataset.load_batch(
            [int(i) for i in train_idx[: max(2, min(8, batch_size))]])
        images = np.stack([s.image for s in sample])
        if cfg.train.calibrate_bn is True \
                or needs_calibration(model, variables, images):
            variables = calibrate_frozen_stats(model, variables, images)
            variables = jax.device_put(variables, jax.devices()[0])
            print("FrozenBN statistics calibrated on a sample batch "
                  "(from-scratch run: feature taps were vanishing)")

    if restored is not None and cfg.train.optimiser == "sgd":
        # Resume must rebuild the optimizer FLAVOR the checkpoint was
        # trained with: a fused flat-buffer state cannot load into the
        # per-parameter optax chain or vice versa (the math is identical;
        # only the state layout differs).
        from podtpu.train.optim import FusedSGDState
        fused_ckpt = isinstance(restored.get("opt_state"), FusedSGDState)
        if fused_ckpt != cfg.train.fused_sgd:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train,
                                               fused_sgd=fused_ckpt))
            print("Resuming: checkpoint optimizer state is "
                  f"{'fused' if fused_ckpt else 'per-parameter'}; "
                  "matching it")
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    base_lr = cfg.train.adam_lr if optimiser in ("adam", "adamw") \
        else cfg.train.lr
    # 'alrs' (default, the miso path) or the vendored trainer's fixed
    # 'multistep'/'cosine' budgets (podtpu/train/schedules.py).
    sched = make_scheduler(cfg.train, base_lr)

    start_epoch = 0
    if resume:
        # `restored` was loaded once, up top (the model config came
        # from it before the architecture was built).
        if restored is not None:
            state = TrainState(
                params=restored["params"], frozen=restored["frozen"],
                opt_state=restored["opt_state"],
                step=np.asarray(restored["step"], np.int32))
            sched.load_state_dict(restored["alrs"])
            start_epoch = restored["epoch"] + 1
            print(f"Resumed from epoch {restored['epoch']}")

    dp_shard_batch = None
    multi_step = None
    if use_dp:
        from podtpu.parallel.dp import (make_dp_eval_step, make_dp_per_shard,
                                        make_dp_train_step)
        eval_step = make_dp_eval_step(model, mesh)
        # init_variables commits params to a single device; the DP step
        # needs them REPLICATED on the mesh (a single-device commitment
        # conflicts with the mesh-sharded batch under jit).
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        if use_device_cache or use_window_stream:
            # Both the pinned full cache and the streaming window are
            # sample-sharded device arrays with the same global-index
            # gather contract — one step serves both.
            train_step = dcache.make_sharded_cached_dp_train_step(
                make_dp_per_shard(model, tx, cfg), mesh)
        else:
            train_step, dp_shard_batch = make_dp_train_step(
                model, tx, cfg, mesh)
    else:
        base_step = make_train_step(model, tx, cfg)
        train_step = base_step
        eval_step = make_eval_step(model)
        if use_device_cache or use_window_stream:
            # One dispatch per step: the gather from the device-resident
            # arrays (full cache or current stream window) happens inside
            # the jitted step.
            train_step = dcache.make_cached_train_step(
                base_step, gather=cfg.train.cache_gather)
        if use_device_cache and cfg.train.steps_per_dispatch > 1:
            # Full-size dispatch groups run K steps in ONE program
            # (lax.scan) — per-dispatch RPC latency is the measured gap
            # between synthetic and loader-included throughput (see
            # make_cached_multi_step).  Tail groups fall back to the
            # single step (a padded no-op step would still apply weight
            # decay/momentum).
            multi_step = dcache.make_cached_multi_step(
                base_step, cfg.train.steps_per_dispatch,
                gather=cfg.train.cache_gather)

    # -- epoch loop (reference training.py:120-127) --------------------------
    print("=" * 80)
    # Optional profiler capture of a few steady-state steps (set
    # PODTPU_TRACE_DIR; SURVEY.md §5 — the reference has no tracing).
    trace_dir = os.environ.get("PODTPU_TRACE_DIR")
    tracing = False
    epoch = start_epoch
    stats = None
    final_eval = None
    zero_monitor = ZeroMapMonitor(cfg.train.zero_map_warn_epochs,
                                  cfg.train.abort_on_zero_map)
    for epoch in range(start_epoch, max_epochs):
        if sched.exhausted(epoch):
            # A resumed run whose budget is already spent (fixed-schedule
            # final epoch, or a finished ALRS run) trains ZERO further
            # epochs instead of overwriting the final model.
            print(f"Schedule budget already spent at epoch {epoch}; "
                  "not training further")
            break
        loader_train.set_epoch(epoch)
        logger = MetricLogger()
        iters = len(loader_train)
        step_rngs = jax.random.split(
            jax.random.fold_in(loop_rng, epoch), max(iters, 1))
        k_dispatch = cfg.train.steps_per_dispatch if multi_step is not None \
            else 1
        n_dispatch = iters // k_dispatch + iters % k_dispatch
        loss_sum = None  # device-side running sum; fetched once per epoch
        bi = 0  # global step index within the epoch (warmup/rng stream)
        for it, group in enumerate(
                logger.log_every(_dispatch_groups(loader_train, k_dispatch),
                                 cfg.train.log_every,
                                 header=f"Epoch: [{epoch}]",
                                 total=n_dispatch)):
            if trace_dir and epoch == start_epoch \
                    and it == min(3, n_dispatch - 1):
                jax.profiler.start_trace(trace_dir)
                tracing = True
            lrs = [sched.lr_for(epoch)
                   * warmup_factor(cfg, epoch, bi + j, iters)
                   for j in range(len(group))]
            if len(group) > 1:
                # Full group: K steps in one dispatch (exact same math as
                # K single steps — per-step lr/rng ride in as vectors).
                idx = np.stack([b.astype(np.int32) for b, _ in group])
                w = np.stack([v.astype(np.float32) for _, v in group])
                state, metrics = with_transient_retry(
                    multi_step, state, device_arrays, idx, w,
                    step_rngs[bi:bi + len(group)],
                    np.asarray(lrs, np.float32))
                group_loss = metrics["loss"].sum()
                metrics = {k: v[-1] for k, v in metrics.items()}
            else:
                batch, bvalid = group[0]
                if use_device_cache or use_window_stream:
                    # `batch` is the raw [B] index vector; the step
                    # gathers from the device-resident arrays (the pinned
                    # dataset, or the stream's current window buffer)
                    # internally.
                    arrays = device_arrays if use_device_cache \
                        else loader_train.arrays
                    state, metrics = with_transient_retry(
                        train_step, state, arrays, batch.astype(np.int32),
                        bvalid.astype(np.float32), step_rngs[bi],
                        np.float32(lrs[0]))
                else:
                    batch = dict(batch)
                    batch["image_weight"] = bvalid.astype(np.float32)
                    if dp_shard_batch is not None:
                        # Explicitly place the global batch sharded over
                        # the mesh (rather than trusting compiler-chosen
                        # input shardings for host numpy arrays).
                        batch = dp_shard_batch(batch)
                    state, metrics = with_transient_retry(
                        train_step, state, batch, step_rngs[bi],
                        np.float32(lrs[0]))
                group_loss = metrics["loss"]
            bi += len(group)
            # Accumulate the loss on device (tiny async adds): ALRS sees the
            # TRUE epoch mean over every step, and the epoch costs a single
            # host sync instead of one per log_every (reference averages
            # every step, engine/utils.py SmoothedValue).
            loss_sum = group_loss if loss_sum is None \
                else loss_sum + group_loss
            if tracing and it >= min(3, n_dispatch - 1) + 3:
                jax.profiler.stop_trace()
                tracing = False
                print(f"[podtpu] profiler trace written to {trace_dir}")
            if it % cfg.train.log_every == 0 or it == n_dispatch - 1:
                host = {k: float(v) for k, v in metrics.items()}
                if cfg.train.nan_is_fatal and not np.isfinite(host["loss"]):
                    print(f"Loss is {host['loss']}, stopping training")
                    print({k: v for k, v in host.items() if k != "lr"})
                    sys.exit(1)
                logger.update(**host)
        epoch_loss = float(loss_sum) / iters if loss_sum is not None else 0.0
        if cfg.train.nan_is_fatal and not np.isfinite(epoch_loss):
            print(f"Epoch loss is {epoch_loss}, stopping training")
            sys.exit(1)
        # The per-epoch evaluation IS the final evaluation for the last
        # epoch: the reference re-ran a full eval pass over the unchanged
        # model for artifacts (training.py:131 vs :144) — the SURVEY §7
        # quirk we deliberately do not reproduce.
        final_eval, stats = evaluate(eval_step, state.params, state.frozen,
                                     loader_test, num_classes=len(labels))
        abort = zero_monitor.update(epoch, float(stats[0]), float(stats[8]))
        # ALRS step BEFORE checkpointing so a resumed scheduler has this
        # epoch's loss in its buffer.
        should_stop = sched.step(epoch, epoch_loss)
        ckpt.save_train_checkpoint(output_dir, state, epoch,
                                   sched.state_dict(), model_cfg=cfg.model)
        if should_stop or abort:
            break

    print("-" * 80)
    print(f"Training finished, {epoch + 1} epochs")
    if stats is None:
        # No epoch ran (resume of an already-finished run): evaluate once so
        # the artifacts still reflect the restored model.
        final_eval, stats = evaluate(eval_step, state.params, state.frozen,
                                     loader_test, num_classes=len(labels))
    print("=" * 80)

    # -- artifacts (reference training.py:135-160) ---------------------------
    if is_main_process():
        os.makedirs(output_dir, exist_ok=True)
        ckpt.save_model(output_dir, state.params, state.frozen, cfg.model,
                        labels)
        _save_aux_results(output_dir, final_eval, stats, labels)
    return output_dir


def _save_aux_results(output_dir, final_eval, stats, labels):
    ckpt.save_labels(output_dir, labels)
    ckpt.save_results(output_dir, stats, STAT_NAMES)
    if getattr(final_eval, "segm_stats", None) is not None:
        ckpt.save_results(output_dir, final_eval.segm_stats, STAT_NAMES,
                          filename="results_segm.txt")
    if getattr(final_eval, "keypoints_stats", None) is not None:
        ckpt.save_results(output_dir, final_eval.keypoints_stats,
                          STAT_NAMES, filename="results_keypoints.txt")
    if len(labels) > 1:
        # Per-class breakdown (beyond the reference: its pycocotools
        # summary only reports class-averaged stats).
        per_class = final_eval.per_class_text(labels)
        with open(os.path.join(output_dir, "results_per_class.txt"),
                  "w") as f:
            f.write(per_class + "\n")
        print(per_class)


def evaluate_model(project: Project,
                   model_dir: str,
                   batch_size: int = 2,
                   num_workers: int = 4,
                   output_dir: Optional[str] = None):
    """Evaluate a SAVED model on ``project`` without training — the
    vendored trainer's ``--test-only`` mode
    (`miso/object_detection/engine/train.py:273-276`).

    Every annotated image in ``project`` is scored (the caller supplies
    the held-out tasks); returns the 12 bbox COCO stats.  When
    ``output_dir`` is given the results files are written there in the
    training artifacts' format.
    """
    params, frozen, model_cfg, labels = ckpt.load_model(model_dir)
    project = copy.deepcopy(project)
    project.keep_annotations_with_label(labels)
    project.remove_unlabelled_images()
    project.update_label_dict()
    if not project.image_dict:
        raise ValueError("Project has no annotated images with the model's "
                         f"labels {labels}")
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes,
                               label_names=labels,
                               with_masks=model_cfg.with_mask,
                               mask_stride=model_cfg.mask_gt_stride,
                               with_keypoints=model_cfg.with_keypoints,
                               num_keypoints=model_cfg.num_keypoints)
    loader = Loader(dataset, batch_size, shuffle=False,
                    num_workers=num_workers)
    model = make_detector(model_cfg)
    params, frozen = jax.device_put((params, frozen), jax.devices()[0])
    eval_step = make_eval_step(model)
    print(f"Evaluating {model_dir} on {len(dataset)} images")
    final_eval, stats = evaluate(eval_step, params, frozen, loader,
                                 num_classes=len(labels))
    if output_dir is not None and is_main_process():
        os.makedirs(output_dir, exist_ok=True)
        _save_aux_results(output_dir, final_eval, stats, labels)
    return stats
