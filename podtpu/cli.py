"""Command-line interface.

Preserves the reference CLI's exact command/flag surface
(`miso/cli.py:15-257`): a click group with ``train-object-detector``,
``infer-object-detector``, ``crop-objects`` and
``infer-object-detector-directory``, the same option names/defaults
(batch-size 2, api v1, output ``/obj_det/models``, max-epochs 100000,
alrs-epochs 10, optimiser sgd, threshold 0.5, ``--nv``, ``--wsl2``, ...).

Additions (the reference hardcodes these): ``--server`` for the CVAT url
(default ``http://cvat:8080``, `cli.py:101`), ``--username``/``--password``
(default admin/admin, `cvat_web_api.py:317`), ``--image-size`` for the static
canvas, and a new ``infer-object-detector-tiled`` command exposing the
sliding-window scan path.

Run as ``python -m podtpu.cli`` (the reference's ``python -m miso.cli``).
"""
from __future__ import annotations

import dataclasses
import os.path
from pathlib import Path

import click

from podtpu.data.cvat.client import CvatTask
from podtpu.data.project import Project
from podtpu.shared.utils import now_as_str


def _load_tasks(tasks, server, wsl2, api, username, password,
                image_root=None) -> Project:
    project = Project()
    for task_id in tasks:
        task = CvatTask(server, task_id, is_wsl2=wsl2, api=api, debug=True,
                        username=username, password=password,
                        image_root=image_root)
        task.load()
        project.add_project(task.project)
    return project


def _read_labels(labels_path):
    from podtpu.train.checkpoints import read_labels
    return read_labels(labels_path)


server_options = [
    click.option("--server", type=str, default="http://cvat:8080",
                 show_default=True, help="CVAT server URL"),
    click.option("--username", type=str, default="admin", show_default=True,
                 help="CVAT username"),
    click.option("--password", type=str, default="admin",
                 help="CVAT password"),
    click.option("--image-root", type=str, default=None,
                 help="Explicit image root (default: the CVAT container "
                      "data path, like the reference)"),
]


def add_options(options):
    def wrap(fn):
        for option in reversed(options):
            fn = option(fn)
        return fn
    return wrap


@click.group()
def cli():
    # Persistent XLA compilation cache: the second run of any command skips
    # the minutes-long TPU compile (PODTPU_NO_COMPILE_CACHE=1 to disable).
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()


@cli.command()
@click.option("-t", "--tasks", type=str,
              prompt="List of task ids to train on",
              help="List of task ids to train on separated by commas")
@click.option("-l", "--labels", type=str, default=None,
              help="List of label names to train on separated by commas")
@click.option("--merge-label", type=str, default=None,
              help="Merge the labels into a single label")
@click.option("--batch-size", type=int, default=2, show_default=True,
              help="Batch size for training (reduce if getting "
                   "out-of-memory errors")
@click.option("--wsl2", is_flag=True, default=False,
              help="Running this on a windows machine using WSL2 instead "
                   "of docker")
@click.option("--api", type=str, default="v1", show_default=True,
              help="CVAT api version string, v1 or v2")
@click.option("-o", "--output-dir", type=str, default="/obj_det/models",
              show_default=True, help="Model output directory")
@click.option("-m", "--model", type=str, default=None, help="Model name")
@click.option("-d", "--data", type=str, default="/data", show_default=True,
              help="Data directory")
@click.option("--max-epochs", type=int, default=100000, show_default=True,
              help="Maximum number of epochs")
@click.option("--alrs-epochs", type=int, default=10, show_default=True,
              help="Number of epochs to monitor for alrs")
@click.option("--optimiser", type=click.Choice(["sgd", "adam", "adamw"]),
              default="sgd", show_default=True,
              help="Optimiser to use (adamw = the vendored trainer's "
                   "decoupled-weight-decay option)")
@click.option("--lr", type=float, default=None,
              help="Learning rate override for the selected optimiser "
                   "(defaults: sgd 0.005 — the miso default — and "
                   "adam/adamw 0.001)")
@click.option("--weight-decay", type=float, default=None,
              help="Weight decay override (default 5e-4, the miso SGD "
                   "recipe; applies to sgd and adamw — plain adam carries "
                   "no decay term, matching the reference)")
@click.option("--lr-schedule", type=click.Choice(["alrs", "multistep",
                                                  "cosine"]),
              default="alrs", show_default=True,
              help="LR schedule: adaptive early stopping (alrs, the miso "
                   "default) or the vendored trainer's fixed-budget "
                   "multistep/cosine schedules (run exactly --epochs epochs)")
@click.option("--epochs", type=int, default=26, show_default=True,
              help="Epoch budget for --lr-schedule multistep/cosine "
                   "(ignored by alrs)")
@click.option("--lr-steps", type=str, default="16,22", show_default=True,
              help="Comma-separated milestone epochs for "
                   "--lr-schedule multistep")
@click.option("--lr-gamma", type=float, default=0.1, show_default=True,
              help="LR decay factor at each multistep milestone")
@click.option("--norm-weight-decay", type=float, default=None,
              help="Separate weight decay for normalisation parameters "
                   "(default: same as the global weight decay)")
@click.option("--image-size", type=int, default=1024, show_default=True,
              help="Static training canvas size (square)")
@click.option("--pretrained", type=str, default=None,
              help="Path to pretrained backbone weights "
                   "(torchvision .pth or converted .msgpack)")
@click.option("--resume", is_flag=True, default=False,
              help="Resume from the last epoch checkpoint if present")
@click.option("--with-mask", is_flag=True, default=False,
              help="Train a Mask R-CNN head on polygon annotations")
@click.option("--with-keypoints", is_flag=True, default=False,
              help="Train a Keypoint R-CNN head (annotations must carry "
                   "COCO-style keypoint triples, e.g. via import-coco)")
@click.option("--num-keypoints", type=int, default=17, show_default=True,
              help="Keypoints per instance (COCO person skeleton = 17)")
@click.option("--keypoint-hflip-inds", type=str, default=None,
              help="Comma-separated index permutation applied to keypoints "
                   "under horizontal flip (left/right joint swap). "
                   "Defaults to the COCO-17 swap when --num-keypoints 17, "
                   "identity otherwise; a non-identity permutation also "
                   "disables the miso policy's vertical flip")
@click.option("--keypoint-roi-expand", type=float, default=1.0,
              show_default=True,
              help="Scale factor applied to detection boxes before the "
                   "keypoint head's RoIAlign. 1.0 = torchvision decode "
                   "parity (right for COCO-style INTERIOR joints and for "
                   "imported checkpoints). Use ~1.3 when keypoints sit ON "
                   "the box border (corners, tips): at 1.0 a border "
                   "keypoint lands in the RoI's edge cell and strict OKS "
                   "is floored no matter how good the heatmap is")
@click.option("--num-devices", type=int, default=None,
              help="Data-parallel device count (default: all accelerator "
                   "devices; batch-size is per device)")
@click.option("--backbone", type=click.Choice(["resnet50_fpn",
                                               "mobilenet_v2",
                                               "mobilenet_v3_fpn",
                                               "mobilenet_v3_320_fpn"]),
              default=None,
              help="Backbone: ResNet-50-FPN (default), single-map "
                   "MobileNetV2, or MobileNetV3-Large-FPN (the '320' "
                   "spelling selects the low-res/low-compute recipe). "
                   "Only applies to --family faster_rcnn (the v2 recipe "
                   "and the SSD families carry their own backbones)")
@click.option("--family", type=click.Choice(["faster_rcnn",
                                             "faster_rcnn_v2", "retinanet",
                                             "retinanet_v2", "fcos", "ssd",
                                             "ssdlite"]),
              default="faster_rcnn", show_default=True,
              help="Two-stage Faster R-CNN (v2 = improved-recipe heads; "
                   "with --with-mask this is Mask R-CNN v1/v2), one-stage "
                   "RetinaNet (v2 = GroupNorm subnets + GIoU), anchor-free "
                   "FCOS, SSD300-VGG16, or SSDLite320-MobileNetV3 (the SSD "
                   "families use their own 300/320 canvas; --image-size is "
                   "ignored)")
@click.option("--test-tasks", type=str, default=None,
              help="Comma-separated CVAT task ids held out for evaluation "
                   "(fixes the reference's same-task random split; default "
                   "keeps the seeded 80/20 split)")
@click.option("--test-only", is_flag=True, default=False,
              help="Skip training: evaluate the saved model named by "
                   "--model on the given tasks and print the COCO stats "
                   "(the vendored trainer's --test-only, "
                   "engine/train.py:273-276)")
@add_options(server_options)
def train_object_detector(tasks, labels, merge_label, batch_size, wsl2, api,
                          output_dir, model, data, max_epochs, alrs_epochs,
                          optimiser, lr, weight_decay,
                          lr_schedule, epochs, lr_steps, lr_gamma,
                          norm_weight_decay, image_size, pretrained, resume,
                          with_mask, with_keypoints, num_keypoints,
                          keypoint_hflip_inds, keypoint_roi_expand,
                          num_devices, backbone, family,
                          test_tasks, test_only, server, username, password,
                          image_root):
    from podtpu.core.config import Config
    from podtpu.train.train import train

    task_ids = [int(task.strip()) for task in tasks.split(",")]
    if labels is not None:
        labels = [label.strip() for label in labels.split(",")]

    project = _load_tasks(task_ids, server, wsl2, api, username, password,
                          image_root=image_root)
    test_project = None
    if test_tasks and not test_only:
        test_ids = [int(t.strip()) for t in test_tasks.split(",")]
        test_project = _load_tasks(test_ids, server, wsl2, api, username,
                                   password, image_root=image_root)

    # --merge-label / --labels preprocessing applies to BOTH training and
    # --test-only: a model trained with merged labels must see the same
    # renames at evaluation time, or every image looks unannotated.
    if merge_label is not None:
        for proj in [project] + ([test_project] if test_project else []):
            for label in list(proj.label_dict.values()):
                if labels and label.name in labels:
                    proj.rename_label(label.name, merge_label)
            proj.update_label_dict()
        labels = [merge_label]

    if test_only:
        if not model:
            raise click.BadParameter(
                "--test-only needs --model (the saved model's name under "
                "--output-dir)")
        if labels is not None:
            project.keep_annotations_with_label(labels)
            project.update_label_dict()
        from podtpu.train.train import evaluate_model
        evaluate_model(project, os.path.join(output_dir, model),
                       batch_size=batch_size)
        return

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       image_size=(image_size, image_size)),
        train=dataclasses.replace(
            cfg.train, lr_schedule=lr_schedule, epochs=epochs,
            lr_steps=tuple(int(s.strip()) for s in lr_steps.split(",")),
            lr_gamma=lr_gamma, norm_weight_decay=norm_weight_decay))
    if lr is not None:
        # One flag steers whichever optimiser was selected (the vendored
        # trainer's --lr drives SGD and AdamW alike, engine/train.py:238-250).
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, lr=lr, adam_lr=lr))
    if weight_decay is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, weight_decay=weight_decay))
    if keypoint_hflip_inds:
        inds = tuple(int(i) for i in keypoint_hflip_inds.split(","))
        # Must be a permutation of range(num_keypoints): a wrong length
        # shape-crashes deep inside the jitted augmentation and an
        # out-of-range index silently corrupts flip targets (jit gathers
        # clamp) — validate here where the message can name the flag.
        if sorted(inds) != list(range(num_keypoints)):
            raise click.BadParameter(
                f"--keypoint-hflip-inds must be a permutation of "
                f"0..{num_keypoints - 1} (got {len(inds)} values: "
                f"{keypoint_hflip_inds})")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           keypoint_hflip_inds=inds))
    if keypoint_roi_expand != 1.0:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, keypoint_roi_expand=keypoint_roi_expand))
    train(project, labels,
          output_dir=output_dir, name=model, batch_size=batch_size,
          max_epochs=max_epochs, alrs_epochs=alrs_epochs,
          optimiser=optimiser, config=cfg, pretrained=pretrained,
          resume=resume, with_mask=with_mask, with_keypoints=with_keypoints,
          num_keypoints=num_keypoints, num_devices=num_devices,
          backbone=backbone, family=family, test_project=test_project)


@cli.command()
@click.option("--tasks", type=str, prompt="List of task ids to infer on",
              help="List of task ids to infer on")
@click.option("--model-dir", type=str, default="/obj_det/models",
              show_default=True, help="Directory containing models")
@click.option("--model", type=str,
              prompt="Name of folder containing model",
              help="Name of folder containing model")
@click.option("--threshold", type=float, default=0.5,
              help="Detection threshold")
@click.option("--batch-size", type=int, default=2,
              help="Batch size for training (reduce if getting "
                   "out-of-memory errors")
@click.option("--nv", is_flag=True, default=False,
              help="Append NV to the detected labels")
@click.option("--wsl2", is_flag=True, default=False,
              help="Running this on a windows machine using WSL2 instead "
                   "of docker")
@click.option("--api", type=str, default="v1", show_default=True,
              help="CVAT api version string, v1 or v2")
@add_options(server_options)
def infer_object_detector(tasks, model_dir, model, threshold, batch_size, nv,
                          wsl2, api, server, username, password, image_root):
    from podtpu.infer.inference import infer

    task_ids = [int(task) for task in tasks.split(",")]
    model_path = os.path.join(model_dir, model)
    labels = _read_labels(os.path.join(model_dir, model, "labels.txt"))

    for task_id in task_ids:
        task = CvatTask(server, task_id, is_wsl2=wsl2, api=api, debug=True,
                        username=username, password=password,
                        image_root=image_root)
        task.load()
        project = infer(task.project, model_path, labels, threshold,
                        batch_size, nv)
        project.summary()
        task.add_shapes(project)


@cli.command()
@click.option("--tasks", type=str, prompt="List of task ids to crop from",
              help="List of task ids to crop from")
@click.option("-o", "--output-dir", type=str, default="/obj_det/crops",
              show_default=True, help="Crop output directory")
@click.option("--wsl2", is_flag=True, default=False,
              help="Running this on a windows machine using WSL2 instead "
                   "of docker")
@click.option("--api", type=str, default="v1", show_default=True,
              help="CVAT api version string, v1 or v2")
@add_options(server_options)
def crop_objects(tasks, output_dir, wsl2, api, server, username, password,
                 image_root):
    from podtpu.infer.crop import crop_objects as crop_objects_fn

    task_ids = [int(task) for task in tasks.split(",")]
    output_dir = os.path.join(
        output_dir,
        now_as_str() + "_" + "_".join(str(t) for t in task_ids))
    for task_id in task_ids:
        task = CvatTask(server, task_id, is_wsl2=wsl2, api=api, debug=True,
                        username=username, password=password,
                        image_root=image_root)
        task.load()
        crop_objects_fn(task.project, output_dir)


@cli.command()
@click.option("-i", "--input-dir", type=str,
              prompt="Name of folder containing images to infer on",
              help="Name of folder containing images to infer on")
@click.option("-o", "--output-dir", type=str,
              prompt="Name of folder to store results",
              help="Name of folder to store results")
@click.option("--model-dir", type=str, default="/obj_det/models",
              show_default=True, help="Directory containing models")
@click.option("--model", type=str,
              prompt="Name of folder containing model",
              help="Name of folder containing model")
@click.option("--threshold", type=float, default=0.5,
              help="Detection threshold")
@click.option("--batch-size", type=int, default=2,
              help="Batch size for training (reduce if getting "
                   "out-of-memory errors")
def infer_object_detector_directory(input_dir, output_dir, model_dir, model,
                                    threshold, batch_size):
    from podtpu.infer.crop import crop_objects as crop_objects_fn
    from podtpu.infer.inference import infer_directory

    model_path = os.path.join(model_dir, model)
    labels = _read_labels(os.path.join(model_dir, model, "labels.txt"))
    project = infer_directory(input_dir, model_path, labels, threshold,
                              batch_size)
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    crop_objects_fn(project, output_dir, relative_to=input_dir)


@cli.command()
@click.option("-i", "--input", "input_path", type=str,
              prompt="Image file to scan", help="Large scan image to tile")
@click.option("--model-dir", type=str, default="/obj_det/models",
              show_default=True, help="Directory containing models")
@click.option("--model", type=str,
              prompt="Name of folder containing model",
              help="Name of folder containing model")
@click.option("--threshold", type=float, default=0.5,
              help="Detection threshold")
@click.option("--overlap", type=float, default=0.25, show_default=True,
              help="Tile overlap fraction")
@click.option("--batch-size", type=int, default=8, show_default=True)
@click.option("--tile-size", type=int, default=None,
              help="Override the tile canvas (defaults to the model's "
                   "training canvas; params are canvas-independent)")
@click.option("--spatial-devices", type=int, default=1, show_default=True,
              help="Shard each tile's height over N devices so giant tiles "
                   "exceed one chip's memory (podtpu/parallel/spatial.py)")
@click.option("-o", "--output", type=str, default=None,
              help="Write detections as JSON to this path")
def infer_object_detector_tiled(input_path, model_dir, model, threshold,
                                overlap, batch_size, tile_size,
                                spatial_devices, output):
    """Sliding-window scan inference with cross-tile NMS (new capability)."""
    import json

    from podtpu.infer.tiled import infer_tiled
    from podtpu.train.checkpoints import read_labels

    model_path = os.path.join(model_dir, model)
    labels = read_labels(os.path.join(model_dir, model, "labels.txt"))
    dets = infer_tiled(input_path, model_path, threshold=threshold,
                       overlap=overlap, batch_size=batch_size,
                       tile_size=tile_size, spatial_devices=spatial_devices)
    rows = []
    for d in dets:
        row = {"box": d.box, "score": d.score,
               "label": labels[d.label - 1]}
        if d.polygon is not None:  # mask models: instance outline
            row["polygon"] = [[float(x), float(y)] for x, y in d.polygon]
        rows.append(row)
    text = json.dumps(rows, indent=2)
    if output:
        with open(output, "w") as fp:
            fp.write(text)
    else:
        print(text)
    print(f"{len(dets)} detections")


@cli.command()
@click.option("-i", "--input-dir", type=str,
              prompt="Folder of class-sorted crops",
              help="Folder of class-sorted crops (crop-objects output)")
@click.option("-o", "--output-dir", type=str, default="/obj_det/classifiers",
              show_default=True, help="Model output directory")
@click.option("-m", "--model", type=str, default=None, help="Model name")
@click.option("--batch-size", type=int, default=32, show_default=True)
@click.option("--image-size", type=int, default=128, show_default=True)
@click.option("--max-epochs", type=int, default=100000, show_default=True)
@click.option("--alrs-epochs", type=int, default=10, show_default=True)
def train_crop_classifier(input_dir, output_dir, model, batch_size,
                          image_size, max_epochs, alrs_epochs):
    """Train a classifier on class-sorted object crops
    (fills the reference's empty image_classification package)."""
    from podtpu.train.classify import train_classifier

    train_classifier(input_dir, output_dir=output_dir, name=model,
                     batch_size=batch_size, image_size=image_size,
                     max_epochs=max_epochs, alrs_epochs=alrs_epochs)


@cli.command()
@click.option("-i", "--input-dir", type=str, prompt="Folder of crops",
              help="Folder of crops to classify")
@click.option("--model-dir", type=str, default="/obj_det/classifiers",
              show_default=True)
@click.option("--model", type=str, prompt="Model folder name")
@click.option("--batch-size", type=int, default=32, show_default=True)
@click.option("-o", "--output", type=str, default=None,
              help="Write path->label JSON here instead of stdout")
def classify_crops(input_dir, model_dir, model, batch_size, output):
    """Classify object crops with a trained crop classifier."""
    import json

    from podtpu.train.classify import classify_crops as classify_fn

    result = classify_fn(input_dir, os.path.join(model_dir, model),
                         batch_size=batch_size)
    text = json.dumps(result, indent=2)
    if output:
        with open(output, "w") as fp:
            fp.write(text)
    else:
        print(text)


@cli.command()
@click.option("--model-dir", type=str, default="/obj_det/models",
              show_default=True, help="Directory containing models")
@click.option("--model", type=str, prompt="Name of folder containing model",
              help="Name of folder containing model")
@click.option("--host", type=str, default="0.0.0.0", show_default=True)
@click.option("--port", type=int, default=8500, show_default=True)
@click.option("--batch-size", type=int, default=4, show_default=True,
              help="Micro-batch size for coalescing concurrent requests")
@click.option("--exported", is_flag=True, default=False,
              help="Serve the model dir's AOT artifact (model.stablehlo "
                   "from export-model) instead of tracing the live model")
def serve(model_dir, model, host, port, batch_size, exported):
    """Serve a trained detector over HTTP (POST /detect with image bytes;
    micro-batched inference — new capability)."""
    from podtpu.infer.server import serve as serve_fn

    serve_fn(os.path.join(model_dir, model), host=host, port=port,
             batch_size=batch_size, exported=exported)


@cli.command()
@click.option("--model-dir", type=str, default="/obj_det/models",
              show_default=True, help="Directory containing models")
@click.option("--model", type=str, prompt="Name of folder containing model",
              help="Name of folder containing model")
@click.option("--batch-size", type=int, default=1, show_default=True,
              help="Fixed batch size compiled into the artifact")
@click.option("--platforms", type=str, default=None,
              help="Comma-separated lowering platforms (default: the "
                   "attached accelerator's)")
@click.option("-o", "--output", type=str, default=None,
              help="Artifact path (default: <model dir>/model.stablehlo)")
def export_model(model_dir, model, batch_size, platforms, output):
    """Export the compiled eval forward as a self-contained StableHLO
    artifact (weights embedded; replays without the framework's model
    code — new capability, the AOT answer to the reference's pickled
    model.pt)."""
    from podtpu.infer.export import export_model as export_fn

    platforms = ([p.strip() for p in platforms.split(",") if p.strip()]
                 if platforms else None)
    path = export_fn(os.path.join(model_dir, model), batch_size=batch_size,
                     platforms=platforms, out_path=output)
    click.echo(f"exported: {path}")


if __name__ == "__main__":
    cli()
