"""Crop-classifier training and inference drivers.

Completes the reference's empty ``miso/image_classification`` slot: trains
:class:`podtpu.models.classifier.CropClassifier` on a folder of class-sorted
crops — exactly the directory layout ``crop-objects`` produces
(``<root>/<label>/<crop>.jpg``) — with the same ALRS early-stopping schedule
the detector uses, and classifies crop folders at inference time.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from PIL import Image

from podtpu.core.logging import MetricLogger, is_main_process
from podtpu.models.classifier import CropClassifier
from podtpu.shared.utils import now_as_str
from podtpu.train.alrs import AdaptiveLearningRateScheduler
from podtpu.data.imageio import pil_to_rgb

IMAGE_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}


def scan_crop_folders(root: str) -> Tuple[List[str], List[int], List[str]]:
    """Recursively collect (paths, label indices, label names) from a
    class-sorted crop tree; the class is the immediate parent directory."""
    rootp = Path(root)
    files = [p for p in sorted(rootp.rglob("*.*"))
             if p.suffix.lower() in IMAGE_SUFFIXES]
    labels = sorted({p.parent.name for p in files})
    label_to_idx = {l: i for i, l in enumerate(labels)}
    return ([str(p) for p in files],
            [label_to_idx[p.parent.name] for p in files],
            labels)


def load_crop(path: str, size: int) -> np.ndarray:
    with Image.open(path) as im:
        arr = pil_to_rgb(im)
    try:
        import cv2
        arr = cv2.resize(arr, (size, size), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        arr = np.asarray(Image.fromarray(arr).resize((size, size)))
    return arr.astype(np.float32) / 255.0


def _batches(paths, labels, idx_order, batch_size, size):
    for start in range(0, len(idx_order), batch_size):
        sel = idx_order[start: start + batch_size]
        if len(sel) < batch_size:  # wrap for static shapes
            sel = np.concatenate([sel, idx_order[: batch_size - len(sel)]])
        images = np.stack([load_crop(paths[i], size) for i in sel])
        yield images, np.asarray([labels[i] for i in sel], np.int32)


def train_classifier(
    input_dir: str,
    output_dir: Optional[str] = None,
    name: Optional[str] = None,
    batch_size: int = 32,
    image_size: int = 128,
    lr: float = 0.001,
    max_epochs: int = 500,
    alrs_epochs: int = 10,
    alrs_drops: int = 4,
    alrs_startup_factor: int = 2,
    seed: int = 0,
    split_fraction: float = 0.2,
) -> str:
    """Train on a class-sorted crop folder; returns the model directory."""
    import optax

    paths, labels, label_names = scan_crop_folders(input_dir)
    if not paths:
        raise ValueError(f"No crops found under {input_dir}")
    n = len(paths)
    rng = np.random.default_rng(1)
    perm = rng.permutation(n)
    k = int(split_fraction * n)
    train_idx, test_idx = (perm[:-k], perm[-k:]) if k else (perm, perm[:0])

    if output_dir is None:
        output_dir = os.getcwd()
    output_dir = os.path.join(output_dir, name or now_as_str())
    print(f"Crop classifier training: {n} crops, "
          f"{len(label_names)} classes {label_names}")

    model = CropClassifier(num_classes=len(label_names))
    variables = model.init(jax.random.key(seed),
                           jnp.zeros((1, image_size, image_size, 3)))
    params = variables["params"]
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, images, targets, step_lr):
        def loss_fn(p):
            logits = model.apply({"params": p}, images)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, targets[:, None], 1)[:, 0]
            acc = jnp.mean((jnp.argmax(logits, -1) == targets)
                           .astype(jnp.float32))
            return ce.mean(), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        from podtpu.train.optim import apply_optimizer
        params, opt_state = apply_optimizer(tx, grads, opt_state, params,
                                            step_lr)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_logits(params, images):
        return model.apply({"params": params}, images)

    alrs = AdaptiveLearningRateScheduler(
        lr, nb_drops=alrs_drops, nb_epochs=alrs_epochs,
        startup_delay_factor=alrs_startup_factor)

    for epoch in range(max_epochs):
        order = np.random.default_rng(seed + epoch).permutation(train_idx)
        logger = MetricLogger()
        for images, targets in _batches(paths, labels, order, batch_size,
                                        image_size):
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(images), jnp.asarray(targets),
                np.float32(alrs.lr))
            logger.update(loss=float(loss), acc=float(acc))
        if is_main_process():
            print(f"Epoch [{epoch}] {logger}")
        if alrs.step(epoch, logger.meters["loss"].global_avg):
            break

    # Held-out accuracy.
    correct = total = 0
    for images, targets in _batches(paths, labels, test_idx, batch_size,
                                    image_size):
        preds = np.argmax(np.asarray(
            eval_logits(params, jnp.asarray(images))), -1)
        m = min(len(test_idx) - total, len(preds))
        correct += int((preds[:m] == targets[:m]).sum())
        total += m
    test_acc = correct / max(total, 1)
    print(f"Test accuracy: {test_acc:.3f} ({correct}/{total})")

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "classifier.msgpack"), "wb") as fp:
        fp.write(serialization.to_bytes(jax.device_get(params)))
    with open(os.path.join(output_dir, "classifier.json"), "w") as fp:
        json.dump({"labels": label_names, "image_size": image_size,
                   "test_accuracy": test_acc}, fp, indent=2)
    with open(os.path.join(output_dir, "labels.txt"), "w") as fp:
        for idx, label in enumerate(label_names):
            fp.write(f"{idx + 1},{label}\n")
    return output_dir


def classify_crops(input_dir: str, model_dir: str,
                   batch_size: int = 32) -> Dict[str, str]:
    """Classify every crop under ``input_dir``; returns path -> label."""
    with open(os.path.join(model_dir, "classifier.json")) as fp:
        meta = json.load(fp)
    label_names = meta["labels"]
    image_size = meta["image_size"]
    model = CropClassifier(num_classes=len(label_names))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, image_size, image_size, 3)))
    with open(os.path.join(model_dir, "classifier.msgpack"), "rb") as fp:
        params = serialization.from_bytes(
            jax.device_get(variables["params"]), fp.read())
    # Commit once: numpy params fed to a jit re-upload on every call.
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def logits_fn(images):
        return model.apply({"params": params}, images)

    paths = [str(p) for p in sorted(Path(input_dir).rglob("*.*"))
             if p.suffix.lower() in IMAGE_SUFFIXES]
    out: Dict[str, str] = {}
    for start in range(0, len(paths), batch_size):
        chunk = paths[start: start + batch_size]
        images = np.stack([load_crop(p, image_size) for p in chunk])
        if len(chunk) < batch_size:
            images = np.concatenate(
                [images, np.zeros((batch_size - len(chunk),) +
                                  images.shape[1:], np.float32)])
        preds = np.argmax(np.asarray(logits_fn(jnp.asarray(images))), -1)
        for p, pred in zip(chunk, preds):
            out[p] = label_names[int(pred)]
    return out
