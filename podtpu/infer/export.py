"""AOT model export: the compiled eval forward as a serialized StableHLO
artifact (`jax.export`).

Production-serving counterpart of the reference's pickled whole-module
``model.pt`` (`miso/object_detection/training.py:136`): where the pickle
needs the exact torchvision class tree importable at load time, the
exported artifact embeds the weights as constants and the ENTIRE compiled
program — backbone, RPN, RoIAlign, NMS, postprocess — in one
versioned, self-contained file that replays without any of this
framework's model code (and without retracing).  Deployment loads it with
:class:`ExportedModel` (or any StableHLO-capable runtime).

Artifacts are per-platform: the default exports for the platform of the
attached devices (the Pallas kernels are TPU lowerings, so a TPU export
is TPU-only; pass ``platforms=("cpu",)`` on CPU hosts, where the XLA
kernel fallbacks are used automatically by the size-window dispatch).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

EXPORT_NAME = "model.stablehlo"
META_NAME = "export.json"


def export_model(model_dir: str, batch_size: int = 1,
                 platforms: Optional[Sequence[str]] = None,
                 out_path: Optional[str] = None) -> str:
    """Serialize ``model_dir``'s eval forward; returns the artifact path.

    The exported callable maps uint8 canvases ``[batch, H, W, 3]`` (the
    model's fixed ``image_size``) to a dict of ``boxes [B, D, 4]`` (xyxy,
    canvas coordinates), ``scores [B, D]``, ``labels [B, D]`` (1-based),
    ``valid [B, D]`` — plus ``masks`` / ``keypoints`` for those heads.
    """
    from jax import export as jexport

    from podtpu.models.detector import make_detector
    from podtpu.train.checkpoints import load_model
    from podtpu.train.step import split_eval_output

    params, frozen, model_cfg, labels = load_model(model_dir)
    model = make_detector(model_cfg)
    h, w = model_cfg.image_size

    def forward(images):
        out = model.apply({"params": params, "frozen": frozen}, images,
                          train=False)
        det, masks, kps = split_eval_output(out)
        outs = {"boxes": det.boxes, "scores": det.scores,
                "labels": det.labels, "valid": det.valid}
        if masks is not None:
            outs["masks"] = masks
        if kps is not None:
            outs["keypoints"] = kps
        return outs

    if platforms is None:
        platforms = (jax.devices()[0].platform,)
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(forward),
                              platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    out_path = out_path or os.path.join(model_dir, EXPORT_NAME)
    with open(out_path, "wb") as fp:
        fp.write(blob)
    meta = {
        "labels": labels,
        "image_size": [h, w],
        "batch_size": batch_size,
        "platforms": list(platforms),
        "outputs": sorted(
            ["boxes", "scores", "labels", "valid"]
            + (["masks"] if model_cfg.with_mask else [])
            + (["keypoints"] if getattr(model_cfg, "with_keypoints", False)
               else [])),
    }
    with open(os.path.join(os.path.dirname(out_path), META_NAME), "w") as fp:
        json.dump(meta, fp, indent=1)
    return out_path


class ExportedModel:
    """Load and call a serialized artifact; no model code involved.

    ``__call__`` accepts uint8 images ``[B, H, W, 3]`` with the exported
    batch size and returns the output dict as numpy arrays.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as fp:
            self.exported = jexport.deserialize(fp.read())
        meta_path = os.path.join(os.path.dirname(path), META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as fp:
                meta = json.load(fp)
            self.labels = meta["labels"]
            self.image_size: Tuple[int, int] = tuple(meta["image_size"])
            self.batch_size = int(meta["batch_size"])
        else:  # bare artifact: shapes are recoverable from the signature
            spec = jax.tree.leaves(self.exported.in_avals)[0]
            self.labels = None
            self.image_size = tuple(spec.shape[1:3])
            self.batch_size = int(spec.shape[0])

    def __call__(self, images: np.ndarray):
        images = np.asarray(images)
        if images.dtype != np.uint8:
            # A silent value-cast would truncate float [0,1] canvases
            # (valid on the live model) to all-zero uint8.
            raise TypeError(
                f"exported model takes uint8 canvases, got {images.dtype}; "
                "scale floats to [0, 255] and cast explicitly")
        out = self.exported.call(jnp.asarray(images))
        return jax.tree.map(np.asarray, out)
