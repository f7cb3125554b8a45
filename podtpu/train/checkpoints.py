"""Checkpoint save/load: final model artifact + mid-training resume.

The reference saves only a final whole-pickled torch module
(`miso/object_detection/training.py:136` ``torch.save(model, "model.pt")``)
and has no mid-training checkpoints (SURVEY.md §5 checkpoint/resume).  Here:

* the final artifact is a **directory contract** compatible with the
  reference's (same ``labels.txt`` / ``results.txt`` formats) but with
  ``model.msgpack`` (flax-serialised params + frozen stats) and
  ``config.json`` instead of a pickle;
* per-epoch train-state checkpoints (params, opt_state, epoch, ALRS state)
  enable ``--resume``, the pattern the reference only has in its vendored
  trainer (`engine/train.py:264-296`).
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
from flax import serialization

from podtpu.core.config import ModelConfig


def save_model(out_dir: str, params, frozen, model_cfg: ModelConfig,
               labels) -> None:
    os.makedirs(out_dir, exist_ok=True)
    payload = {"params": jax.device_get(params),
               "frozen": jax.device_get(frozen)}
    with open(os.path.join(out_dir, "model.msgpack"), "wb") as fp:
        fp.write(serialization.to_bytes(payload))
    with open(os.path.join(out_dir, "config.json"), "w") as fp:
        json.dump({"model": dataclasses.asdict(model_cfg),
                   "labels": list(labels)}, fp, indent=2)


def model_config_from_dict(cfg_dict: Dict) -> ModelConfig:
    """Rebuild a ModelConfig from its JSON/pickle dict form (tuples
    serialise as lists; anchor_sizes may nest per-level size tuples, which
    must come back hashable for grid_anchors' cache)."""
    field_types = {f.name: f.type for f in dataclasses.fields(ModelConfig)}

    def detuple(v):
        if isinstance(v, list):
            return tuple(detuple(x) for x in v)
        return v

    kwargs = {}
    for k, v in cfg_dict.items():
        if k in field_types:
            v = detuple(v)
        kwargs[k] = v
    return ModelConfig(**kwargs)


def load_model(model_dir: str) -> Tuple[Dict, Dict, ModelConfig, list]:
    """Returns (params, frozen, model_cfg, labels)."""
    with open(os.path.join(model_dir, "config.json")) as fp:
        meta = json.load(fp)
    model_cfg = model_config_from_dict(meta["model"])
    with open(os.path.join(model_dir, "model.msgpack"), "rb") as fp:
        payload = serialization.msgpack_restore(fp.read())
    return payload["params"], payload["frozen"], model_cfg, meta["labels"]


def save_labels(out_dir: str, labels) -> None:
    """``labels.txt`` in the reference's exact ``idx,name`` format
    (`training.py:139-141`; read back by `cli.py:163-168`)."""
    with open(os.path.join(out_dir, "labels.txt"), "w") as fp:
        for idx, label in enumerate(labels):
            fp.write(f"{idx + 1},{label}\n")


def read_labels(path: str) -> list:
    labels = []
    with open(path) as fp:
        for line in fp.readlines():
            parts = line.split(",")
            if len(parts) > 1:
                labels.append(parts[1].strip())
    return labels


def save_results(out_dir: str, stats, stat_names,
                 filename: str = "results.txt") -> None:
    """``results.txt`` with the reference's 12-stat block
    (`training.py:144-160`); mask models additionally persist the segm
    block as ``results_segm.txt``."""
    with open(os.path.join(out_dir, filename), "w") as fp:
        for name, stat in zip(stat_names, stats):
            fp.write(f"{name} = {stat:.3f}\n")


# -- mid-training checkpoints -------------------------------------------------

def save_train_checkpoint(out_dir: str, state, epoch: int,
                          alrs_state: Dict,
                          model_cfg: Optional[ModelConfig] = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "checkpoint.pkl")
    tmp = path + ".tmp"
    payload = {
        "params": jax.device_get(state.params),
        "frozen": jax.device_get(state.frozen),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
        "alrs": alrs_state,
    }
    if model_cfg is not None:
        # Resume rebuilds the EXACT architecture/optimizer from this, not
        # from the resuming call's arguments (see train.py).
        payload["model_cfg"] = dataclasses.asdict(model_cfg)
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp)
    os.replace(tmp, path)


def load_train_checkpoint(out_dir: str) -> Optional[Dict]:
    path = os.path.join(out_dir, "checkpoint.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fp:
        return pickle.load(fp)
