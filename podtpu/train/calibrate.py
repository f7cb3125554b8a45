"""Data-dependent initialisation of FrozenBatchNorm statistics.

The framework's normalisation stance is FROZEN BN: statistics import from
pretrained checkpoints and never train (podtpu/models/resnet.py) — the
right call for the reference's fine-tuning workflow (it always starts from
torchvision COCO weights, `/root/reference/Dockerfile:4-5`).  Training
FROM SCRATCH, however, leaves every FrozenBN at its identity init, so the
net is effectively normalisation-free: deep mobile trunks attenuate the
signal multiplicatively (hardswish ≈ 0.5x and an SE gate ≈ 0.5x per block
at small inputs — measured 2e-4 mean |activation| at the MobileNetV3 taps,
which stalls the RPN entirely).

The fix is LSUV-style calibration: run the backbone on one real batch and
set each frozen BN's (mean, var) to the OBSERVED statistics of its input —
exactly what true BatchNorm would apply at step 0 — iterated a few passes
so downstream layers see their upstream's calibrated output.  Weights stay
frozen afterwards; a calibrated from-scratch net is simply "pretrained on
one batch".  ``train()`` runs this automatically when no pretrained
checkpoint is given (TrainConfig.calibrate_bn).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _make_bn_capture(model, images):
    """One jitted runner reused across calibration passes (recreating the
    jit per pass would recompile the feature extractor every time)."""
    from podtpu.models.resnet import FrozenBatchNorm

    @jax.jit
    def run(v):
        _, state = model.apply(
            v, images, method=lambda m, x: m._features(x),
            capture_intermediates=lambda mdl, _:
                isinstance(mdl, FrozenBatchNorm),
            mutable=["intermediates"])
        inter = state["intermediates"]

        stats: Dict[tuple, tuple] = {}

        def walk(node, prefix):
            if "__call__" in node:
                out = node["__call__"][0].astype(jnp.float32)
                axes = tuple(range(out.ndim - 1))
                stats[prefix] = (jnp.mean(out, axes), jnp.var(out, axes))
            for k, v_ in node.items():
                if k != "__call__" and isinstance(v_, dict):
                    walk(v_, prefix + (k,))

        walk(inter, ())
        return stats

    return lambda v: jax.device_get(run(v))


def needs_calibration(model, variables, images,
                      threshold: float = 1e-3) -> bool:
    """True when the feature taps are pathologically small on a sample
    batch (the "auto" criterion).  MobileNetV3's hardswish+SE stack decays
    to ~2e-4 mean |tap| under identity BN (training never starts), while
    ResNet/MobileNetV2 keep enough signal (>= ~7e-3) to train better from
    their plain init."""
    feats = jax.jit(
        lambda v: model.apply(v, images,
                              method=lambda m, x: m._features(x)))(variables)
    scale = max(float(jnp.abs(f.astype(jnp.float32)).mean())
                for f in feats)
    return bool(np.isfinite(scale)) and scale < threshold


def calibrate_frozen_stats(model, variables, images, passes: int = 12,
                           eps: float = 1e-5, max_step: float = 100.0,
                           damping: float = 1.0):
    """Return ``variables`` with every feature-extractor FrozenBN's
    (mean, var) set to its observed input statistics on ``images``.

    The BN output with current stats (m, v) and affine (w, b) relates to
    its input by ``x = (o - b) * sqrt(v + eps) / w + m``, so the input
    statistics are recovered from the captured output statistics and the
    update composes across passes.  A fully-vanished trunk can need total
    variance corrections of ~1e8, so each pass clamps the correction
    factor to ``[1/max_step, max_step]`` (LSUV-style gentle iteration) —
    unclamped single-shot rescaling overflows the very layers it is
    fixing.  Non-finite captures are skipped; a few passes settle the
    sequential dependence between layers.  The per-pass clamp doubles as
    the stabiliser for the simultaneous updates (measured: full
    corrections with max_step=100 settle the taps to ~1x mean activation
    and train stably at the default SGD lr, while damping < 1 LANDS SHORT
    and leaves 5-50x features that NaN without gradient clipping); a few
    dead/SE-gated channels never settle, so a final clamp bounds every
    calibrated stat.
    """
    variables = jax.device_get(variables)
    variables = jax.tree.map(np.asarray, variables)
    frozen = variables.get("frozen")
    if not frozen:
        return variables  # BN-free backbone (SSD-VGG16)
    images = jnp.asarray(images)
    capture = _make_bn_capture(model, images)

    for _ in range(passes):
        stats = capture(variables)
        converged = True
        for path, (mean_o, var_o) in stats.items():
            node = frozen
            ok = True
            for k in path:
                if not isinstance(node, dict) or k not in node:
                    ok = False
                    break
                node = node[k]
            if not ok or "mean" not in node or "var" not in node:
                continue
            mean_o = np.asarray(mean_o, np.float64)
            var_o = np.asarray(var_o, np.float64)
            if not (np.isfinite(mean_o).all() and np.isfinite(var_o).all()):
                continue
            w = np.asarray(node.get("weight", 1.0), np.float64)
            b = np.asarray(node.get("bias", 0.0), np.float64)
            v = np.asarray(node["var"], np.float64)
            std = np.sqrt(v + eps)
            safe_w = np.where(np.abs(w) > 1e-12, w, 1.0)
            # Damped variance correction factor (clamped per pass).
            c = np.clip(var_o / safe_w ** 2, 1.0 / max_step,
                        max_step) ** damping
            shift = damping * np.clip((mean_o - b) / safe_w,
                                      -max_step, max_step)
            node["mean"] = (np.asarray(node["mean"], np.float64)
                            + shift * std).astype(np.float32)
            node["var"] = np.maximum((v + eps) * c - eps,
                                     1e-10).astype(np.float32)
            if np.abs(np.log(np.maximum(c, 1e-12))).max() > 0.5 \
                    or np.abs(shift).max() > 0.5:
                converged = False
        if converged:
            break
    # Dead channels (zero input variance) never settle: bound everything.
    def clamp(node):
        for k, v in node.items():
            if isinstance(v, dict):
                clamp(v)
        if "mean" in node and "var" in node:
            node["mean"] = np.clip(node["mean"], -1e3, 1e3)
            node["var"] = np.clip(node["var"], 1e-4, 1e4)
    clamp(frozen)
    return variables
