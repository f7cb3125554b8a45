"""Spatial partitioning: one huge canvas sharded across the mesh.

The reference has no model-parallel axis at all (SURVEY.md §2.3: DP only,
via DDP) and handles big micrographs by whole-image resize.  podtpu already
adds tiled scan inference; this module adds the orthogonal TPU-native axis:
shard a SINGLE canvas's height across devices and let XLA GSPMD partition
the backbone/FPN convs (it inserts the halo exchanges for 3x3/7x7 windows
automatically, riding ICI).  That lets one tile be larger than a single
chip's activation memory — e.g. a 4096² scan window on a v5e-8 — without
changing any model code.

Detection heads (top-k, NMS, RoIAlign) operate on global, dynamic-ish
structures and the Pallas kernels are opaque to the partitioner; XLA
resolves them by gathering — fine, because at giant canvases ~all FLOPs
and activation bytes are in the spatially-sharded backbone+FPN.

Usage:
    mesh = spatial_mesh(jax.devices())
    step = make_spatial_eval_step(model, mesh)
    det = step(params, frozen, images)   # images [B, H, W, 3], H % n == 0
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from podtpu.models.detector import FasterRCNN


def spatial_mesh(devices: Optional[Sequence] = None,
                 axis_name: str = "sp") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def make_spatial_eval_step(model: FasterRCNN, mesh: Mesh,
                           axis_name: str = "sp",
                           shard_rois: bool = True):
    """Inference step with the input canvas sharded over its HEIGHT.

    Weights are replicated; the image batch is sharded ``[B, H/n, W, 3]``
    per device.  GSPMD propagates the spatial sharding through the conv
    stack (halo exchange on ICI) and gathers where the detection heads need
    global views.  Outputs are replicated ``Detections``.

    ``shard_rois``: additionally shard the PROPOSAL axis over the mesh so
    the RoI stage (RoIAlign + box head) partitions over boxes instead of
    replicating on every device — the round-5 decomposition measured the
    replicated RoI stage as ~all of the spatial overhead (per-device work
    18.49% -> 12.75% of the single-device program with this on, vs the
    12.5% 8-way ideal; conv stack and RPN partition at 12.7/12.6% either
    way — docs/runs/r05/spatial_decompose.log).  Uses the XLA RoIAlign
    (the Pallas kernel is opaque to the partitioner and would force a
    gather back to replicated).

    The canvas height must be divisible by the mesh size times the coarsest
    stride (e.g. 64 per device for the P6 level) so every level's rows
    split evenly.
    """
    img_sharding = NamedSharding(mesh, P(None, axis_name))
    repl = NamedSharding(mesh, P())
    n = int(np.prod(mesh.devices.shape))
    if shard_rois and model.cfg.use_pallas_roi_align:
        import dataclasses
        model = FasterRCNN(cfg=dataclasses.replace(
            model.cfg, use_pallas_roi_align=False))

    def constrain_feature(x):
        # Pin every FPN tap to a consistent explicit sharding: height-split
        # while the rows still divide the mesh, replicated at the coarse
        # levels (whose maps are tiny).  Without this GSPMD invents
        # conflicting specs for the lateral/post adds and falls back to
        # "involuntary full rematerialization" (full-tensor replication).
        h = x.shape[1]
        spec = P(None, axis_name) if (h >= n and h % n == 0) else P()
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def constrain_proposals(x):
        # Boxes axis (dim 1 of [B, P, ...]) sharded over the mesh.
        spec = [None] * x.ndim
        spec[1] = axis_name
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    def fn(params, frozen, images):
        from podtpu.models.detector import set_proposal_constraint
        from podtpu.models.fpn import set_feature_constraint

        images = jax.lax.with_sharding_constraint(images, img_sharding)
        prev = set_feature_constraint(constrain_feature)
        prev_p = set_proposal_constraint(
            constrain_proposals if shard_rois else None)
        try:
            # uint8 -> float happens inside the model's _features.
            return model.apply({"params": params, "frozen": frozen},
                               images, train=False)
        finally:
            set_feature_constraint(prev)
            set_proposal_constraint(prev_p)

    return jax.jit(fn,
                   in_shardings=(repl, repl, img_sharding),
                   out_shardings=repl)
