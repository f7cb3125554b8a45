"""Packed RPN head: the coarse-level packing (one tall canvas with 1-row
zero gaps, models/rpn.py::RPNHead._packed_apply) must reproduce the
per-level convs exactly — it is an MXU-tiling optimisation, not an
approximation (reference semantics: torchvision's shared RPNHead applied
per FPN level inside `miso/object_detection/models.py:8`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.models.rpn import RPNHead


@pytest.mark.parametrize("depth", [1, 2])
def test_packed_levels_match_per_level(depth):
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (2, h, h, 32)), jnp.float32)
             for h in (64, 32, 16, 8, 4)]
    ref = RPNHead(num_anchors=3, channels=32, conv_depth=depth,
                  dtype=jnp.float32)
    packed = RPNHead(num_anchors=3, channels=32, conv_depth=depth,
                     dtype=jnp.float32, pack_levels=True)
    vs = ref.init(jax.random.key(1), feats)
    lo1, de1 = ref.apply(vs, feats)
    lo2, de2 = packed.apply(vs, feats)
    for a, b in zip(lo1 + de1, lo2 + de2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_packed_gate_needs_three_levels():
    """With <3 levels the pack is pure overhead; the head falls back to
    per-level application (same outputs either way)."""
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(rng.normal(0, 1, (1, h, h, 16)), jnp.float32)
             for h in (16, 8)]
    head = RPNHead(num_anchors=3, channels=16, dtype=jnp.float32,
                   pack_levels=True)
    ref = RPNHead(num_anchors=3, channels=16, dtype=jnp.float32)
    vs = ref.init(jax.random.key(0), feats)
    lo1, de1 = ref.apply(vs, feats)
    lo2, de2 = head.apply(vs, feats)
    for a, b in zip(lo1 + de1, lo2 + de2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
