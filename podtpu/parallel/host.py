"""Host-side cross-process collectives.

TPU-native equivalent of the reference's pickled-object gather
(`miso/object_detection/engine/utils.py:70-83` ``all_gather`` over
``torch.distributed``), used to merge COCO evaluator state across ranks
(`engine/coco_eval.py:161-190`): objects are pickled, padded to a common
length, and gathered with ``multihost_utils.process_allgather`` (which rides
the same ICI/DCN fabric XLA collectives use).
"""
from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

import jax


def allgather_pickled(obj: Any) -> List[Any]:
    """Gather one picklable object from every process; returns the list
    indexed by process, on every process.  Single-process: ``[obj]``."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mh

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(mh.process_allgather(
        np.asarray([len(data)], np.int64))).reshape(-1)
    max_len = int(sizes.max())
    buf = np.zeros((max_len,), np.uint8)
    buf[: len(data)] = data
    bufs = np.asarray(mh.process_allgather(buf))
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(bufs[i, : int(sizes[i])].tobytes()))
    return out
