"""Prefetching batch loader: threaded decode, fixed-shape batches.

TPU-native counterpart of the reference's ``torch.utils.data.DataLoader``
setup (`miso/object_detection/training.py:64-83`: 4 workers, custom collate,
the ``file_system`` sharing-strategy workaround).  Fork-based worker processes
and shared-memory tensors don't apply here; instead:

* a thread pool decodes+resizes (PIL/cv2 release the GIL for the heavy work),
* batches are assembled into fixed-shape numpy arrays,
* a bounded queue keeps ``prefetch`` batches ready so host IO overlaps device
  compute (double buffering).

Short/ragged epochs wrap around instead of emitting partial batches: every
batch has the SAME static shape (XLA recompiles on shape change).  A
``batch_valid`` mask marks wrapped duplicates so evaluation can skip them.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from podtpu.data.dataset import DetectionDataset, collate


def wrap_batch_indices(order: np.ndarray, batch_size: int, b: int):
    """Indices + validity for batch ``b`` of ``order`` with STATIC shapes:
    a short tail wraps around to the front of the epoch and the wrapped
    duplicates are masked False.  Shared by the streaming Loader and the
    device-resident DeviceLoader so their batch contract cannot diverge."""
    idx = order[b * batch_size: (b + 1) * batch_size]
    valid = np.ones(len(idx), bool)
    if len(idx) < batch_size:
        extra = order[: batch_size - len(idx)]
        if len(extra) < batch_size - len(idx):  # dataset smaller than batch
            extra = np.resize(order, batch_size - len(idx))
        idx = np.concatenate([idx, extra])
        valid = np.concatenate([valid, np.zeros(batch_size - len(valid),
                                                bool)])
    return idx, valid


class Loader:
    def __init__(
        self,
        dataset: DetectionDataset,
        batch_size: int,
        indices: Optional[np.ndarray] = None,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        place=None,
    ):
        """``place``: optional device or ``jax.sharding.Sharding``; when
        set, the producer thread ``jax.device_put``s each batch as it is
        assembled, so host→device transfer overlaps device compute instead
        of serialising in front of every step (double buffering; measured
        5x end-to-end on remote-TPU links).  Leave None for consumers that
        index batch fields on the host (evaluation)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(dataset)))
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.place = place
        self._epoch = 0

    def __len__(self) -> int:
        if len(self.indices) == 0:
            return 0
        return -(-len(self.indices) // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        order = self.indices.copy()
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[Tuple[dict, np.ndarray]]:
        order = self._epoch_order()
        n = len(order)
        if n == 0:
            return
        bs = self.batch_size
        num_batches = len(self)

        def batch_indices(b):
            return wrap_batch_indices(order, bs, b)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def finish(samples, bvalid):
            # Decode failures yield ok=False samples: fold them into the
            # batch mask so train (loss weight 0) and eval (skip) ignore
            # them, same as wrap-around duplicates.
            bvalid = bvalid & np.asarray([s.ok for s in samples], bool)
            batch = collate(samples)
            if self.place is not None:
                import jax
                batch = jax.device_put(batch, self.place)
            return batch, bvalid

        def producer():
            # The dataset's batch loader dispatches to the native C++
            # threaded decoder when available; the surrounding pool overlaps
            # successive batches.
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = []
                for b in range(num_batches):
                    idx, bvalid = batch_indices(b)
                    futures.append(
                        (pool.submit(self.dataset.load_batch, idx), bvalid))
                    # Bound the number of in-flight batch jobs.
                    while len(futures) > max(2, self.prefetch):
                        fut, bv = futures.pop(0)
                        out_q.put(finish(fut.result(), bv))
                        if stop.is_set():
                            out_q.put(None)
                            return
                for fut, bv in futures:
                    if stop.is_set():
                        break
                    out_q.put(finish(fut.result(), bv))
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.1)
