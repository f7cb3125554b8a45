"""Subprocess worker: ShardedWindowedStreamLoader on a MULTI-PROCESS mesh.

Each of N processes owns 4 virtual CPU devices of one global 1-D "data"
mesh (Gloo collectives — the topology of `jax.distributed.initialize`,
the reference's torchrun+NCCL analog,
`miso/object_detection/engine/utils.py:260-283`).  The loader must:

* decode ONLY the window rows homed on this process's devices (the
  per-host decode contract);
* assemble the global window with
  ``jax.make_array_from_process_local_data`` so each device's shard
  carries exactly the samples the shared window plan homes there;
* produce arrays consumable by a jitted computation spanning processes.

Verified by reading back the ``index`` field's addressable shards (each
row stores its dataset index) against the deterministic window plan, and
by a cross-process jitted reduction over the image field.

Usage: python -m tests.mp_stream_worker <proc_id> <nprocs> <port>
Prints one JSON line: {"proc": id, "windows": n, "sums": [...]}.
"""
import json
import sys
import tempfile


def main():
    proc_id, nprocs, port = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from podtpu.data.dataset import DetectionDataset
    from podtpu.data.device_cache import ShardedWindowedStreamLoader
    from podtpu.parallel.dp import make_mesh
    from podtpu.parallel.host import allgather_pickled
    from tests.synthetic import make_project

    # Each process renders its OWN copy of the (seed-deterministic)
    # synthetic dataset: identical content, private paths — no shared
    # filesystem needed, no concurrent-write races.
    root = tempfile.mkdtemp(prefix=f"podtpu_mpstream_{proc_id}_")
    project = make_project(root, num_images=11, image_size=(64, 64),
                           max_boxes=3, seed=3)
    dataset = DetectionDataset(project, image_size=(64, 64), max_gt=4)

    mesh = make_mesh()
    n_devices = int(mesh.devices.size)
    sharding = NamedSharding(mesh, P("data"))
    per_sample = 64 * 64 * 3 + 4 * (4 * 4 + 4 + 1) + 16
    loader = ShardedWindowedStreamLoader(
        dataset, batch_size=n_devices, num_shards=n_devices,
        sharding=sharding, shuffle=True, seed=5,
        # 1 sample per device buffer -> window == n_devices, several
        # windows per epoch (exercises restaging).
        budget_bytes=2 * per_sample)
    assert loader.block == 1 and loader.window == n_devices

    chunks = loader.window_chunks()
    assert len(chunks) >= 2, "want multiple windows"

    @jax.jit
    def consume(image):
        # Cross-process reduction: every process must see the same sum.
        return jnp.sum(image.astype(jnp.float32))

    sums = []
    windows = 0
    it = iter(loader)
    for ci, chunk in enumerate(chunks):
        # Drain this window's batches (advancing the iterator swaps
        # loader.arrays to the staged window first).
        steps = max(1, -(-min(loader.block, len(chunk)) // loader.per_device))
        for _ in range(steps):
            idx, valid = next(it)
        arrays = loader.arrays
        padded = np.concatenate(
            [chunk, np.repeat(chunk[:1], loader.window - len(chunk))])
        # Placement check: each ADDRESSABLE shard of the `index` field
        # must hold exactly the plan's rows for that device.
        checked = 0
        for shard in arrays["index"].addressable_shards:
            lo = shard.index[0].start or 0
            got = np.asarray(shard.data).ravel()
            want = padded[lo:lo + got.shape[0]]
            assert (got == want).all(), (proc_id, ci, lo, got, want)
            checked += 1
        assert checked == n_devices // nprocs, checked
        sums.append(float(np.asarray(jax.device_get(
            consume(arrays["image"])))))
        windows += 1
    # Iterator must be exhausted exactly at the plan's end.
    assert next(it, None) is None

    all_sums = allgather_pickled(sums)
    for other in all_sums:
        assert np.allclose(other, sums), (sums, all_sums)
    print(json.dumps({"proc": proc_id, "windows": windows, "sums": sums}),
          flush=True)


if __name__ == "__main__":
    main()
