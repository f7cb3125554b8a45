"""Subprocess worker for the simulated multi-host DP test.

Runs the PRODUCT DP train step (`podtpu.parallel.dp.make_dp_train_step`)
on a global mesh spanning multiple OS processes — the true multi-host
(DCN) topology of `jax.distributed.initialize`, which the reference
reaches with torchrun + NCCL init_process_group
(`miso/object_detection/engine/utils.py:260-283`).  Each process owns
4 virtual CPU devices; cross-process collectives ride Gloo.

Usage: python -m tests.mp_worker <proc_id> <num_processes> <port> <steps>
Prints one JSON line: {"proc": id, "losses": [...]}.

The parent sets XLA_FLAGS=--xla_force_host_platform_device_count=<n>.
"""
import json
import sys


def main():
    proc_id, nprocs, port, steps = (int(sys.argv[1]), int(sys.argv[2]),
                                    sys.argv[3], int(sys.argv[4]))
    import jax
    # Must beat the axon sitecustomize's platform override AND run before
    # distributed init / any backend touch (tests/conftest.py:14-24 recipe).
    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from podtpu.models.detector import FasterRCNN
    from podtpu.parallel.dp import make_dp_train_step, make_mesh
    from podtpu.parallel.host import allgather_pickled
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state
    from tests.test_parallel import make_batch, micro_cfg

    cfg = micro_cfg()
    model = FasterRCNN(cfg=cfg.model)
    init_vars = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    tx = make_optimizer(cfg.train, cfg.model)
    mesh = make_mesh()  # ALL global devices, across processes
    n_devices = int(mesh.devices.size)
    assert n_devices == jax.device_count() and n_devices % nprocs == 0
    step_fn, _ = make_dp_train_step(model, tx, cfg, mesh)
    state = create_train_state(init_vars, tx)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    def to_global_replicated(tree):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                replicated, np.asarray(x)), tree)

    state = to_global_replicated(state)
    # Every process builds the same GLOBAL batch, then contributes its
    # process-local slice of the data axis.
    global_batch = make_batch(batch=n_devices, seed=123)
    per_proc = n_devices // nprocs
    lo = proc_id * per_proc
    batch = {
        k: jax.make_array_from_process_local_data(
            sharded, v[lo:lo + per_proc], global_shape=v.shape)
        for k, v in global_batch.items()
    }
    rng = jax.random.wrap_key_data(
        jax.make_array_from_process_local_data(
            replicated, np.asarray(jax.random.key_data(jax.random.key(7)))))

    losses = []
    for i in range(steps):
        # Small lr: keeps the micro-model trajectory stable so tiny
        # cross-process reduction-order differences aren't chaotically
        # amplified step over step.
        state, metrics = step_fn(state, batch, rng, 0.001)
        losses.append(float(np.asarray(
            jax.device_get(metrics["loss"]))))
    # Cross-process sanity: every process must observe the same loss.
    all_losses = allgather_pickled(losses)
    for other in all_losses:
        assert np.allclose(other, losses, rtol=1e-5), (losses, all_losses)
    print(json.dumps({"proc": proc_id, "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
