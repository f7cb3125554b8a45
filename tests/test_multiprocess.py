"""Simulated multi-host data parallelism: the product DP train step on a
global mesh spanning TWO OS processes (4 virtual CPU devices each, Gloo
collectives) must match the single-process 8-device run exactly.

This is the DCN half of the reference's distributed story — torchrun
spawning N ranks + NCCL init_process_group
(`miso/object_detection/engine/utils.py:260-283`, `engine/train.py:169`)
— whereas tests/test_parallel.py covers the single-process (ICI) half.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int, local_devices: int, port: int, steps: int = 3,
                 timeout: int = 600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.mp_worker", str(i), str(nprocs),
             str(port), str(steps)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith('{"proc"')][-1]
        rec = json.loads(line)
        results[rec["proc"]] = rec["losses"]
    return results


def _run_stream_workers(nprocs: int, local_devices: int, port: int,
                        timeout: int = 600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.mp_stream_worker", str(i),
             str(nprocs), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith('{"proc"')][-1]
        rec = json.loads(line)
        results[rec["proc"]] = rec
    return results


@pytest.mark.slow
def test_two_process_sharded_windowed_stream():
    """The >HBM DP streaming tier on a mesh spanning two OS processes:
    per-host decode + make_array_from_process_local_data assembly place
    exactly the planned samples on each device (advisor r4: the
    multi-host upload path previously had no multi-process test)."""
    res = _run_stream_workers(nprocs=2, local_devices=4, port=_free_port())
    assert set(res) == {0, 1}
    assert res[0]["windows"] == res[1]["windows"] >= 2
    # The jitted cross-process reduction agreed on every window (also
    # asserted inside each worker via allgather).
    assert np.allclose(res[0]["sums"], res[1]["sums"])


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    two = _run_workers(nprocs=2, local_devices=4, port=_free_port())
    assert set(two) == {0, 1}
    # Both ranks observe identical (pmean-replicated) losses.
    assert np.allclose(two[0], two[1], rtol=1e-5)

    one = _run_workers(nprocs=1, local_devices=8, port=_free_port())
    # First step runs on identical params: forward + grad pmean must agree
    # to float32 noise whether the 8 devices live in one process or two.
    assert np.isclose(one[0][0], two[0][0], rtol=1e-5), (one, two)
    # Later steps accumulate reduction-order ulps (Gloo allreduce sums in
    # a different order than the in-process reduce), so the trajectory
    # comparison is loose — but it must stay the SAME trajectory.
    assert np.allclose(one[0], two[0], rtol=1e-3), (one, two)
    # And it is actually training (loss finite, changing).
    assert np.all(np.isfinite(two[0]))
    assert abs(two[0][0] - two[0][-1]) > 0
