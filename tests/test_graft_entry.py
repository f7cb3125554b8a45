"""Regression tests for the driver entry points (`__graft_entry__.py`).

Round 1 shipped a `dryrun_multichip` that asserted on device count when the
calling process had already initialized JAX on the real single-chip backend
(VERDICT.md Missing #1).  The fix re-execs into a subprocess with
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=<n>`` set
before JAX init; these tests invoke it exactly the way the driver does —
from a process whose JAX is already up on some backend.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_from_initialized_process():
    """Simulate the driver: import jax (initializes a backend), then call
    dryrun_multichip(8).  Must succeed regardless of the outer platform."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n" % REPO)
    env = dict(os.environ)
    # Make the outer process single-device CPU so the inner re-exec is what
    # provides the 8 virtual devices (mirrors the real-TPU driver process).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): OK" in proc.stdout
