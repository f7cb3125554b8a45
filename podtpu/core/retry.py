"""Transient-failure retry for device dispatch.

Tunneled/relayed TPU backends (and real pod compile services) surface
transient INTERNAL/UNAVAILABLE errors — a dropped HTTP body mid
``remote_compile``, a reset stream — as ``JaxRuntimeError`` at the first
call of a jitted program.  Killing an hours-long training run over one
dropped response is unacceptable in production (the reference's failure
story is torch DDP's process-group restart; podtpu's step-level retry is
the single-controller analog).  Only errors matching known-transient
markers are retried; everything else (OOM, compile errors, NaN guards)
propagates immediately.
"""
import time

_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "connection reset",
    "unavailable",
    "deadline exceeded",
    "socket closed",
    "broken pipe",
)


def is_transient(err: Exception) -> bool:
    msg = str(err).lower()
    if not msg.startswith(("internal:", "unavailable:")) \
            and "internal:" not in msg and "unavailable:" not in msg:
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def with_transient_retry(fn, *args, retries: int = 3, backoff_s: float = 5.0,
                         label: str = "step", **kwargs):
    """Call ``fn(*args, **kwargs)``, retrying known-transient JAX runtime
    errors with linear backoff.  Safe for jit dispatch: a failed dispatch
    mutates no state, so the retry re-issues an identical program."""
    from jax.errors import JaxRuntimeError

    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except JaxRuntimeError as err:  # noqa: PERF203 — rare path
            if attempt >= retries or not is_transient(err):
                raise
            attempt += 1
            print(f"[retry] transient backend error during {label} "
                  f"(attempt {attempt}/{retries}): "
                  f"{str(err).splitlines()[0][:200]}")
            time.sleep(backoff_s * attempt)
