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

# A bare "unavailable" is deliberately NOT a marker: UNAVAILABLE also
# covers persistent misconfiguration (wrong endpoint, auth failure) which
# must propagate immediately; only the concrete transport symptoms below
# mark an error as worth retrying.
_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "connection reset",
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


def _donated_args_alive(args, kwargs) -> bool:
    """True unless some jax.Array argument has already been invalidated.

    Train steps donate their input state (``donate_argnums=(0,)``); if a
    transient error surfaces AFTER dispatch consumed the donation, the
    buffers are gone and a blind retry would crash with a secondary
    "Array has been deleted" error.  Only retry when every array input
    (walked through pytrees) is still alive."""
    import jax

    for leaf in jax.tree_util.tree_leaves((args, kwargs)):
        if isinstance(leaf, jax.Array) and leaf.is_deleted():
            return False
    return True


def with_transient_retry(fn, *args, retries: int = 3, backoff_s: float = 5.0,
                         label: str = "step", **kwargs):
    """Call ``fn(*args, **kwargs)``, retrying known-transient JAX runtime
    errors with linear backoff.  A retry is only issued when the inputs
    are still alive: dispatch failures before execution leave donated
    buffers intact and are safely re-issuable, but an error surfaced after
    a donated input was consumed is NOT retried (the original error
    propagates rather than a confusing deleted-array crash)."""
    from jax.errors import JaxRuntimeError

    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except JaxRuntimeError as err:  # noqa: PERF203 — rare path
            if attempt >= retries or not is_transient(err) \
                    or not _donated_args_alive(args, kwargs):
                raise
            attempt += 1
            print(f"[retry] transient backend error during {label} "
                  f"(attempt {attempt}/{retries}): "
                  f"{str(err).splitlines()[0][:200]}")
            time.sleep(backoff_s * attempt)
