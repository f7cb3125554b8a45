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

# Concrete transport symptoms that mark an error as confidently
# transient (full retry budget).
_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "connection reset",
    "deadline exceeded",
    "socket closed",
    "broken pipe",
)

# UNAVAILABLE symptoms that are known-PERSISTENT (misconfiguration —
# auth, name resolution): never retried.  UNAVAILABLE errors matching
# NEITHER list (e.g. "failed to connect to all addresses" during a brief
# backend blip or preemption window) get a single cautious retry — a
# genuinely-dead endpoint still fails fast, but a multi-hour run isn't
# aborted by one unclassified blip (advisor r4).
_PERSISTENT_MARKERS = (
    "auth",
    "unauthenticated",
    "permission",
    "name resolution",
    "dns",
    "no such host",
    "not found",
    "unimplemented",
)


def transient_class(err: Exception) -> str:
    """Classify a backend error: "fast" (known-transient transport
    symptom, full retry budget), "cautious" (bare UNAVAILABLE with no
    known-persistent symptom, single retry), or "" (not retryable)."""
    msg = str(err).lower()
    internal = msg.startswith("internal:") or "internal:" in msg
    unavailable = msg.startswith("unavailable:") or "unavailable:" in msg
    if not internal and not unavailable:
        return ""
    if any(m in msg for m in _TRANSIENT_MARKERS):
        return "fast"
    if unavailable and not any(m in msg for m in _PERSISTENT_MARKERS):
        return "cautious"
    return ""


def is_transient(err: Exception) -> bool:
    return transient_class(err) == "fast"


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
            klass = transient_class(err)
            # Unclassified UNAVAILABLE: one cautious retry only.
            cap = retries if klass == "fast" else min(retries, 1)
            if attempt >= cap or not klass \
                    or not _donated_args_alive(args, kwargs):
                raise
            attempt += 1
            print(f"[retry] {klass}-transient backend error during {label} "
                  f"(attempt {attempt}/{cap}): "
                  f"{str(err).splitlines()[0][:200]}")
            time.sleep(backoff_s * attempt)
