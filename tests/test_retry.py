"""Transient-backend retry (podtpu/core/retry.py): step dispatch survives
the relay/compile-service failures that killed long runs (round-3 failure
observed live: ``INTERNAL: .../remote_compile: read body: response body
closed before all bytes were read`` at the first train-step compile)."""
import pytest

from jax.errors import JaxRuntimeError

from podtpu.core.retry import (is_transient, transient_class,
                               with_transient_retry)


class TestIsTransient:
    def test_remote_compile_body_closed(self):
        err = JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: read body: "
            "response body closed before all bytes were read")
        assert is_transient(err)

    def test_unavailable_connection_reset(self):
        assert is_transient(JaxRuntimeError(
            "UNAVAILABLE: connection reset by peer"))

    def test_oom_not_transient(self):
        assert not is_transient(JaxRuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 16G"))

    def test_compile_error_not_transient(self):
        assert not is_transient(JaxRuntimeError(
            "INTERNAL: Mosaic failed to compile TPU kernel"))


class TestWithTransientRetry:
    def test_retries_then_succeeds(self):
        calls = []

        def flaky(x):
            calls.append(x)
            if len(calls) < 3:
                raise JaxRuntimeError(
                    "INTERNAL: remote_compile: response body closed "
                    "before all bytes were read")
            return x * 2

        assert with_transient_retry(flaky, 21, backoff_s=0.0) == 42
        assert len(calls) == 3

    def test_gives_up_after_retries(self):
        def always(_):
            raise JaxRuntimeError("UNAVAILABLE: deadline exceeded")

        with pytest.raises(JaxRuntimeError):
            with_transient_retry(always, 1, retries=2, backoff_s=0.0)

    def test_non_transient_raises_immediately(self):
        calls = []

        def oom(_):
            calls.append(1)
            raise JaxRuntimeError("RESOURCE_EXHAUSTED: Out of memory")

        with pytest.raises(JaxRuntimeError):
            with_transient_retry(oom, 1, backoff_s=0.0)
        assert len(calls) == 1

    def test_other_exceptions_pass_through(self):
        def boom(_):
            raise ValueError("not a backend error")

        with pytest.raises(ValueError):
            with_transient_retry(boom, 1, backoff_s=0.0)


class TestAdviceR3Fixes:
    def test_bare_unavailable_not_transient(self):
        """A persistent UNAVAILABLE (wrong endpoint, auth failure) must
        propagate immediately — only concrete transport symptoms retry."""
        assert not is_transient(JaxRuntimeError(
            "UNAVAILABLE: no such host example.invalid:8093"))


class TestCautiousUnavailable:
    """Advisor r4: UNAVAILABLE errors with NEITHER a known-transient nor a
    known-persistent symptom (backend blip, preemption window) get ONE
    cautious retry instead of aborting a multi-hour run immediately."""

    def test_classification(self):
        assert transient_class(JaxRuntimeError(
            "UNAVAILABLE: connection reset by peer")) == "fast"
        assert transient_class(JaxRuntimeError(
            "UNAVAILABLE: failed to connect to all addresses")) == "cautious"
        # Known-persistent symptoms never retry.
        assert transient_class(JaxRuntimeError(
            "UNAVAILABLE: DNS name resolution failed")) == ""
        assert transient_class(JaxRuntimeError(
            "UNAVAILABLE: no such host example.invalid:8093")) == ""
        assert transient_class(JaxRuntimeError(
            "UNAVAILABLE: authentication handshake failed")) == ""
        # Bare INTERNAL (e.g. a kernel compile error) stays non-retryable.
        assert transient_class(JaxRuntimeError(
            "INTERNAL: Mosaic failed to compile TPU kernel")) == ""

    def test_single_cautious_retry_then_raises(self):
        calls = []

        def blip(_):
            calls.append(1)
            raise JaxRuntimeError(
                "UNAVAILABLE: failed to connect to all addresses")

        with pytest.raises(JaxRuntimeError):
            with_transient_retry(blip, 1, retries=5, backoff_s=0.0)
        assert len(calls) == 2  # one retry despite retries=5

    def test_cautious_retry_can_succeed(self):
        calls = []

        def blip(x):
            calls.append(1)
            if len(calls) < 2:
                raise JaxRuntimeError(
                    "UNAVAILABLE: failed to connect to all addresses")
            return x

        assert with_transient_retry(blip, 7, retries=5, backoff_s=0.0) == 7
        assert len(calls) == 2

    def test_persistent_unavailable_raises_immediately(self):
        calls = []

        def bad(_):
            calls.append(1)
            raise JaxRuntimeError("UNAVAILABLE: DNS name resolution failed")

        with pytest.raises(JaxRuntimeError):
            with_transient_retry(bad, 1, retries=5, backoff_s=0.0)
        assert len(calls) == 1

    def test_consumed_donated_input_not_retried(self):
        """If a transient error surfaces AFTER a donated input was
        consumed, the retry must NOT re-issue with deleted buffers — the
        original error propagates."""
        import jax
        import jax.numpy as jnp

        x = jnp.ones((4,))
        consume = jax.jit(lambda a: a + 1, donate_argnums=(0,))
        _ = consume(x)  # x's buffer is now donated/deleted
        assert x.is_deleted()

        calls = []

        def fn(arr):
            calls.append(1)
            raise JaxRuntimeError("UNAVAILABLE: connection reset by peer")

        with pytest.raises(JaxRuntimeError, match="connection reset"):
            with_transient_retry(fn, x, retries=3, backoff_s=0.0)
        assert len(calls) == 1  # no retry attempts

    def test_alive_inputs_still_retry(self):
        import jax.numpy as jnp

        x = jnp.ones((4,))
        calls = []

        def fn(arr):
            calls.append(1)
            if len(calls) < 2:
                raise JaxRuntimeError("UNAVAILABLE: connection reset by peer")
            return arr

        out = with_transient_retry(fn, x, retries=3, backoff_s=0.0)
        assert len(calls) == 2 and out is x
