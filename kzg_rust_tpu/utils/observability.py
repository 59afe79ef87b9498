"""Structured logging + device-trace hooks.

The reference has no logging or tracing anywhere (SURVEY.md §5 — errors
carry context strings, nothing else).  This module adds the two
observability facilities the TPU build needs while keeping the library
silent by default:

* a package logger (``kzg_rust_tpu``) with a ``NullHandler`` — nothing is
  emitted unless the host application configures logging, matching the
  reference's "silent library" behavior;
* ``timed(event, **fields)`` — a context manager that logs one structured
  line (event name, wall time, caller-supplied fields) at DEBUG when the
  block exits.  Used around trusted-setup loading and by the benchmark
  CLIs;
* ``device_trace()`` — wraps ``jax.profiler.trace`` when the environment
  variable ``KZG_TPU_TRACE_DIR`` names a directory, else a no-op.  Lets any
  run (tests, benches, production callers) capture an XLA/TPU profile
  without code changes: ``KZG_TPU_TRACE_DIR=/tmp/trace python bench.py``
  then inspect with TensorBoard or ``jax.profiler`` tooling.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("kzg_rust_tpu")
logger.addHandler(logging.NullHandler())


@contextlib.contextmanager
def timed(event: str, **fields):
    """Log one structured ``event key=value ... wall_ms=N`` line at DEBUG."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        wall_ms = (time.perf_counter() - t0) * 1e3
        if logger.isEnabledFor(logging.DEBUG):
            kv = " ".join(f"{k}={v}" for k, v in fields.items())
            logger.debug("%s %s wall_ms=%.2f", event, kv, wall_ms)


@contextlib.contextmanager
def device_trace():
    """Capture a JAX profiler trace if ``KZG_TPU_TRACE_DIR`` is set.

    The trace covers every XLA dispatch inside the block (kernel names,
    durations, HBM transfers) and is viewable in TensorBoard's profile
    plugin.  No-op (zero overhead) when the variable is unset or jax is
    unavailable.
    """
    trace_dir = os.environ.get("KZG_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    try:
        import jax
    except Exception:  # pragma: no cover - jax is baked into this image
        yield
        return
    logger.info("device_trace start dir=%s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
    logger.info("device_trace done dir=%s", trace_dir)


def compile_cache_dir() -> str:
    """The persistent-compile-cache directory: ``KZG_TPU_COMPILE_CACHE`` if
    set (lets tools and tests point at a fresh directory to exercise the
    cold-cache path deliberately), else ``~/.cache/jax_kzg``."""
    return os.path.expanduser(
        os.environ.get("KZG_TPU_COMPILE_CACHE", "~/.cache/jax_kzg")
    )


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache at the shared directory.

    The limb-tensor graphs are compile-heavy (minutes each on XLA-CPU,
    seconds on TPU); persisting every executable (no size or compile-time
    floor) makes repeat runs — tests, benches, probes, the driver's
    compile checks — skip XLA entirely.  One helper so the cache location
    and thresholds live in exactly one place (bench.py, tools/, and
    __graft_entry__ all call this)."""
    import jax

    if cache_dir is None:
        cache_dir = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
