"""Structured logging + trace hooks (SURVEY.md §5: the reference has none;
the TPU build adds a silent-by-default package logger and an opt-in JAX
profiler trace)."""

import logging
import os

from kzg_rust_tpu.utils.observability import device_trace, logger, timed


def test_library_logger_is_silent_by_default():
    # A NullHandler must be attached so an unconfigured host app sees no
    # "No handlers could be found" noise and no output.
    assert any(isinstance(h, logging.NullHandler) for h in logger.handlers)


def test_timed_emits_structured_debug_line(caplog):
    with caplog.at_level(logging.DEBUG, logger="kzg_rust_tpu"):
        with timed("unit.event", n=3):
            pass
    msgs = [r.getMessage() for r in caplog.records]
    assert any("unit.event" in m and "n=3" in m and "wall_ms=" in m for m in msgs)


def test_device_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("KZG_TPU_TRACE_DIR", raising=False)
    with device_trace():  # must not require jax or touch the filesystem
        x = 1 + 1
    assert x == 2


def test_device_trace_writes_profile(tmp_path, monkeypatch):
    monkeypatch.setenv("KZG_TPU_TRACE_DIR", str(tmp_path))
    import jax.numpy as jnp

    with device_trace():
        jnp.zeros(4).sum().block_until_ready()
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert files, "profiler trace produced no files"


def test_bench_salvages_last_json_line():
    """bench.py's deadline-salvage: the device probe emits cumulative JSON
    per batch size, and the parent recovers the last complete line from
    partial (killed-child) output instead of dropping the round's device
    evidence."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("bench_mod", root / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    text = (
        'WARNING: noise\n'
        '{"device": "TPU", "device_e2e_ms": 330.0}\n'
        '{"device": "TPU", "device_e2e_ms": 330.0, "device_n512_e2e_ms": 2100.0}\n'
        '{"device": "TPU", "device_e2e_ms": 330.0, "device_n512_e2e_ms": 2100'
    )  # last line truncated by the kill
    got = bench._last_json_line(text)
    assert got == {"device": "TPU", "device_e2e_ms": 330.0, "device_n512_e2e_ms": 2100.0}
    assert bench._last_json_line("no json here\n") is None
