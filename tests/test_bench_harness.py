"""Unit coverage for bench.py's harness pieces (no accelerator).

The bench is a driver artifact: its variance control (repeat_timed) and
transient-failure retry (_main_with_retries) decide what number a round
reports, so they get direct tests.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_repeat_timed_rejects_slow_outliers(monkeypatch):
    times = iter([0.0, 10.0, 10.0, 20.0, 20.0, 31.0])  # runs: 10s, 10s, 11s
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
    accepted, all_times = bench.repeat_timed(lambda: None, 3)
    assert all_times == [10.0, 10.0, 11.0]
    # 11 <= 1.25 * 10 so all kept; median of [10, 10, 11] = 10.
    assert accepted == 10.0


def test_repeat_timed_median_excludes_past_threshold(monkeypatch):
    times = iter([0.0, 10.0, 10.0, 24.0, 24.0, 34.5])  # runs: 10s, 14s, 10.5s
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
    accepted, all_times = bench.repeat_timed(lambda: None, 3)
    assert all_times == [10.0, 14.0, 10.5]
    # 14 > 1.25 * 10 rejected; median of [10, 10.5] (upper) = 10.5.
    assert accepted == 10.5


def test_retry_wrapper_retries_transient_then_succeeds(monkeypatch):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("UNAVAILABLE: socket closed")
        return None

    monkeypatch.setattr(bench, "main", flaky)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._main_with_retries() == 0
    assert len(calls) == 2


def test_retry_wrapper_raises_non_transient_immediately(monkeypatch):
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("bad BENCH_BATCH value")

    monkeypatch.setattr(bench, "main", broken)
    with pytest.raises(ValueError):
        bench._main_with_retries()
    assert len(calls) == 1


def test_sample_image_sizes_mixed_and_uniform():
    import numpy as np

    rng = np.random.RandomState(0)
    mixed = bench.sample_image_sizes("mixed", 400, rng)
    assert len(mixed) == 400
    # A realistic distribution: many distinct sizes, both orientations present.
    assert len(set(mixed)) >= 10
    assert any(h > w for h, w in mixed) and any(w > h for h, w in mixed)
    # Deterministic under a fixed seed (bench warmup/timed sets must agree).
    again = bench.sample_image_sizes("mixed", 400, np.random.RandomState(0))
    assert again == mixed
    assert bench.sample_image_sizes("448", 2, rng) == [(448, 448), (448, 448)]


def test_retry_wrapper_exhausts_and_reraises(monkeypatch):
    calls = []

    def always_down():
        calls.append(1)
        raise RuntimeError("DEADLINE_EXCEEDED waiting for tunnel")

    monkeypatch.setattr(bench, "main", always_down)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_RETRIES", "2")
    with pytest.raises(RuntimeError):
        bench._main_with_retries()
    assert len(calls) == 3
