"""Pure-python gates for bench.py's estimator helpers — the contract
number (median of per-pair ratios) must be computed exactly."""

from __future__ import annotations

import bench


def test_median_odd_even():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 2.0, 3.0]) == 2.5
    assert bench._median([5.0]) == 5.0


def test_median_robust_to_one_noisy_pair():
    # one pair catching a host spike in either direction must not move
    # the shipped number
    clean = [0.85, 0.86, 0.84]
    assert abs(bench._median(clean) - 0.85) < 1e-9
    assert abs(bench._median([0.85, 0.86, 0.30]) - 0.85) < 1e-9
    assert abs(bench._median([0.85, 0.86, 1.90]) - 0.86) < 1e-9


def test_host_control_tasks_return_positive_walls():
    assert bench._membw_task(0) > 0
    assert bench._cpu_task(0) > 0


def test_hi_leg_iters_matches_lo_window(monkeypatch):
    monkeypatch.delenv("BENCH_LEG_MATCH", raising=False)
    # warmup 360s lo / 127s hi -> 3 passes (>= lo window)
    assert bench._hi_leg_iters(360.0, 127.0) == 3
    # perfect scaling (4x) -> exactly 4 passes, the cap
    assert bench._hi_leg_iters(400.0, 100.0) == 4
    assert bench._hi_leg_iters(800.0, 100.0) == 4  # capped
    assert bench._hi_leg_iters(100.0, 100.0) == 1
    # opt-out restores single-run legs
    monkeypatch.setenv("BENCH_LEG_MATCH", "0")
    assert bench._hi_leg_iters(360.0, 127.0) == 1


def test_scale_master_shapes(monkeypatch):
    # executor mode (default): real separate executor JVMs, 1 core each,
    # constant per-executor worker memory across levels
    monkeypatch.setattr(bench, "EXEC_MODE", True)
    monkeypatch.setattr(bench, "EXEC_WORKER_MEM_MB", 7168)
    assert bench._scale_master(1) == "local-cluster[1,1,7168]"
    assert bench._scale_master(4) == "local-cluster[4,1,7168]"
    # thread mode: None -> the child keeps its local[N] default
    monkeypatch.setattr(bench, "EXEC_MODE", False)
    assert bench._scale_master(1) is None


def test_warm_passes_equal_per_executor_work(monkeypatch):
    # executor mode: the hi leg discards 4N/N full passes so each of its
    # separate executor JVMs JITs the same row volume as the lo leg's
    # single executor gets from one pass (value-blind, core-ratio-fixed)
    monkeypatch.setattr(bench, "EXEC_MODE", True)
    assert bench._warm_passes(1, 4) == (1, 4)
    assert bench._warm_passes(2, 8) == (1, 4)
    # thread mode keeps the r4 single-discard protocol
    monkeypatch.setattr(bench, "EXEC_MODE", False)
    assert bench._warm_passes(1, 4) == (1, 1)


def test_child_snippet_formats_for_both_modes():
    # the snippet must stay format-clean for master=None and a
    # local-cluster master (a KeyError/quoting bug here would only
    # surface 10 minutes into a campaign)
    for master in (None, "local-cluster[4,1,7168]"):
        code = bench._CHILD_SNIPPET.format(
            repo="/r", cores=4, path="/p", master=master, exec_mem="6g",
            extra_json='{"spark.io.compression.codec": "zstd"}',
        )
        compile(code, "<bench-child>", "exec")
        assert ('os.environ["SPARK_MASTER"]' in code)
        assert ("local-cluster" in code) == (master is not None)


def test_sandwich_split_centers_and_alternates():
    # even k: exact half on each side, every pair
    assert bench._sandwich_split(4, 0) == (2, 2)
    assert bench._sandwich_split(4, 1) == (2, 2)
    # odd k: the extra iteration alternates sides across pairs so no
    # side is systematically favored under monotone drift
    assert bench._sandwich_split(3, 0) == (1, 2)
    assert bench._sandwich_split(3, 1) == (2, 1)
    assert bench._sandwich_split(3, 2) == (1, 2)
    # k=1 degenerates to the classic lo,hi interleave (never pre-only
    # forever: alternates which side the single run lands on)
    assert bench._sandwich_split(1, 0) == (0, 1)
    assert bench._sandwich_split(1, 1) == (1, 0)
    # every split conserves the iteration count
    for k in range(1, 5):
        for i in range(4):
            pre, post = bench._sandwich_split(k, i)
            assert pre + post == k and pre >= 0 and post >= 0
