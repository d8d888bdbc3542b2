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
