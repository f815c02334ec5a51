"""Knee-finding unit tests (ops/knee.py vs knee_finding.rs semantics)."""

import numpy as np
import pytest

from alevin_fry_tpu.ops.knee import get_knee, _max_distance_index


def test_max_distance_simple():
    # a sharp elbow: large values then tiny tail
    freq = np.array([1000, 990, 980, 970, 5, 4, 3, 2, 1, 1], np.uint64)
    cfreq = np.cumsum(freq)
    idx = _max_distance_index(cfreq)
    assert idx == 3  # the last big cell is farthest from the chord


def test_get_knee_sharp_elbow():
    big = np.full(50, 1000, np.uint64)
    small = np.full(500, 2, np.uint64)
    freq = np.concatenate([big, small])
    knee = get_knee(freq, 100)
    assert 45 <= knee <= 55


def test_get_knee_requires_two_points():
    with pytest.raises(ValueError):
        get_knee(np.array([5], np.uint64), 100)


def test_get_knee_monotone_input():
    # smooth power-law: should converge without assertion failures
    freq = (1000 / np.arange(1, 300) ** 1.5).astype(np.uint64) + 1
    knee = get_knee(freq, 100)
    assert 0 < knee < len(freq)
