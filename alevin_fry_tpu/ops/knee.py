"""Vectorized knee-distance finding.

Re-implements the UMI-tools "distance" method exactly as the reference
does (src/knee_finding.rs): build the CDF of the reverse-sorted barcode
frequencies, find the point of maximum distance from the line through the
endpoints, then iterate on a shrinking window (last_idx = max_idx * 5)
until a fixpoint or ``max_iterations``.

The inner argmax is a single vectorized pass (the reference loops with a
``>=`` update, i.e. the *last* index attaining the max wins — we mirror
that tie rule).
"""

from __future__ import annotations

import numpy as np


def _max_distance_index(cfreq: np.ndarray) -> int:
    """Index of max distance from the line through the first/last points
    of the (cumulative) frequency curve (knee_finding.rs:43-90)."""
    n = len(cfreq)
    if n < 2:
        raise ValueError(
            "knee-finding requires at least 2 putative cells; check the mapping rate"
        )
    first = float(cfreq[0])
    last = float(cfreq[-1])
    max_x = float(n)
    max_y = last  # cumulative -> the max y is the last element
    p1 = (0.0, first / max_y)
    p2 = (1.0, last / max_y)
    x = np.arange(n, dtype=np.float64) / max_x
    y = cfreq.astype(np.float64) / max_y
    numer = np.abs(
        (p2[1] - p1[1]) * x - (p2[0] - p1[0]) * y + p2[0] * p1[1] - p2[1] * p1[0]
    )
    denom = float(np.hypot(p2[1] - p1[1], p2[0] - p1[0]))
    assert denom > 0.0
    d = numer / denom
    # reference uses `if d >= max_d` -> last index attaining max wins
    return int((n - 1) - np.argmax(d[::-1]))


def get_knee(freq: np.ndarray, max_iterations: int = 100) -> int:
    """Knee index over a descending-sorted frequency vector
    (knee_finding.rs:99-139)."""
    freq = np.asarray(freq, np.uint64)
    cfreq = np.cumsum(freq.astype(np.float64)).astype(np.uint64)
    prev_max = 0
    max_idx = _max_distance_index(cfreq)
    assert max_idx != 0, "get_knee determined a knee index of 0"
    iterations = 0
    iter_slack = 5
    while max_idx - prev_max != 0:
        prev_max = max_idx
        iterations += 1
        if iterations > max_iterations:
            break
        last_idx = min(len(cfreq) - 1, max_idx * iter_slack)
        max_idx = _max_distance_index(cfreq[:last_idx])
        assert max_idx != 0, "get_knee determined a knee index of 0"
    return max_idx
