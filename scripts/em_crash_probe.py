#!/usr/bin/env python
"""Isolate the device-EM TPU-worker crash seen in the r5 50M-read
device scale run.

The run's cr-like-em stage crashed the tunnel worker ~3 minutes in
(the pipeline completed on the host fallback).  This probe replays
the EM bucket ladder at the production USA shape — every (Ep, Lp)
bucket, realistic per-cell eq-class structure drawn from the hard
generator's distributions — one batch per bucket directly against
the TPU, to determine whether a specific shape deterministically
kills the worker or the crash was environmental.

Run: python scripts/em_crash_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_cells(rng, n_cells, ne_lo, ne_hi, L_max, R):
    """Synth per-cell eq-class structure: ne classes per cell, each
    with 1..L_max labels drawn from R rows, counts 1..50."""
    ne = rng.randint(ne_lo, ne_hi + 1, n_cells)
    ceo = np.zeros(n_cells + 1, np.int64)
    np.cumsum(ne, out=ceo[1:])
    n_cls = int(ceo[-1])
    ll = rng.randint(1, L_max + 1, n_cls)
    lo = np.zeros(n_cls + 1, np.int64)
    np.cumsum(ll, out=lo[1:])
    labels = rng.randint(0, R // 3, int(lo[-1])).astype(np.uint32)
    counts = rng.randint(1, 50, n_cls).astype(np.uint32)
    return ceo, lo, labels, counts


def main():
    from alevin_fry_tpu.ops.em import em_cells_batched

    rng = np.random.RandomState(0)
    R = 3 * 5001  # USA 3-section space at 5k genes
    usa = (R // 3, 2 * (R // 3))
    results = []
    # one batch per ladder bucket at realistic + worst-case shapes
    cases = [
        ("ep64_small", 4096, 2, 60, 12),
        ("ep256", 2048, 65, 250, 12),
        ("ep1024", 512, 257, 1000, 12),
        ("ep1024_wideL", 256, 257, 1000, 16),
    ]
    for name, n_cells, ne_lo, ne_hi, lmax in cases:
        ceo, lo, labels, counts = make_cells(
            rng, n_cells, ne_lo, ne_hi, lmax, R
        )
        t0 = time.perf_counter()
        try:
            out = em_cells_batched(
                ceo, lo, labels, counts, R, usa, False, False,
                use_jax=True,
            )
            ok = all(r is not None for r in out)
            results.append({
                "case": name, "n_cells": n_cells,
                "status": "ok" if ok else "missing-results",
                "s": round(time.perf_counter() - t0, 1),
            })
        except Exception as e:  # noqa: BLE001
            results.append({
                "case": name, "n_cells": n_cells,
                "status": f"CRASH: {type(e).__name__}: {e}",
                "s": round(time.perf_counter() - t0, 1),
            })
        print(json.dumps(results[-1]), flush=True)
    Path("/tmp/em_crash_probe.json").write_text(json.dumps(results))


if __name__ == "__main__":
    main()
