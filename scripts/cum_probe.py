#!/usr/bin/env python
"""Cumulative-op cost on TPU: XLA's 1-D cumsum/cummax vs a two-level
blocked reformulation (PROFILE_r04 follow-up).

The scatter-free WTA kernels spend ~2 ms per 4M-element cumulative
pass (~2% of HBM) — XLA lowers 1-D cumulative ops to a log-depth scan
over the WHOLE array (~22 full-array passes at 4M).  Reshaping to
(rows, 1024) makes the inner scan vectorize across rows (10 passes
over the minor axis) with a tiny 1-D scan over row totals + broadcast
fix-up: same result, ~2 full-array-equivalent passes.

Run: python scripts/cum_probe.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def two_point(make_chain, k1, k2, reps=5):
    f1, f2 = make_chain(k1), make_chain(k2)
    np.asarray(f1()), np.asarray(f2())
    t1 = min(_t(f1) for _ in range(reps))
    t2 = min(_t(f2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1), t1, t2


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def probe(name, fn, n=1 << 22, dtype=np.int32, ks=(2, 402)):
    import jax
    import jax.numpy as jnp

    x = np.random.RandomState(0).randint(0, 3, n).astype(dtype)

    def make_chain(k):
        @jax.jit
        def chain(v):
            def body(_i, v):
                c = fn(v)
                return v ^ (c & np.int32(1))

            return jax.lax.fori_loop(0, k, body, v).sum()

        def call():
            with jax.enable_x64(True):
                return chain(jnp.asarray(x))

        return call

    per, t1, t2 = two_point(make_chain, *ks)
    print(json.dumps({
        "kernel": f"{name} ({n >> 20}M {np.dtype(dtype).name})",
        "per_pass_ms": round(per * 1e3, 3),
        "raw_t_s": [round(t1, 3), round(t2, 3)],
    }), flush=True)


def main():
    import jax.numpy as jnp

    def plain_cumsum(v):
        return jnp.cumsum(v)

    def blocked_cumsum(v, w=1024):
        r = v.reshape(-1, w)
        within = jnp.cumsum(r, axis=1)
        totals = within[:, -1]
        prefix = jnp.cumsum(totals) - totals
        return (within + prefix[:, None]).reshape(-1)

    def plain_cummax(v):
        import jax.lax as lax

        return lax.cummax(v)

    def blocked_cummax(v, w=1024):
        import jax.lax as lax

        r = v.reshape(-1, w)
        within = lax.cummax(r, axis=1)
        rowmax = within[:, -1]
        prev = lax.cummax(rowmax)
        prev = jnp.concatenate([prev[:1] * 0 - (1 << 30), prev[:-1]])
        return jnp.maximum(within, prev[:, None]).reshape(-1)

    probe("cumsum 1-D", plain_cumsum)
    probe("cumsum blocked", blocked_cumsum)
    probe("cummax 1-D", plain_cummax)
    probe("cummax blocked", blocked_cummax)

    # correctness cross-check on host values
    x = np.random.RandomState(1).randint(0, 100, 1 << 16).astype(np.int32)
    import jax

    with jax.enable_x64(True):
        np.testing.assert_array_equal(
            np.asarray(blocked_cumsum(jnp.asarray(x))), np.cumsum(x)
        )
        np.testing.assert_array_equal(
            np.asarray(blocked_cummax(jnp.asarray(x))),
            np.maximum.accumulate(x),
        )
    print("blocked forms exact", file=sys.stderr)


if __name__ == "__main__":
    main()
