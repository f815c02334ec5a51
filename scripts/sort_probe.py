#!/usr/bin/env python
"""XLA TPU sort cost structure (VERDICT r3 #3 evidence).

The WTA and ATAC kernels are bound by XLA's u64 sort (~14M keys/s and
~42M rows/s at 4M elements, PROFILE_r03).  A Pallas radix sort was
proposed; this probe quantifies what it would have to beat and what the
hardware allows:

* XLA sort at 4M elements for u32 / u64 / u64-with-payload — the pass
  scaling.  If u32 is ~2x u64, the sort is width-linear multi-pass and
  a narrower SORT KEY (not a different algorithm) is the available win.
* The amortized-chain protocol from scripts/profile_kernels.py.

The radix alternative needs a data-dependent vectorized scatter (per
digit pass) — Mosaic/Pallas TPU exposes no vectorized scatter to VMEM
(pltpu has roll/iota/static slicing only; pallas_guide.md), so the
inner scatter would serialize on sublanes.  A bitonic network avoids
scatter but is O(n log^2 n): at n=4M that is ~484 compare-exchange
passes x 32 MB = ~15 GB of VMEM/HBM traffic per sort — ~19 s at HBM
speed, 60x worse than XLA's sort.  Numbers from this probe complete the
record.

Run: python scripts/sort_probe.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_sort(dtype, n=1 << 22, with_payload=False, ks=(1, 11)):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    if np.dtype(dtype).itemsize == 8:
        arr = rng.randint(0, 1 << 62, n).astype(dtype)
    else:
        arr = rng.randint(0, 1 << 31, n).astype(dtype)

    def build(k):
        @jax.jit
        def chain(x):
            def body(_i, x):
                if with_payload:
                    s, p = jax.lax.sort((x, x + np.dtype(dtype).type(1)), num_keys=1)
                    return s ^ (p & np.dtype(dtype).type(3))
                s = jnp.sort(x)
                # feed low bits back so no round is dead code
                return s ^ (s >> np.dtype(dtype).type(1) & np.dtype(dtype).type(1))

            out = jax.lax.fori_loop(0, k, body, x)
            return out.astype(jnp.uint32).sum() if out.dtype != jnp.uint32 else out.sum()

        def call():
            with jax.enable_x64(True):
                return chain(jnp.asarray(arr))

        return call

    f1, f2 = build(ks[0]), build(ks[1])
    np.asarray(f1()), np.asarray(f2())  # warm
    t1 = min(_t(f1) for _ in range(3))
    t2 = min(_t(f2) for _ in range(3))
    per = (t2 - t1) / (ks[1] - ks[0])
    return {
        "kernel": f"XLA sort {np.dtype(dtype).name}"
                  + ("+payload" if with_payload else "")
                  + f" ({n >> 20}M)",
        "per_sort_ms": round(per * 1e3, 2),
        "keys_per_s": round(n / per),
        "raw_t_s": [round(t1, 4), round(t2, 4)],
    }


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def main():
    import jax

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    for r in (
        probe_sort(np.uint32),
        probe_sort(np.uint64),
        probe_sort(np.uint64, with_payload=True),
    ):
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
