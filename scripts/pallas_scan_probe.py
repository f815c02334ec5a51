#!/usr/bin/env python
"""Viability probe: single-pass Pallas cumsum vs XLA's log-depth scan.

TPU Pallas grids execute SEQUENTIALLY on the (single) tensorcore, so a
scan can thread a carry through scratch across grid steps — one data
pass over HBM instead of XLA's ~log2(N) full-array passes (measured
0.79 ms per 4M int32 cumsum, scripts/cum_probe.py).  If this kernel
lands near the single-touch floor (~0.05 ms), the WTA kernels' ~12-19
cumulative passes are worth porting; if not, record the number and
stop (the r3 revert discipline).

Run: python scripts/pallas_scan_probe.py [--interpret]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LANES = 128
ROWS = 256  # rows per grid step: 256*128 = 32768 elements/step


def make_cumsum(n_rows_total: int, interpret: bool = False):
    """Returns f(x2d) -> inclusive cumsum over row-major flattened
    order, x2d shaped (n_rows_total, LANES) int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n_rows_total // ROWS,)

    def _scan_add(v, axis, size):
        # inclusive Hillis-Steele scan via circular rolls + masked adds
        # (Mosaic has no cumsum lowering; log2(size) VPU steps)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
        s = 1
        while s < size:
            rolled = pltpu.roll(v, s, axis=axis)
            v = v + jnp.where(idx >= s, rolled, 0)
            s *= 2
        return v

    def kernel(x_ref, out_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            carry_ref[0, 0] = 0

        x = x_ref[:]  # (ROWS, LANES) int32
        within = _scan_add(x, 1, LANES)            # lane scan per row
        rowtot = within[:, LANES - 1:]             # (ROWS, 1)
        rowpre = _scan_add(rowtot, 0, ROWS) - rowtot
        c = within + rowpre + carry_ref[0, 0]
        out_ref[:] = c
        carry_ref[0, 0] = c[ROWS - 1, LANES - 1]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )


def main():
    interpret = "--interpret" in sys.argv
    import jax
    import jax.numpy as jnp

    n = 1 << 16 if interpret else 1 << 22
    rows = n // LANES
    x = np.random.RandomState(0).randint(0, 3, (rows, LANES)).astype(np.int32)
    fn = make_cumsum(rows, interpret)
    out = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_array_equal(
        out.ravel(), np.cumsum(x.ravel()).astype(np.int32)
    )
    print("correct", file=sys.stderr)
    if interpret:
        return

    @jax.jit
    def chain(v, k):
        def body(_i, v):
            c = fn(v)
            return v ^ (c & 1)

        return jax.lax.fori_loop(0, k, body, v).sum()

    def t(k):
        f = jax.jit(lambda v: chain(v, k))
        np.asarray(f(jnp.asarray(x)))
        return min(
            (lambda t0: (np.asarray(f(jnp.asarray(x))),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(5)
        )

    t1, t2 = t(2), t(402)
    per = (t2 - t1) / 400
    print(json.dumps({
        "kernel": f"pallas single-pass cumsum ({n >> 20}M int32)",
        "per_pass_ms": round(per * 1e3, 3),
        "xla_reference_ms": 0.79,
        "raw_t_s": [round(t1, 3), round(t2, 3)],
    }))


if __name__ == "__main__":
    main()
