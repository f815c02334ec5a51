#!/usr/bin/env python
"""Minimal Pallas probe for the fused-VMEM factored-EM round
(VERDICT r4 Next #7 / ADVICE: the r4 rejection of this variant rested
on extrapolated arithmetic, not a measurement — this grounds it).

The XLA factored EM round (ops/em.py, dmode="factored", c2=8) writes
its (B, 2c2, K) split intermediates to HBM between the E-step's two
digit contractions and again in the M-step (~0.3 GB/round at B=4096,
U=512 — essentially the whole measured 0.47 ms round at HBM rate).  A
Pallas kernel could hold every intermediate in VMEM, paying instead
for PER-CELL 2D dots: the digit contraction is block-diagonal over
cells, so the MXU runs one (2c2 x c1)@(c1 x K) and one
(2c2 x K)@(K x c1) matmul PER CELL, serially — plus in-VMEM one-hot
generation per cell.

This probe implements exactly one such fused round at the production
shape (B=4096, U=512 -> c2=8, c1 padded to 128, K=E*L=512) and times
it with the amortized fori_loop two-point protocol.  If the per-cell
dot serialization costs more than the ~0.36 ms of HBM traffic the
fusion saves, the XLA factored form stands — measured, not argued.

Run: python scripts/em_fused_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, U, K = 4096, 512, 512
C2 = 8
C1P = 128            # hi-digit width padded to a full lane tile (real c1=65)
UPAD = C1P * C2      # 1024 alpha slots; positions >= U+1 stay zero
BB = 8               # cells per grid step


def build_fused_round():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(alpha_ref, hi_ref, lo_ref, out_ref):
        # alpha_ref: (BB, C1P, C2) f32; hi/lo_ref: (BB, K) i32
        for i in range(BB):
            a = alpha_ref[i]                          # (C1P, C2)
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            acat = jnp.concatenate([ah, al], axis=1)  # (C1P, 2C2)
            hi_b = hi_ref[i].reshape(1, K)
            lo_b = lo_ref[i].reshape(1, K)
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (C1P, K), 0)
            oh = (iota_hi == hi_b).astype(jnp.bfloat16)       # (C1P, K)
            # E-step hi contraction: (2C2, C1P) @ (C1P, K)
            t1 = jax.lax.dot_general(
                acat, oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # (2C2, K)
            sel = t1[:C2, :] + t1[C2:, :]                      # (C2, K)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (C2, K), 0)
            ohlo = (iota_lo == lo_b).astype(jnp.float32)       # (C2, K)
            term = (sel * ohlo).sum(axis=0, keepdims=True)     # (1, K)
            denom = term.sum() + jnp.float32(1.0)
            contrib = term / denom                             # (1, K)
            ch = contrib.astype(jnp.bfloat16)
            cl = (contrib - ch.astype(jnp.float32)).astype(jnp.bfloat16)
            ohlo_b = ohlo.astype(jnp.bfloat16)
            t2 = jnp.concatenate([ohlo_b * ch, ohlo_b * cl], axis=0)
            # M-step: (2C2, K) @ (K, C1P)
            o3 = jax.lax.dot_general(
                t2, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # (2C2, C1P)
            osum = o3[:C2, :] + o3[C2:, :]                     # (C2, C1P)
            out_ref[i] = osum

    spec_a = pl.BlockSpec((BB, C1P, C2), lambda i: (i, 0, 0))
    spec_i = pl.BlockSpec((BB, K), lambda i: (i, 0))
    spec_o = pl.BlockSpec((BB, C2, C1P), lambda i: (i, 0, 0))

    def round_fn(alpha3, hi, lo):
        out = pl.pallas_call(
            kernel,
            grid=(B // BB,),
            in_specs=[spec_a, spec_i, spec_i],
            out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((B, C2, C1P), jnp.float32),
        )(alpha3, hi, lo)
        # back to (B, C1P, C2) for the next round (the real variant
        # pays this transpose too)
        return out.transpose(0, 2, 1)

    return round_fn


def time_chain(round_fn, k):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    alpha3 = rng.rand(B, C1P, C2).astype(np.float32)
    ids = rng.randint(0, U + 1, (B, K)).astype(np.int32)
    hi = ids // C2
    lo = ids % C2

    @jax.jit
    def chain(alpha3, hi, lo):
        def body(_i, a):
            return round_fn(a, hi, lo)

        return jax.lax.fori_loop(0, k, body, alpha3).sum()

    args = (jnp.asarray(alpha3), jnp.asarray(hi), jnp.asarray(lo))
    out = np.asarray(chain(*args))  # warm
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        out = np.asarray(chain(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, float(out)


def main():
    round_fn = build_fused_round()
    t1, _ = time_chain(round_fn, 4)
    t2, _ = time_chain(round_fn, 44)
    per_round = (t2 - t1) / 40
    result = {
        "kernel": (
            f"Pallas fused-VMEM factored EM round "
            f"(B={B}, U={U}, K={K}, c2={C2}, c1p={C1P}, {BB} cells/step)"
        ),
        "per_round_ms": round(per_round * 1e3, 3),
        "xla_factored_baseline_ms": 0.47,
        "verdict": (
            "fusion loses" if per_round > 0.47e-3 else "fusion wins"
        ),
        "raw": {"K": [4, 44], "t_s": [round(t1, 4), round(t2, 4)]},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
