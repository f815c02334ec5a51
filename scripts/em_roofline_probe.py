#!/usr/bin/env python
"""Arithmetic-intensity probe for the dense-MXU EM round (VERDICT r3 #1).

Hypothesis: the dense one-hot-matmul round is NOT MXU-bound but
operand-bytes-bound — each round streams the loop-invariant one-hot
matrices, O(B * E*L * (U+1)) elements, through HBM twice (E-step and
M-step contractions), so per-round time should scale ~linearly with U
at fixed B,E,L and the achieved "TFLOP/s" is just (fake) model flops
divided by a bytes-bound time.

Protocol: the same amortized fori_loop chain as scripts/profile_kernels.py
(two round counts, difference), at U in {128, 256, 512} with B=4096,
E=64, L=8.  If t(U) is ~linear with slope ~ 2*B*K*(U+1)*sizeof/819GB/s,
the kernel is at the dense formulation's own roofline and the fix is
fewer bytes (factored one-hot / Pallas fused), not matmul tuning.

Run on the real chip: python scripts/em_roofline_probe.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe(U_target: int, B=4096, E=64, L=8, ks=(10, 110), mode="onehot",
          usa=False):
    import os

    import jax
    import jax.numpy as jnp

    os.environ["AFT_EM_DENSE_MODE"] = mode
    from alevin_fry_tpu.ops.em import _get_em_kernel_compact

    rng = np.random.RandomState(0)
    R = 8192
    # labels drawn in [0, U_target) directly — compact_local_ids would
    # renumber anyway; the kernel only sees local ids
    labels = jnp.asarray(rng.randint(0, U_target, (B, E, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(1, L + 1, (B, E)), jnp.int32)
    counts = jnp.asarray(rng.randint(1, 50, (B, E)), jnp.float32)
    p1 = jnp.asarray(rng.randint(0, U_target, (B, E, L)), jnp.int32)
    p2 = jnp.asarray(rng.randint(0, U_target, (B, E, L)), jnp.int32)

    def run_k(k):
        fn = _get_em_kernel_compact(usa, False, fixed_rounds=k, dense=True)
        summed = jax.jit(
            lambda l, n, c, a, b2: fn(l, n, c, a, b2, R, U_target, False).sum()
        )
        t0 = time.perf_counter()
        np.asarray(summed(labels, lens, counts, p1, p2))
        warm = time.perf_counter() - t0
        best = min(
            (
                lambda: (
                    lambda t0: (
                        np.asarray(summed(labels, lens, counts, p1, p2)),
                        time.perf_counter() - t0,
                    )[1]
                )(time.perf_counter())
            )()
            for _ in range(3)
        )
        return best, warm

    t1, _ = run_k(ks[0])
    t2, _ = run_k(ks[1])
    per_round = (t2 - t1) / (ks[1] - ks[0])
    K = E * L
    onehot_bytes_f32 = B * K * (U_target + 1) * 4
    onehot_bytes_bf16 = B * K * (U_target + 1) * 2
    flops = 2 * 2 * B * K * (U_target + 1)
    return {
        "mode": mode,
        "usa": usa,
        "U": U_target,
        "per_round_ms": round(per_round * 1e3, 4),
        "achieved_TFLOPs": round(flops / per_round / 1e12, 2),
        "onehot_stream_ms_if_f32_twice": round(
            2 * onehot_bytes_f32 / 819e9 * 1e3, 2
        ),
        "onehot_stream_ms_if_bf16_twice": round(
            2 * onehot_bytes_bf16 / 819e9 * 1e3, 2
        ),
        "raw_t_s": [round(t1, 4), round(t2, 4)],
    }


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="onehot,vpu,factored")
    ap.add_argument("--us", default="128,512")
    ap.add_argument("--usa", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    for mode in args.modes.split(","):
        for u in (int(x) for x in args.us.split(",")):
            r = probe(u, mode=mode, usa=args.usa)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
