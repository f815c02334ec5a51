#!/usr/bin/env python
"""Steady-state utilization measurement of the core device kernels.

Times the batched EM round, the cr-like WTA resolver, the Pallas
Hamming rescue kernel, and the batched PUG connected-components kernel
on the attached accelerator, and prints achieved bandwidth / op
throughput next to the chip's roofline numbers (TPU v5e: ~197 bf16
TFLOP/s, ~819 GB/s HBM).  Results go into BASELINE.md's utilization
table.

Run: python scripts/profile_kernels.py  (uses the default jax backend)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_GBS = 819.0  # v5e HBM bandwidth
PEAK_BF16 = 197e12


def timeit(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def profile_em():
    """One EM round at production shape: B=4096 cells x E=64 classes x
    L=8 labels, R=8192 gene rows.  Memory-bound: bytes = alphas read
    (gather) + write + labels/counts."""
    import jax
    import jax.numpy as jnp

    B, E, L, R = 4096, 64, 8, 8192
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, R, (B, E, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(1, L + 1, (B, E)), jnp.int32)
    counts = jnp.asarray(rng.randint(1, 50, (B, E)), jnp.float32)
    alphas = jnp.asarray(rng.rand(B, R + 1), jnp.float32)

    @jax.jit
    def em_round(labels, lens, counts, alphas):
        B, E, L = labels.shape
        lmask = jnp.arange(L)[None, None, :] < lens[:, :, None]
        ab = jnp.take_along_axis(
            alphas, labels.reshape(B, -1), axis=1
        ).reshape(labels.shape)
        ab = jnp.where(lmask, ab, 0.0)
        denom = ab.sum(axis=2)
        single = lens == 1
        multi = (lens > 0) & ~single
        inv = jnp.where(
            (denom > 0) & multi, counts / jnp.maximum(denom, 1e-30), 0.0
        )
        contrib = ab * inv[:, :, None]
        out = jnp.zeros_like(alphas)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None], labels.shape)
        out = out.at[
            bidx.reshape(-1), jnp.where(lmask, labels, R).reshape(-1)
        ].add(jnp.where(multi[:, :, None], contrib, 0.0).reshape(-1))
        out = out.at[
            jnp.arange(B)[:, None], jnp.where(single, labels[:, :, 0], R)
        ].add(jnp.where(single, counts, 0.0))
        return out.at[:, R].set(0.0)

    # chain iterations (output feeds back as input) and block once —
    # defeats async-dispatch measurement artifacts through the tunnel
    a = em_round(labels, lens, counts, alphas)
    jax.block_until_ready(a)
    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        a = em_round(labels, lens, counts, a)
    jax.block_until_ready(a)
    dt = (time.perf_counter() - t0) / iters
    # traffic: out write/zero-init (2*B*(R+1)*4) + labels (B*E*L*4) +
    # gathered/scattered values (2*B*E*L*4); the alphas read is the
    # gather itself
    bytes_moved = 2 * B * (R + 1) * 4 + B * E * L * 4 * 3
    return {
        "kernel": "EM round (B=4096,E=64,L=8,R=8192), chained",
        "time_ms": round(dt * 1e3, 3),
        "cells_per_s": round(B / dt),
        "achieved_GBs": round(bytes_moved / dt / 1e9, 1),
        "hbm_utilization_pct": round(100 * bytes_moved / dt / 1e9 / HBM_GBS, 1),
    }


def profile_wta():
    """Device cr-like WTA: sort + segmented argmax over packed keys."""
    import jax

    from alevin_fry_tpu.ops.crlike_device import resolve_crlike_wta_device

    rng = np.random.RandomState(1)
    n = 1 << 22  # 4M (cell, umi, gene) pairs
    ubits, gbits = 20, 14
    c = np.sort(rng.randint(0, 4096, n)).astype(np.uint64)
    u = rng.randint(0, 1 << ubits, n).astype(np.uint64)
    g = rng.randint(0, 10000, n).astype(np.uint64)
    key = (c << np.uint64(ubits + gbits)) | (u << np.uint64(gbits)) | g

    def run(k):
        return resolve_crlike_wta_device(k, ubits, gbits, 10000)

    # includes host<->device transfer of the key column (production path)
    for _ in range(2):
        run(key)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r, cc, v = run(key)
    dt = (time.perf_counter() - t0) / iters
    del jax
    return {
        "kernel": "cr-like WTA (4M pairs, incl transfer)",
        "time_ms": round(dt * 1e3, 1),
        "pairs_per_s": round(n / dt),
    }


def profile_hamming():
    from alevin_fry_tpu.ops.pallas_hamming import find_neighbors_pallas

    rng = np.random.RandomState(2)
    bc_len = 16
    kept = np.sort(
        np.unique(rng.randint(0, 1 << 62, 100_000).astype(np.uint64)
                  & np.uint64((1 << 32) - 1))
    )
    queries = rng.randint(0, 1 << 32, 65536).astype(np.uint64)
    for _ in range(2):
        find_neighbors_pallas(queries, kept, bc_len)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        find_neighbors_pallas(queries, kept, bc_len)
    dt = (time.perf_counter() - t0) / iters
    pairs = len(queries) * len(kept)
    return {
        "kernel": f"Pallas Hamming<=1 ({len(queries)}x{len(kept)})",
        "time_ms": round(dt * 1e3, 1),
        "pair_dist_per_s": f"{pairs / dt / 1e9:.1f}G",
    }


def profile_pug_cc():
    from alevin_fry_tpu.ops.pug_device import connected_components_batched

    rng = np.random.RandomState(3)
    B, N, D = 1024, 256, 16
    nbrs = np.full((B, N, D), N, np.int32)
    # random symmetric graphs: ring + chords
    for b in range(B):
        for v in range(N):
            nbrs[b, v, 0] = (v + 1) % N
            nbrs[b, v, 1] = (v - 1) % N
    valid = np.ones((B, N), bool)
    for _ in range(2):
        connected_components_batched(nbrs, valid)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        connected_components_batched(nbrs, valid)
    dt = (time.perf_counter() - t0) / iters
    return {
        "kernel": f"PUG CC label-prop (B={B},N={N},D={D})",
        "time_ms": round(dt * 1e3, 1),
        "graphs_per_s": round(B / dt),
    }


def main():
    import jax

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)
    results = []
    for f in (profile_em, profile_wta, profile_pug_cc, profile_hamming):
        try:
            results.append(f())
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": f.__name__, "error": str(e)}),
                  flush=True)


if __name__ == "__main__":
    main()
