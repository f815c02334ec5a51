"""Device-mesh sharding for the quantification engine.

The reference is single-process (SURVEY.md §2.3); the TPU-native design
shards the *cell axis* (pure data parallelism — per-cell UMI resolution
and EM are independent) and the *barcode/read axis* for the histogram
and collation phases, with psum/all-gather merges over ICI:

* permit-list histogram: reads sharded across chips; per-chip partial
  histograms over the (replicated, sorted) whitelist merge with a
  ``psum``;
* quant EM: cells sharded across chips; each chip runs the batched EM
  kernel locally; the per-shard sparse matrices concatenate on the host
  (no inter-cell reduction exists, matching the reference's
  thread-per-cell independence).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "cells") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sharded_histogram(mesh: Mesh, bcs: jnp.ndarray, wl_sorted: jnp.ndarray):
    """Barcode histogram against a replicated sorted whitelist.

    ``bcs`` is sharded over the cells axis; the whitelist is replicated;
    per-shard partial counts are merged with a psum over ICI.
    Returns (counts_per_wl_entry, num_unmatched).

    Runs under x64 so packed barcodes keep their full u64 width
    (bc_len > 16 bases needs more than 32 bits)."""
    axis = mesh.axis_names[0]

    def local_hist(b, wl):
        idx = jnp.searchsorted(wl, b)
        idx_c = jnp.minimum(idx, wl.shape[0] - 1)
        hit = wl[idx_c] == b
        cnt = jnp.zeros(wl.shape[0], jnp.int32).at[jnp.where(hit, idx_c, 0)].add(
            hit.astype(jnp.int32)
        )
        unmatched = (~hit).sum()
        return (
            jax.lax.psum(cnt, axis),
            jax.lax.psum(unmatched, axis),
        )

    fn = jax.shard_map(
        local_hist,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
    )
    with jax.enable_x64(True):
        b = jax.device_put(
            np.asarray(bcs, np.uint64), NamedSharding(mesh, P(axis))
        )
        wl = jax.device_put(
            np.asarray(wl_sorted, np.uint64), NamedSharding(mesh, P())
        )
        return fn(b, wl)


def sharded_em_step(mesh: Mesh):
    """Returns a jitted one-round EM update with the cell batch sharded
    over the mesh: gather alpha over labels, normalize by class totals,
    scatter-add — the inner loop of em_cells_batched distributed
    data-parallel over cells."""
    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis))

    @partial(jax.jit, static_argnums=(4,))
    def step(labels, lens, counts, alphas, R):
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
        alphas = jax.lax.with_sharding_constraint(alphas, batch_sharding)
        B, E, L = labels.shape
        lmask = jnp.arange(L)[None, None, :] < lens[:, :, None]
        ab = jnp.take_along_axis(alphas, labels.reshape(B, -1), axis=1).reshape(
            labels.shape
        )
        ab = jnp.where(lmask, ab, 0.0)
        denom = ab.sum(axis=2)
        single = lens == 1
        valid = lens > 0
        multi = valid & ~single
        inv = jnp.where((denom > 0) & multi, counts / jnp.maximum(denom, 1e-30), 0.0)
        contrib = ab * inv[:, :, None]
        out = jnp.zeros_like(alphas)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None], labels.shape)
        out = out.at[
            bidx.reshape(-1), jnp.where(lmask, labels, R).reshape(-1)
        ].add(jnp.where(multi[:, :, None], contrib, 0.0).reshape(-1))
        out = out.at[jnp.arange(B)[:, None], jnp.where(single, labels[:, :, 0], R)].add(
            jnp.where(single, counts, 0.0)
        )
        out = out.at[:, R].set(0.0)
        return jax.lax.with_sharding_constraint(out, batch_sharding)

    return step


def example_em_inputs(B=8, E=8, L=4, R=32, seed=0):
    rng = np.random.RandomState(seed)
    lens = rng.randint(1, L + 1, size=(B, E)).astype(np.int32)
    labels = np.full((B, E, L), R, np.int32)
    for b in range(B):
        for e in range(E):
            labels[b, e, : lens[b, e]] = rng.choice(R, size=lens[b, e], replace=False)
    counts = rng.randint(1, 10, size=(B, E)).astype(np.float32)
    alphas = np.zeros((B, R + 1), np.float32)
    alphas[:, :R] = 1e-3
    return (
        jnp.asarray(labels), jnp.asarray(lens), jnp.asarray(counts),
        jnp.asarray(alphas),
    )
