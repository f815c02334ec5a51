"""Device (JAX/XLA) cr-like winner-take-all resolution.

The host path (ops/crlike.py) resolves UMIs with native segmented
sorts; this module is the TPU-native equivalent: ONE jitted program
over a padded, packed u64 key array — sort, run-length aggregate,
segmented argmax with tie sets, and (non-USA) gene-unique counting —
all with fixed shapes so XLA can tile the sort and the segmented
reductions onto the vector units.

Semantics mirror resolve_num_molecules_crlike_from_vec
(reference src/pugutils.rs:644-749): per (cell, umi) the genes attaining
the maximal aggregated count form the tie set; a UMI contributes one
count to its gene iff the tie set is a singleton (non-USA "unique"
rule, reference src/quant.rs:541-589 fast path).

Key packing matches ops/crlike.py::resolve_crlike: the (cell, umi,
gene) triplet packs into one u64 as cell << (ubits+gbits) | umi <<
gbits | gene; PAD entries are all-ones (sorts to the end and is never a
valid key because gene ids never reach the all-ones pattern).

Sharding: resolution is embarrassingly parallel over cells, so the key
array shards over a 1-D device mesh at cell boundaries (pad each shard
to the common length); every program instance runs this same kernel —
no collectives are needed until the final count-matrix assembly.
"""

from __future__ import annotations

from functools import partial

import numpy as np

PAD = np.uint64(0xFFFFFFFFFFFFFFFF)


def _kernel(key, ubits, gbits, n_rows):
    import jax.numpy as jnp

    N = key.shape[0]
    key = jnp.sort(key)
    valid = key != PAD

    prev = jnp.concatenate([key[:1] ^ jnp.uint64(1), key[:-1]])
    trip_start = (key != prev) & valid
    # triplet segment ids (0-based over the sorted array; PAD tail
    # collapses into the last segment but is masked everywhere)
    trip_id = jnp.cumsum(trip_start.astype(jnp.int32)) - 1
    trip_id = jnp.maximum(trip_id, 0)
    # per-triplet multiplicity
    t_count = jnp.zeros(N, jnp.int32).at[trip_id].add(valid.astype(jnp.int32))

    gkey = key >> jnp.uint64(gbits)  # (cell, umi)
    gprev = jnp.concatenate([gkey[:1] ^ jnp.uint64(1), gkey[:-1]])
    grp_start = (gkey != gprev) & valid
    grp_id = jnp.cumsum(grp_start.astype(jnp.int32)) - 1
    grp_id = jnp.maximum(grp_id, 0)

    # per-group max triplet count: scatter-max of each triplet's count
    # at its group id (only triplet-start rows carry the count)
    t_count_at_start = jnp.where(trip_start, t_count[trip_id], 0)
    gmax = jnp.zeros(N, jnp.int32).at[grp_id].max(t_count_at_start)
    winner = trip_start & (t_count_at_start == gmax[grp_id])

    # tie-set size per group; non-USA unique rule keeps singletons
    tie_sz = jnp.zeros(N, jnp.int32).at[grp_id].add(winner.astype(jnp.int32))
    unique_win = winner & (tie_sz[grp_id] == 1)

    # count matrix contribution: +1 at (cell, gene) per unique winner.
    # re-pack to (cell, gene), sort, and run-length aggregate.
    cell = key >> jnp.uint64(ubits + gbits)
    gene = key & jnp.uint64((1 << gbits) - 1)
    cg = jnp.where(
        unique_win, cell * jnp.uint64(n_rows) + gene, PAD
    )
    cg = jnp.sort(cg)
    cg_valid = cg != PAD
    cg_prev = jnp.concatenate([cg[:1] ^ jnp.uint64(1), cg[:-1]])
    cg_start = (cg != cg_prev) & cg_valid
    cg_id = jnp.maximum(jnp.cumsum(cg_start.astype(jnp.int32)) - 1, 0)
    cg_count = jnp.zeros(N, jnp.int32).at[cg_id].add(cg_valid.astype(jnp.int32))
    # emit (key, count) at the segment-start positions; PAD elsewhere
    out_key = jnp.where(cg_start, cg, PAD)
    out_cnt = jnp.where(cg_start, cg_count[cg_id], 0)
    return out_key, out_cnt


def _kernel_usa(key, ubits, gbits, n_rows, prefer_ambig=False):
    """USA-mode WTA: per (cell, umi) the winner tie set maps to a
    spliced/unspliced/ambiguous slot by the reference's len-1/2/3..10
    rules (utils.rs:656-739, quant.rs:516-589).  Gene ids are the USA
    interleaved ids (even = spliced, odd = unspliced); ``n_rows`` is the
    3-section output space.

    ``prefer_ambig``: counts aggregate per gene PAIR (spliced id) and a
    winning pair emits all its observed variants
    (pugutils.rs:505-641)."""
    import jax.numpy as jnp

    N = key.shape[0]
    key = jnp.sort(key)
    valid = key != PAD

    prev = jnp.concatenate([key[:1] ^ jnp.uint64(1), key[:-1]])
    trip_start = (key != prev) & valid
    trip_id = jnp.maximum(jnp.cumsum(trip_start.astype(jnp.int32)) - 1, 0)
    t_count = jnp.zeros(N, jnp.int32).at[trip_id].add(valid.astype(jnp.int32))

    gkey = key >> jnp.uint64(gbits)  # (cell, umi)
    gprev = jnp.concatenate([gkey[:1] ^ jnp.uint64(1), gkey[:-1]])
    grp_start = (gkey != gprev) & valid
    grp_id = jnp.maximum(jnp.cumsum(grp_start.astype(jnp.int32)) - 1, 0)

    t_count_at_start = jnp.where(trip_start, t_count[trip_id], 0)
    if prefer_ambig:
        # pair segments: a spliced/unspliced pair {2k, 2k+1} is adjacent
        # in the sorted keys, so key >> 1 merges it
        pkey = key >> jnp.uint64(1)
        pprev = jnp.concatenate([pkey[:1] ^ jnp.uint64(1), pkey[:-1]])
        pair_start = (pkey != pprev) & valid
        pair_id = jnp.maximum(
            jnp.cumsum(pair_start.astype(jnp.int32)) - 1, 0
        )
        p_count = jnp.zeros(N, jnp.int32).at[pair_id].add(t_count_at_start)
        p_count_at_start = jnp.where(pair_start, p_count[pair_id], 0)
        gmax_ct = jnp.zeros(N, jnp.int32).at[grp_id].max(p_count_at_start)
        winner = trip_start & (p_count[pair_id] == gmax_ct[grp_id])
    else:
        gmax_ct = jnp.zeros(N, jnp.int32).at[grp_id].max(t_count_at_start)
        winner = trip_start & (t_count_at_start == gmax_ct[grp_id])

    tie_sz = jnp.zeros(N, jnp.int32).at[grp_id].add(winner.astype(jnp.int32))

    gi = (key & jnp.uint64((1 << gbits) - 1)).astype(jnp.int64)
    even = (gi & 1) == 0
    uoff = n_rows // 3
    aoff = 2 * uoff

    BIG = jnp.int64(1) << jnp.int64(62)
    gmin = jnp.full(N, BIG, jnp.int64).at[grp_id].min(
        jnp.where(winner, gi, BIG)
    )
    gmax = jnp.full(N, -1, jnp.int64).at[grp_id].max(
        jnp.where(winner, gi, -1)
    )
    nspl = jnp.zeros(N, jnp.int32).at[grp_id].add(
        (winner & even).astype(jnp.int32)
    )
    sgene = jnp.full(N, -1, jnp.int64).at[grp_id].max(
        jnp.where(winner & even, gi, -1)
    )
    # does the tie set contain the unique spliced gene's unspliced
    # partner?  (second scatter pass over sgene)
    partner_elem = winner & ~even & (
        (gi & ~jnp.int64(1)) == (sgene[grp_id] & ~jnp.int64(1))
    )
    partner = jnp.zeros(N, bool).at[grp_id].max(partner_elem)

    # slot rules evaluated per group (at grp_start rows)
    g = grp_id
    l_ = tie_sz[g]
    g1, g2 = gmin[g], gmax[g]
    sg, pt, ns = sgene[g], partner[g], nspl[g]
    sp1 = (g1 & 1) == 0
    sp2 = (g2 & 1) == 0
    same = (g1 & ~jnp.int64(1)) == (g2 & ~jnp.int64(1))
    slot1 = jnp.where(sp2, g2 >> 1, uoff + (g2 >> 1))
    slot2 = jnp.where(
        same, aoff + (g1 >> 1),
        jnp.where(sp1 & ~sp2, g1 >> 1, g2 >> 1),
    )
    ok2 = same | (sp1 & ~sp2) | (~sp1 & sp2)
    slot3 = jnp.where(pt, aoff + (sg >> 1), sg >> 1)
    ok3 = ns == 1
    slot = jnp.where(
        l_ == 1, slot1, jnp.where(l_ == 2, slot2, slot3)
    )
    ok = jnp.where(
        l_ == 1, True,
        jnp.where(l_ == 2, ok2, (l_ >= 3) & (l_ <= 10) & ok3),
    )

    cell = (key >> jnp.uint64(ubits + gbits)).astype(jnp.int64)
    cs = jnp.where(
        grp_start & ok,
        (cell * jnp.int64(n_rows) + slot).astype(jnp.uint64),
        PAD,
    )
    cs = jnp.sort(cs)
    cs_valid = cs != PAD
    cs_prev = jnp.concatenate([cs[:1] ^ jnp.uint64(1), cs[:-1]])
    cs_start = (cs != cs_prev) & cs_valid
    cs_id = jnp.maximum(jnp.cumsum(cs_start.astype(jnp.int32)) - 1, 0)
    cs_count = jnp.zeros(N, jnp.int32).at[cs_id].add(cs_valid.astype(jnp.int32))
    out_key = jnp.where(cs_start, cs, PAD)
    out_cnt = jnp.where(cs_start, cs_count[cs_id], 0)
    return out_key, out_cnt


def resolve_crlike_wta_device(
    key: np.ndarray, ubits: int, gbits: int, n_rows: int, pad_to: int | None = None,
    usa: bool = False, prefer_ambig: bool = False,
):
    """Resolve packed (cell, umi, gene) keys on device; returns COO
    triplets (rows, cols, counts[f32]) sorted by (cell, gene) —
    identical to ops/crlike.py resolve_crlike + nonusa_unique_slots +
    counts_from_slots for deduplicated input pairs.

    ``key`` must already be deduplicated per (read, gene) — i.e. the
    output of _dedup_read_genes repacked — duplicates from one read
    would inflate multiplicities.
    """
    import jax
    import jax.numpy as jnp

    n = len(key)
    if pad_to is None:
        # pad to the next power-of-two bucket to bound program count
        pad_to = 1 << max(int(n - 1).bit_length(), 10)
    buf = np.full(pad_to, PAD, np.uint64)
    buf[:n] = key
    with jax.enable_x64(True):
        if usa:
            fn = jax.jit(_kernel_usa, static_argnums=(1, 2, 3, 4))
            out_key, out_cnt = fn(
                jnp.asarray(buf), ubits, gbits, n_rows, prefer_ambig
            )
        else:
            fn = jax.jit(_kernel, static_argnums=(1, 2, 3))
            out_key, out_cnt = fn(jnp.asarray(buf), ubits, gbits, n_rows)
        out_key = np.asarray(out_key)
        out_cnt = np.asarray(out_cnt)
    keep = out_key != PAD
    uniq = out_key[keep].astype(np.int64)  # segment starts are already sorted
    cnt = out_cnt[keep]
    return (
        (uniq // n_rows).astype(np.int64),
        (uniq % n_rows).astype(np.int64),
        cnt.astype(np.float32),
    )


def sharded_crlike_wta(mesh, keys_per_shard, ubits: int, gbits: int, n_rows: int):
    """Run the WTA kernel data-parallel over a device mesh.

    ``keys_per_shard`` is a (n_shards, L) u64 array, each row one
    shard's padded key block split at CELL boundaries (a cell's triplets
    must live in exactly one shard).  Returns per-shard (out_key,
    out_cnt) blocks gathered to the host; no cross-shard collective is
    needed because cells are independent (SURVEY.md §2.3).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))

    @partial(jax.jit, static_argnums=(1, 2, 3))
    def run(blocks, ubits, gbits, n_rows):
        blocks = jax.lax.with_sharding_constraint(blocks, sharding)
        ok, oc = jax.vmap(lambda k: _kernel(k, ubits, gbits, n_rows))(blocks)
        return (
            jax.lax.with_sharding_constraint(ok, sharding),
            jax.lax.with_sharding_constraint(oc, sharding),
        )

    with jax.enable_x64(True):
        ok, oc = run(jnp.asarray(keys_per_shard), ubits, gbits, n_rows)
        return np.asarray(ok), np.asarray(oc)
