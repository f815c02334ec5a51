"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
the psum-merged histogram and the sharded EM round must match their
host (NumPy) equivalents."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from alevin_fry_tpu.parallel.mesh import (
    example_em_inputs, make_mesh, sharded_em_step, sharded_histogram,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_mesh()


def test_sharded_histogram_matches_host(mesh):
    rng = np.random.RandomState(1)
    # barcodes wider than 32 bits exercise the x64 path (bc_len > 16)
    wl = np.sort(
        rng.choice(1 << 20, size=128, replace=False).astype(np.uint64)
        << np.uint64(20)
    )
    n = 16 * len(jax.devices())
    bcs = wl[rng.choice(len(wl), size=n)]
    bcs[: n // 4] = rng.choice(1 << 20, size=n // 4).astype(np.uint64)
    cnt, unmatched = sharded_histogram(mesh, bcs, wl)
    cnt = np.asarray(cnt)
    # host reference
    idx = np.searchsorted(wl, bcs)
    idx_c = np.minimum(idx, len(wl) - 1)
    hit = wl[idx_c] == bcs
    ref = np.zeros(len(wl), np.int64)
    np.add.at(ref, idx_c[hit], 1)
    np.testing.assert_array_equal(cnt, ref)
    assert int(unmatched) == int((~hit).sum())


def test_em_cells_batched_mesh_matches_host(mesh):
    """The full batched EM with the cell axis sharded over the mesh must
    equal the single-device result."""
    from alevin_fry_tpu.ops.em import em_cells_batched

    rng = np.random.RandomState(9)
    R = 24
    C = 100
    cell_eq_offsets = [0]
    lab_offsets = [0]
    labels = []
    counts = []
    for _ in range(C):
        ne = rng.randint(2, 7)
        for _ in range(ne):
            ll = rng.randint(1, 4)
            labels.extend(rng.choice(R, size=ll, replace=False).tolist())
            lab_offsets.append(len(labels))
            counts.append(rng.randint(1, 15))
        cell_eq_offsets.append(cell_eq_offsets[-1] + ne)
    args = (
        np.asarray(cell_eq_offsets, np.int64),
        np.asarray(lab_offsets, np.int64),
        np.asarray(labels, np.uint32),
        np.asarray(counts, np.uint32),
        R, None, False, True,
    )
    base = em_cells_batched(*args, use_jax=True)
    sharded = em_cells_batched(*args, use_jax=True, mesh=mesh)
    for (bi, bv), (si, sv) in zip(base, sharded):
        np.testing.assert_array_equal(bi, si)
        np.testing.assert_allclose(bv, sv, rtol=1e-6)


def test_sharded_em_round_matches_numpy(mesh):
    R = 32
    B = 2 * len(jax.devices())
    labels, lens, counts, alphas = example_em_inputs(B=B, E=8, L=4, R=R, seed=3)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    step = sharded_em_step(mesh)
    out = np.asarray(step(
        jax.device_put(labels, shard), jax.device_put(lens, shard),
        jax.device_put(counts, shard), jax.device_put(alphas, shard), R,
    ))

    # numpy reference for one EM round
    lab = np.asarray(labels)
    ln = np.asarray(lens)
    ct = np.asarray(counts)
    al = np.asarray(alphas)
    ref = np.zeros_like(al)
    for b in range(B):
        for e in range(lab.shape[1]):
            ll = ln[b, e]
            if ll == 0:
                continue
            idx = lab[b, e, :ll]
            if ll == 1:
                ref[b, idx[0]] += ct[b, e]
                continue
            ab = al[b, idx]
            denom = ab.sum(dtype=np.float32)
            if denom > 0:
                ref[b, idx] += ab * (ct[b, e] / denom)
    np.testing.assert_allclose(out[:, :R], ref[:, :R], rtol=2e-5, atol=2e-5)
    assert np.all(out[:, R] == 0)


def _random_crlike_case(rng, n_cells=40, n_genes=50, n_pairs=3000):
    """Random deduplicated (cell, umi, gene) pairs, cell-sorted."""
    c = np.sort(rng.randint(0, n_cells, size=n_pairs)).astype(np.int64)
    u = rng.randint(0, 1 << 10, size=n_pairs).astype(np.uint64)
    g = rng.randint(0, n_genes, size=n_pairs).astype(np.uint64)
    # dedup (cell, umi, gene) triplet duplicates are ALLOWED (they model
    # multiple reads); no per-read dedup needed here
    return c, u, g


def test_crlike_device_matches_host():
    """The jitted device WTA kernel must reproduce the host resolver's
    COO counts exactly (integer counts, same ordering)."""
    from alevin_fry_tpu.ops import crlike
    from alevin_fry_tpu.ops.crlike_device import resolve_crlike_wta_device

    rng = np.random.RandomState(5)
    n_cells, n_genes = 40, 50
    c, u, g = _random_crlike_case(rng, n_cells, n_genes)
    ubits, gbits = 10, 6
    key = (
        (c.astype(np.uint64) << np.uint64(ubits + gbits))
        | (u << np.uint64(gbits))
        | g
    )

    r_dev, c_dev, v_dev = resolve_crlike_wta_device(key, ubits, gbits, n_genes)

    # host reference: resolve + unique slots + counts
    aln_offsets = np.arange(len(c) + 1, dtype=np.int64)  # 1 'aln' per pair
    tid_to_gid = np.arange(n_genes, dtype=np.uint32)
    groups = crlike.resolve_crlike(c, u, g.astype(np.uint32), aln_offsets, tid_to_gid)
    slot, valid = crlike.nonusa_unique_slots(groups)
    r_h, c_h, v_h = crlike.counts_from_slots(
        groups.cell, slot, valid, n_cells, n_genes
    )
    np.testing.assert_array_equal(r_dev, r_h)
    np.testing.assert_array_equal(c_dev, c_h)
    np.testing.assert_array_equal(v_dev, v_h)


def test_crlike_sharded_matches_single(mesh):
    """Cell-boundary-sharded WTA over the mesh == single-device result."""
    from alevin_fry_tpu.ops.crlike_device import (
        PAD, resolve_crlike_wta_device, sharded_crlike_wta,
    )

    rng = np.random.RandomState(11)
    n_shards = len(jax.devices())
    n_cells, n_genes = 8 * n_shards, 30
    ubits, gbits = 10, 5
    c, u, g = _random_crlike_case(rng, n_cells, n_genes, n_pairs=2000)
    key = (
        (c.astype(np.uint64) << np.uint64(ubits + gbits))
        | (u << np.uint64(gbits))
        | g
    )
    r1, c1, v1 = resolve_crlike_wta_device(key, ubits, gbits, n_genes)

    # split at cell boundaries into n_shards blocks, pad to equal length
    bounds = np.searchsorted(c, np.arange(1, n_shards) * 8)
    blocks = np.split(key, bounds)
    L = 1 << int(max(len(b) for b in blocks) - 1).bit_length()
    padded = np.full((n_shards, L), PAD, np.uint64)
    for i, b in enumerate(blocks):
        padded[i, : len(b)] = b
    ok, oc = sharded_crlike_wta(mesh, padded, ubits, gbits, n_genes)
    keep = ok != PAD
    uniq = ok[keep].astype(np.int64)  # blocks are cell-ordered
    cnt = oc[keep]
    np.testing.assert_array_equal(uniq // n_genes, r1)
    np.testing.assert_array_equal(uniq % n_genes, c1)
    np.testing.assert_array_equal(cnt.astype(np.float32), v1)


def test_sharded_collate_shuffle_matches_host(mesh):
    """The all-to-all collation shuffle must regroup reads by owning
    shard in (rank, payload) order — the device analog of the
    reference's temp-bucket scatter/gather (collate.rs:584-905)."""
    from alevin_fry_tpu.parallel.mesh import sharded_collate_shuffle

    rng = np.random.RandomState(3)
    S = len(jax.devices())
    n_cells = 50
    n = 64 * S
    ranks = rng.randint(0, n_cells, size=n).astype(np.int32)
    payload = np.arange(n, dtype=np.int32)

    cells_per_shard = -(-n_cells // S)
    # capacity = the largest (source device, owner) bin
    cap = 0
    for d in range(S):
        loc = ranks[d * (n // S):(d + 1) * (n // S)]
        owners = np.minimum(loc // cells_per_shard, S - 1)
        if len(owners):
            cap = max(cap, int(np.bincount(owners, minlength=S).max()))

    r_out, p_out, dropped = sharded_collate_shuffle(
        mesh, ranks, payload, n_cells, cap
    )
    assert dropped == 0
    owners_all = np.minimum(ranks // cells_per_shard, S - 1)
    for s in range(S):
        mine = np.flatnonzero(owners_all == s)
        exp = mine[np.lexsort((payload[mine], ranks[mine]))]
        got_valid = r_out[s] != n_cells
        np.testing.assert_array_equal(r_out[s][got_valid], ranks[exp])
        np.testing.assert_array_equal(p_out[s][got_valid], payload[exp])

    # a too-small capacity must be detected, not silently truncated
    if cap > 1:
        _, _, dropped2 = sharded_collate_shuffle(
            mesh, ranks, payload, n_cells, cap - 1
        )
        assert dropped2 > 0


def test_device_cc_matches_union_find(mesh):
    """Batched min-label propagation must equal the host union-find
    (pugutils.rs:278-301 semantics) on random per-cell graphs."""
    from alevin_fry_tpu.ops.pug import _DSU
    from alevin_fry_tpu.ops.pug_device import (
        connected_components_batched, pack_adjacency,
    )

    rng = np.random.RandomState(11)
    B = 2 * len(jax.devices())
    adjs = []
    for _ in range(B):
        n = rng.randint(1, 40)
        adj = [[] for _ in range(n)]
        for _ in range(rng.randint(0, 2 * n)):
            a, b = rng.randint(0, n, size=2)
            if a != b:
                adj[a].append(b)
        adjs.append(adj)

    nbrs, valid = pack_adjacency(adjs)
    labels = connected_components_batched(nbrs, valid, mesh=mesh)

    for b, adj in enumerate(adjs):
        n = len(adj)
        dsu = _DSU(n)
        for a in range(n):
            for w in adj[a]:
                dsu.union(a, w)
        roots = {}
        for v in range(n):
            roots.setdefault(dsu.find(v), []).append(v)
        for members in roots.values():
            expect = min(members)
            got = {int(labels[b, v]) for v in members}
            assert got == {expect}, (b, members, got)
        assert (labels[b, n:] == nbrs.shape[1]).all()
