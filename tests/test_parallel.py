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
    wl = np.sort(rng.choice(1 << 20, size=128, replace=False).astype(np.uint64))
    n = 16 * len(jax.devices())
    bcs = rng.choice(1 << 20, size=n).astype(np.uint64)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    cnt, unmatched = sharded_histogram(
        mesh, jax.device_put(bcs, shard), wl
    )
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
