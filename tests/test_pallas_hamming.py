"""Pallas Hamming<=1 kernel vs the host reference (interpret mode on
the CPU backend)."""

import numpy as np
import pytest

from alevin_fry_tpu.ops import barcodes as bcops
from alevin_fry_tpu.ops.pallas_hamming import find_neighbors_pallas


def test_pallas_matches_host_reference():
    rng = np.random.RandomState(11)
    length = 16
    kept = np.sort(
        np.unique(rng.randint(0, 1 << 32, size=600).astype(np.uint64))
    )
    # queries: some exact, some 1-sub mutants, some random
    exact = rng.choice(kept, 50)
    muts = bcops.snp_neighbors(rng.choice(kept, 80), length)
    mutants = muts[np.arange(80), rng.randint(0, muts.shape[1], 80)]
    randoms = rng.randint(0, 1 << 32, size=100).astype(np.uint64)
    queries = np.concatenate([exact, mutants, randoms])

    ref_cnt, ref_rep = bcops.find_neighbors_batch(queries, kept, length)
    dev_cnt, dev_rep = find_neighbors_pallas(queries, kept, length, interpret=True)

    np.testing.assert_array_equal(dev_cnt, ref_cnt)
    # representatives must agree where the neighbor is unique (the only
    # case the rescue consumes)
    uniq = ref_cnt == 1
    np.testing.assert_array_equal(dev_rep[uniq], ref_rep[uniq])


def test_searchsorted_device_matches_host_reference():
    from alevin_fry_tpu.ops.pallas_hamming import find_neighbors_searchsorted

    rng = np.random.RandomState(23)
    length = 16
    kept = np.sort(
        np.unique(rng.randint(0, 1 << 32, size=2000).astype(np.uint64))
    )
    exact = rng.choice(kept, 60)
    muts = bcops.snp_neighbors(rng.choice(kept, 90), length)
    mutants = muts[np.arange(90), rng.randint(0, muts.shape[1], 90)]
    randoms = rng.randint(0, 1 << 32, size=200).astype(np.uint64)
    # include the all-T barcode: its padded-table collision case
    allt = np.array([0xFFFFFFFF], np.uint64)
    queries = np.concatenate([exact, mutants, randoms, allt])

    ref_cnt, ref_rep = bcops.find_neighbors_batch(queries, kept, length)
    dev_cnt, dev_rep = find_neighbors_searchsorted(queries, kept, length)

    np.testing.assert_array_equal(dev_cnt, ref_cnt)
    uniq = ref_cnt == 1
    np.testing.assert_array_equal(dev_rep[uniq], ref_rep[uniq])


def test_find_neighbors_dispatcher_backends(monkeypatch):
    rng = np.random.RandomState(7)
    length = 12
    kept = np.sort(
        np.unique(rng.randint(0, 1 << 24, size=500).astype(np.uint64))
    )
    queries = np.concatenate([
        rng.choice(kept, 40),
        rng.randint(0, 1 << 24, size=100).astype(np.uint64),
    ])
    ref = bcops.find_neighbors_batch(queries, kept, length)
    for mode in ("host", "jax", "auto"):
        monkeypatch.setenv("AFT_RESCUE_BACKEND", mode)
        cnt, rep = bcops.find_neighbors(queries, kept, length)
        np.testing.assert_array_equal(cnt, ref[0])
        uniq = ref[0] == 1
        np.testing.assert_array_equal(rep[uniq], ref[1][uniq])


def test_pallas_empty_inputs():
    cnt, rep = find_neighbors_pallas(
        np.zeros(0, np.uint64), np.zeros(5, np.uint64), 8, interpret=True
    )
    assert len(cnt) == 0
    cnt, rep = find_neighbors_pallas(
        np.zeros(3, np.uint64), np.zeros(0, np.uint64), 8, interpret=True
    )
    np.testing.assert_array_equal(cnt, [0, 0, 0])


@pytest.mark.parametrize("length", [10, 16, 24, 32])
def test_mxu_matches_host_reference(length):
    """The MXU one-hot-contraction kernel (r5, cellfilter.rs:198-233)
    must equal the host path exactly: counts always, representative
    wherever count >= 1 (min global index over sorted kept == smallest
    neighbor)."""
    from alevin_fry_tpu.ops.pallas_hamming import find_neighbors_mxu

    rng = np.random.RandomState(41 + length)
    top = (1 << (2 * length)) - 1 if length < 32 else (1 << 62)
    kept = np.sort(
        np.unique(rng.randint(0, top, size=1500).astype(np.uint64))
    )
    exact = rng.choice(kept, 60)
    muts = bcops.snp_neighbors(rng.choice(kept, 90), length)
    mutants = muts[np.arange(90), rng.randint(0, muts.shape[1], 90)]
    randoms = rng.randint(0, top, size=200).astype(np.uint64)
    allzero = np.array([0], np.uint64)  # kept-pad one-hot aliasing case
    queries = np.concatenate([exact, mutants, randoms, allzero])

    ref_cnt, ref_rep = bcops.find_neighbors_batch(queries, kept, length)
    dev_cnt, dev_rep = find_neighbors_mxu(queries, kept, length, interpret=True)

    np.testing.assert_array_equal(dev_cnt, ref_cnt)
    hit = ref_cnt >= 1
    np.testing.assert_array_equal(dev_rep[hit], ref_rep[hit])


def test_mxu_empty_inputs():
    from alevin_fry_tpu.ops.pallas_hamming import find_neighbors_mxu

    cnt, rep = find_neighbors_mxu(
        np.zeros(0, np.uint64), np.zeros(5, np.uint64), 8, interpret=True
    )
    assert len(cnt) == 0
    cnt, rep = find_neighbors_mxu(
        np.zeros(3, np.uint64), np.zeros(0, np.uint64), 8, interpret=True
    )
    np.testing.assert_array_equal(cnt, [0, 0, 0])
