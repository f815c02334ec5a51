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


def test_pallas_empty_inputs():
    cnt, rep = find_neighbors_pallas(
        np.zeros(0, np.uint64), np.zeros(5, np.uint64), 8, interpret=True
    )
    assert len(cnt) == 0
    cnt, rep = find_neighbors_pallas(
        np.zeros(3, np.uint64), np.zeros(0, np.uint64), 8, interpret=True
    )
    np.testing.assert_array_equal(cnt, [0, 0, 0])
