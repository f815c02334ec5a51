"""Device-failure resilience (SURVEY.md §5 failure detection; r5).

A co-tenant TPU worker restart surfaces as a runtime error on some
later dispatch or deferred fetch.  The pipeline must complete on the
host fallback with identical output — observed in the wild during the
r5 50M-read device run, where the whole quant died mid-stream.
"""

import numpy as np
import pytest

from alevin_fry_tpu.ops import crlike


@pytest.fixture(autouse=True)
def _reset_failure_flag():
    crlike._DEVICE_FAILED = False
    yield
    crlike._DEVICE_FAILED = False


def _case(rng, n=3000, n_cells=20, n_genes=30):
    c = np.sort(rng.randint(0, n_cells, n)).astype(np.uint64)
    u = rng.randint(0, 1 << 10, n).astype(np.uint64)
    nal = np.where(rng.rand(n) < 0.8, 1, 2)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(nal, out=offs[1:])
    refs = rng.randint(0, n_genes, int(offs[-1])).astype(np.uint32)
    t2g = np.arange(n_genes, dtype=np.uint32)
    return c, u, refs, offs, t2g


def test_wta_sync_dispatch_failure_falls_back(monkeypatch):
    rng = np.random.RandomState(3)
    c, u, refs, offs, t2g = _case(rng)
    n_rows = 30
    want = crlike.wta_counts_native(c, u, refs, offs, t2g, n_rows)

    def boom(*a, **k):
        raise RuntimeError("TPU worker process crashed or restarted")

    from alevin_fry_tpu.ops import crlike_device

    monkeypatch.setattr(crlike_device, "resolve_crlike_wta_device", boom)
    monkeypatch.setattr(
        crlike_device, "resolve_crlike_wta_device_packed", boom
    )
    got = crlike.wta_counts_device(c, u, refs, offs, t2g, n_rows)
    assert got is not None
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # the device backend must be disabled for the rest of the process,
    # even under AFT_CRLIKE_BACKEND=jax
    monkeypatch.setenv("AFT_CRLIKE_BACKEND", "jax")
    assert not crlike.device_backend_enabled(1000)


def test_wta_async_fetch_failure_falls_back(monkeypatch):
    rng = np.random.RandomState(5)
    c, u, refs, offs, t2g = _case(rng)
    n_rows = 30
    want = crlike.wta_counts_native(c, u, refs, offs, t2g, n_rows)

    class DeadPending:
        def get(self):
            raise RuntimeError("UNAVAILABLE: TPU worker crashed")

    from alevin_fry_tpu.ops import crlike_device

    monkeypatch.setattr(
        crlike_device, "resolve_crlike_wta_device_packed",
        lambda *a, **k: DeadPending(),
    )
    monkeypatch.setattr(
        crlike_device, "resolve_crlike_wta_device",
        lambda *a, **k: DeadPending(),
    )
    pend = crlike.wta_counts_device(
        c, u, refs, offs, t2g, n_rows, async_=True
    )
    got = pend.get()  # fetch fails -> host recompute
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    assert crlike._DEVICE_FAILED


def test_em_batch_failure_falls_back(monkeypatch):
    from alevin_fry_tpu.ops import em

    ceo = np.asarray([0, 2, 4], np.int64)
    lo = np.asarray([0, 1, 3, 4, 6], np.int64)
    labs = np.asarray([0, 1, 2, 3, 0, 2], np.uint32)
    cts = np.asarray([5, 3, 4, 2], np.uint32)
    want = em.em_cells_batched(
        ceo, lo, labs, cts, 4, None, False, False, use_jax=False
    )

    def boom(*a, **k):
        raise RuntimeError("TPU worker process crashed or restarted")

    monkeypatch.setattr(em, "_run_jax_buckets", boom)
    got = em.em_cells_batched(
        ceo, lo, labs, cts, 4, None, False, False, use_jax=True
    )
    assert len(got) == len(want)
    for (gi, gv), (wi, wv) in zip(got, want):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_allclose(gv, wv, rtol=1e-5)
    assert crlike._DEVICE_FAILED


def test_pug_cc_device_failure_falls_back(monkeypatch):
    """The parsimony CC ladder must finish on host label propagation
    when the device kernel dies mid-run (the third distinct crash
    site observed in the r5 50M device runs)."""
    from alevin_fry_tpu.ops import pug, pug_device

    n_nodes = np.asarray([5, 3], np.int64)
    deg = np.asarray([1, 1, 0, 1, 0, 1, 1, 0], np.int64)
    # cell 0: 0-1, 3-4 edges; cell 1: chain 0-1-2
    nbrs = np.asarray([1, 0, 4, 1, 2], np.int64)
    want = pug._cc_labels_batched(n_nodes, deg, nbrs).copy()

    def boom(*a, **k):
        raise RuntimeError("TPU worker process crashed or restarted")

    monkeypatch.setattr(
        pug_device, "connected_components_batched", boom
    )
    got = pug._cc_labels_batched(n_nodes, deg, nbrs)
    np.testing.assert_array_equal(got, want)
    assert crlike._DEVICE_FAILED
    # and the retired device disables every auto policy
    assert not crlike.accelerator_present()


def test_atac_sort_device_failure_falls_back(monkeypatch):
    from alevin_fry_tpu.ops import atac_device

    rng = np.random.RandomState(5)
    cols = [rng.randint(0, 50, 500).astype(np.int64) for _ in range(3)]
    want_cols, want_counts = atac_device.sort_rle_host(cols)

    monkeypatch.setenv("AFT_ATAC_SORT_BACKEND", "jax")

    def boom(*a, **k):
        raise RuntimeError("UNAVAILABLE: TPU worker crashed")

    monkeypatch.setattr(atac_device, "sort_rle_device", boom)
    got_cols, got_counts = atac_device.sort_rle(cols)
    for a, b in zip(got_cols, want_cols):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(got_counts, want_counts)
    assert crlike._DEVICE_FAILED
