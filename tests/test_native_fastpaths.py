"""The native byte-level fast paths must agree exactly with the
vectorized-NumPy reference implementations they shortcut:

* collate's record gather/patch/emit (``radc_collate_emit``) vs the
  columnar decode -> correct -> sort -> re-encode path;
* the Hamming<=1 rescue (``radc_find_neighbors``) vs the blocked
  searchsorted implementation.
"""

import numpy as np
import pytest

from alevin_fry_tpu.ops import barcodes as bcops
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.radz import _native
from synth import write_rna_rad

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library not built"
)


def _mk_dataset(tmp_path, rng):
    refs = [f"t{i}" for i in range(40)]
    cells = []
    for i in range(12):
        bc = "".join("ACGT"[b] for b in rng.randint(0, 4, size=8))
        if bc not in [c for c, _ in cells]:
            cells.append((bc, int(rng.randint(2, 40))))
    reads = []
    for bc, n in cells:
        for i in range(n):
            nal = int(rng.randint(1, 4))
            alns = [
                (int(rng.randint(0, 40)), bool(rng.randint(0, 2)))
                for _ in range(nal)
            ]
            reads.append((bcops.pack_seq(bc), int(rng.randint(0, 4**6)), alns))
    rng.shuffle(reads)
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    # several input chunks
    k = max(1, len(reads) // 3)
    chunks = [reads[i : i + k] for i in range(0, len(reads), k)]
    write_rna_rad(rad_dir / "map.rad", refs, chunks, bc_len=8, umi_len=6)
    (tmp_path / "wl.txt").write_text("".join(bc + "\n" for bc, _ in cells))
    return rad_dir, cells


@pytest.mark.parametrize("ori", ["fw", "both"])
def test_native_collate_matches_columnar(tmp_path, monkeypatch, ori):
    rng = np.random.RandomState(3)
    rad_dir, cells = _mk_dataset(tmp_path, rng)

    outs = {}
    for mode in ("native", "columnar"):
        gpl = tmp_path / f"gpl_{mode}"
        generate_permit_list(GenPermitListOpts(
            input_dir=rad_dir, output_dir=gpl,
            fmeth=CellFilterMethod(
                "unfiltered", path=tmp_path / "wl.txt", min_reads=1
            ),
            expected_ori=ori, cmdline="t",
        ))
        import alevin_fry_tpu.pipeline.collate as cmod

        if mode == "columnar":
            monkeypatch.setattr(
                cmod, "_collate_in_memory_native",
                lambda *a, **k: False,
            )
        else:
            # the native path must actually engage (it silently falls back
            # on ineligible schemas — a fallback here would make this test
            # vacuous)
            taken = []
            orig = cmod._collate_in_memory_native
            monkeypatch.setattr(
                cmod, "_collate_in_memory_native",
                lambda *a, **k: taken.append(orig(*a, **k)) or taken[-1],
            )
        collate(gpl, rad_dir, cmdline="t")
        if mode == "native":
            assert taken == [True], "native collate path did not engage"
        monkeypatch.undo()
        outs[mode] = (gpl / "map.collated.rad").read_bytes()
    assert outs["native"] == outs["columnar"]


def test_native_find_neighbors_matches_numpy():
    rng = np.random.RandomState(11)
    length = 16
    kept = np.unique(
        rng.randint(0, 1 << 31, size=500).astype(np.uint64)
        | (rng.randint(0, 4, size=500).astype(np.uint64) << np.uint64(31))
    )
    # queries: exact members, 1-edit variants, far misses
    q_exact = kept[rng.choice(len(kept), 50)]
    var = bcops.snp_neighbors(kept[rng.choice(len(kept), 80)], length)
    q_edit = var[np.arange(80), rng.randint(0, var.shape[1], 80)]
    q_miss = rng.randint(0, 1 << 62, size=60).astype(np.uint64) & np.uint64(
        (1 << (2 * length)) - 1
    )
    queries = np.concatenate([q_exact, q_edit, q_miss])

    n_cnt, n_rep = _native.find_neighbors(queries, kept, length)
    # force the numpy path
    import alevin_fry_tpu.radz._native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        p_cnt, p_rep = bcops.find_neighbors_batch(queries, kept, length)
    finally:
        nat.available = orig
    np.testing.assert_array_equal(n_cnt, p_cnt)
    np.testing.assert_array_equal(n_rep[n_cnt > 0], p_rep[p_cnt > 0])


def test_crlike_wta_unique_native_matches_numpy():
    """Property test: the fused native WTA resolver equals the numpy
    resolve -> unique-slots -> counts chain on random ragged inputs."""
    import numpy as np
    from alevin_fry_tpu.ops import crlike
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        import pytest

        pytest.skip("native lib not built")
    rng = np.random.RandomState(17)
    for trial in range(8):
        n_cells = rng.randint(1, 30)
        n_genes = rng.randint(2, 40)
        n_txps = n_genes * 3
        tid_to_gid = rng.randint(0, n_genes, size=n_txps).astype(np.uint32)
        n_reads = rng.randint(1, 400)
        cell = np.sort(rng.randint(0, n_cells, size=n_reads)).astype(np.int64)
        umi = rng.randint(0, 50, size=n_reads).astype(np.uint64)
        nal = rng.randint(1, 5, size=n_reads)
        offs = np.zeros(n_reads + 1, np.int64)
        np.cumsum(nal, out=offs[1:])
        refs = rng.randint(0, n_txps, size=int(offs[-1])).astype(np.uint32)

        got = crlike.wta_counts_native(
            cell, umi, refs, offs, tid_to_gid, n_genes
        )
        assert got is not None
        groups = crlike.resolve_crlike(cell, umi, refs, offs, tid_to_gid)
        slot, valid = crlike.nonusa_unique_slots(groups)
        want = crlike.counts_from_slots(
            groups.cell, slot, valid, n_cells, n_genes
        )
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"trial {trial}")


def test_crlike_wta_usa_native_matches_numpy():
    """USA-mode tie-set slotting in the native kernel equals the numpy
    resolve -> usa_slots -> counts chain."""
    import numpy as np
    from alevin_fry_tpu.ops import crlike
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        import pytest

        pytest.skip("native lib not built")
    rng = np.random.RandomState(23)
    for trial in range(8):
        n_cells = rng.randint(1, 25)
        n_genes_base = rng.randint(2, 20)      # gene pairs
        mid = 2 * n_genes_base + 2             # USA id space (even/odd)
        num_rows = mid + mid // 2
        usa_offsets = (num_rows // 3, 2 * num_rows // 3)
        n_txps = n_genes_base * 4
        # USA tg-map: spliced (even) and unspliced (odd) ids interleaved
        tid_to_gid = (
            rng.randint(0, n_genes_base, size=n_txps) * 2
            + rng.randint(0, 2, size=n_txps)
        ).astype(np.uint32)
        n_reads = rng.randint(1, 500)
        cell = np.sort(rng.randint(0, n_cells, size=n_reads)).astype(np.int64)
        umi = rng.randint(0, 40, size=n_reads).astype(np.uint64)
        nal = rng.randint(1, 6, size=n_reads)
        offs = np.zeros(n_reads + 1, np.int64)
        np.cumsum(nal, out=offs[1:])
        refs = rng.randint(0, n_txps, size=int(offs[-1])).astype(np.uint32)

        got = crlike.wta_counts_native(
            cell, umi, refs, offs, tid_to_gid, num_rows,
            usa_offsets=usa_offsets,
        )
        assert got is not None
        groups = crlike.resolve_crlike(cell, umi, refs, offs, tid_to_gid)
        slot, valid = crlike.usa_slots_for_groups(groups, num_rows)
        want = crlike.counts_from_slots(
            groups.cell, slot, valid, n_cells, num_rows
        )
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"trial {trial}")
