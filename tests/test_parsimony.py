"""Parsimony (PUG) resolution tests with hand-computed expectations.

The distinguishing behavior vs cr-like: UMIs within Hamming distance 1
that share a transcript collapse into one molecule when the frequency
rule freq(x) > 2*freq(y)-1 holds (pugutils.rs:76-99, 308-391).
"""

import numpy as np
from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_rna_rad

BC_LEN = 8
UMI_LEN = 8


def _pad_umi(i: int) -> int:
    """UMIs with pairwise Hamming distance >= 2 (each base-4 digit is
    duplicated).  i+1 keeps them distinct from the all-A UMI; they only
    share transcripts with each other, so distance to u_a/u_b is moot."""
    i = i + 1
    v = 0
    for k in range(4):
        d = (i >> (2 * k)) & 3
        v |= d << (4 * k)
        v |= d << (4 * k + 2)
    return v


def _dataset(tmp_path):
    refs = ["t0", "t1", "t2"]
    CB = "AAAAAAAA"
    u_a = 0          # AAAAAAAA
    u_b = 1          # AAAAAAAC -> Hamming 1 from u_a
    reads = []
    for _ in range(3):
        reads.append((pack_seq(CB), u_a, [(0, True)]))
    reads.append((pack_seq(CB), u_b, [(0, True)]))
    for i in range(97):
        reads.append((pack_seq(CB), _pad_umi(i), [(2, True)]))
    assert len(reads) == 101  # >= SMALL_CELL_FAST_THRESHOLD
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=BC_LEN, umi_len=UMI_LEN)
    (tmp_path / "permit.txt").write_text(CB + "\n")
    t2g = tmp_path / "t2g.tsv"
    t2g.write_text("t0\tg0\nt1\tg1\nt2\tg2\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "permit.txt", min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    return gpl, t2g


def _mat(qdir):
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    m = np.zeros(shape)
    m[r, c] = v
    return m


def test_parsimony_merges_one_edit_umis(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qp",
        resolution="parsimony", pug_exact_umi=False, cmdline="t",
    ))
    # u_b (freq 1) collapses into u_a (freq 3): one molecule on g0
    np.testing.assert_array_equal(_mat(tmp_path / "qp"), [[1, 0, 97]])

    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qc",
        resolution="cr-like", cmdline="t",
    ))
    # cr-like keeps the two UMIs distinct
    np.testing.assert_array_equal(_mat(tmp_path / "qc"), [[2, 0, 97]])


def test_parsimony_exact_umi_no_merge(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qe",
        resolution="parsimony", pug_exact_umi=True, cmdline="t",
    ))
    # exact-UMI mode: Hamming-1 pairs do NOT merge
    np.testing.assert_array_equal(_mat(tmp_path / "qe"), [[2, 0, 97]])


def test_parsimony_em_resolves_ambiguous(tmp_path):
    refs = ["t0", "t1", "t2"]
    CB = "AAAAAAAA"
    reads = [(pack_seq(CB), 0, [(0, True)]) for _ in range(3)]
    reads.append((pack_seq(CB), 1, [(0, True)]))
    # one gene-ambiguous UMI far from the others
    reads.append((pack_seq(CB), (2 << 12) | (2 << 8), [(0, True), (1, True)]))
    for i in range(96):
        reads.append((pack_seq(CB), _pad_umi(i), [(2, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=BC_LEN, umi_len=UMI_LEN)
    (tmp_path / "permit.txt").write_text(CB + "\n")
    t2g = tmp_path / "t2g.tsv"
    t2g.write_text("t0\tg0\nt1\tg1\nt2\tg2\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "permit.txt", min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")

    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qp",
        resolution="parsimony", pug_exact_umi=False, cmdline="t",
    ))
    # ambiguous {g0,g1} class dropped under plain parsimony
    np.testing.assert_array_equal(_mat(tmp_path / "qp"), [[1, 0, 96]])

    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qpe",
        resolution="parsimony-em", pug_exact_umi=False, cmdline="t",
    ))
    m = _mat(tmp_path / "qpe")
    # EM pulls the ambiguous molecule toward g0 (unique evidence)
    assert m[0, 0] > 1.8
    assert m[0, 1] < 0.2
    assert abs(m[0].sum() - 98) < 0.1


def test_parsimony_gene_level(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qg",
        resolution="parsimony-gene", pug_exact_umi=False, cmdline="t",
    ))
    np.testing.assert_array_equal(_mat(tmp_path / "qg"), [[1, 0, 97]])


def test_large_graph_fallback(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    # threshold 1: the 2-vertex component exceeds it -> cr-like fallback
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=tmp_path / "qf",
        resolution="parsimony", pug_exact_umi=False, large_graph_thresh=1,
        cmdline="t",
    ))
    np.testing.assert_array_equal(_mat(tmp_path / "qf"), [[2, 0, 97]])
    import json

    meta = json.loads((tmp_path / "qf" / "quant.json").read_text())
    assert meta["alt_resolved_cell_numbers"] == [0]


def test_parsimony_usa_mode(tmp_path):
    """USA-mode parsimony (experimental in the reference,
    quant.rs:1404-1414): unique-gene molecules slot by splicing status."""
    gpl, _t2g = _dataset(tmp_path)
    t2g3 = tmp_path / "t2g3.tsv"
    # t0 spliced of g0, t1 unspliced of g0, t2 spliced of g1
    t2g3.write_text("t0\tg0\tS\nt1\tg0\tU\nt2\tg1\tS\n")
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g3, output_dir=tmp_path / "qu",
        resolution="parsimony", pug_exact_umi=False, cmdline="t",
    ))
    m = _mat(tmp_path / "qu")
    # columns: [g0, g1, g0-U, g1-U, g0-A, g1-A]
    assert m.shape == (1, 6)
    # merged u_a/u_b molecule -> t0 -> g0 spliced; 97 pads -> t2 -> g1 spliced
    np.testing.assert_array_equal(m, [[1, 97, 0, 0, 0, 0]])


def test_pug_native_matches_python():
    """Property test: the threaded native PUG resolver reproduces the
    per-cell Python resolver exactly (eqclass labels, counts, order,
    alt-cell flags) on random ragged inputs, both transcript- and
    gene-level, exact and 1-edit modes, including the large-component
    fallback."""
    import numpy as np
    from alevin_fry_tpu.ops import pug
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        import pytest

        pytest.skip("native lib not built")
    rng = np.random.RandomState(41)
    for trial in range(10):
        n_cells = rng.randint(1, 12)
        n_genes = rng.randint(2, 12)
        n_txps = n_genes * 3
        tid_to_gid = rng.randint(0, n_genes, size=n_txps).astype(np.uint32)
        n_reads = rng.randint(1, 250)
        cell = np.sort(rng.randint(0, n_cells, size=n_reads)).astype(np.int64)
        # small UMI space to force Hamming-1 neighborhoods and shared UMIs
        umi = rng.randint(0, 16, size=n_reads).astype(np.uint64)
        nal = rng.randint(1, 4, size=n_reads)
        offs = np.zeros(n_reads + 1, np.int64)
        np.cumsum(nal, out=offs[1:])
        refs = rng.randint(0, n_txps, size=int(offs[-1])).astype(np.uint32)
        sub = {"cell": cell, "umi": umi, "refs": refs, "offs": offs}
        gene_level = bool(trial % 2)
        exact = trial % 3 == 0
        thresh = 6 if trial % 4 == 0 else 1000  # exercise the fallback

        cells = np.unique(cell)
        got = pug._resolve_parsimony_native(
            cell, umi, refs, offs, cells, tid_to_gid, exact, thresh,
            gene_level,
        )
        assert got is not None
        import unittest.mock as mock

        with mock.patch.object(pug, "_resolve_parsimony_native",
                               lambda *a, **k: None):
            want = pug.resolve_parsimony_cells(
                sub, tid_to_gid, n_genes, pug_exact_umi=exact,
                large_graph_thresh=thresh, gene_level=gene_level,
            )
        ge, we = got[0], want[0]
        np.testing.assert_array_equal(ge.cell_ids, we.cell_ids, err_msg=f"t{trial}")
        np.testing.assert_array_equal(
            ge.cell_eq_offsets, we.cell_eq_offsets, err_msg=f"t{trial}"
        )
        np.testing.assert_array_equal(
            ge.label_offsets, we.label_offsets, err_msg=f"t{trial}"
        )
        np.testing.assert_array_equal(ge.labels, we.labels, err_msg=f"t{trial}")
        np.testing.assert_array_equal(ge.counts, we.counts, err_msg=f"t{trial}")
        assert got[1] == want[1], f"t{trial} alt cells"


def test_pug_device_cc_matches_union_find(monkeypatch):
    """The split path — native graph build, batched device (jitted)
    min-label-propagation CC, native greedy cover — must reproduce the
    monolithic native resolver bit-for-bit (pugutils.rs:278-301 is the
    union-find being replaced)."""
    import numpy as np
    import pytest
    from alevin_fry_tpu.ops import pug
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        pytest.skip("native lib not built")
    rng = np.random.RandomState(17)
    for trial in range(6):
        n_cells = rng.randint(1, 10)
        n_genes = rng.randint(2, 10)
        n_txps = n_genes * 3
        tid_to_gid = rng.randint(0, n_genes, size=n_txps).astype(np.uint32)
        n_reads = rng.randint(1, 300)
        cell = np.sort(rng.randint(0, n_cells, size=n_reads)).astype(np.int64)
        umi = rng.randint(0, 16, size=n_reads).astype(np.uint64)
        nal = rng.randint(1, 4, size=n_reads)
        offs = np.zeros(n_reads + 1, np.int64)
        np.cumsum(nal, out=offs[1:])
        refs = rng.randint(0, n_txps, size=int(offs[-1])).astype(np.uint32)
        gene_level = bool(trial % 2)
        exact = trial % 3 == 0
        thresh = 5 if trial % 2 == 0 else 1000
        cells = np.unique(cell)

        monkeypatch.setenv("AFT_PUG_CC_BACKEND", "host")
        host = pug._resolve_parsimony_native(
            cell, umi, refs, offs, cells, tid_to_gid, exact, thresh,
            gene_level,
        )
        monkeypatch.setenv("AFT_PUG_CC_BACKEND", "device")
        dev = pug._resolve_parsimony_native(
            cell, umi, refs, offs, cells, tid_to_gid, exact, thresh,
            gene_level,
        )
        he, de = host[0], dev[0]
        np.testing.assert_array_equal(he.cell_ids, de.cell_ids)
        np.testing.assert_array_equal(he.cell_eq_offsets, de.cell_eq_offsets)
        np.testing.assert_array_equal(he.label_offsets, de.label_offsets)
        np.testing.assert_array_equal(he.labels, de.labels)
        np.testing.assert_array_equal(he.counts, de.counts)
        assert host[1] == dev[1]
    monkeypatch.delenv("AFT_PUG_CC_BACKEND")


def test_host_cc_labels_oversized_fallback():
    """Graphs beyond the device padding ladder use host min-label
    propagation — same component labels as brute union-find."""
    import numpy as np
    from alevin_fry_tpu.ops.pug import _host_cc_labels

    rng = np.random.RandomState(23)
    n = 500
    # random sparse undirected graph as symmetric CSR
    edges = set()
    for _ in range(700):
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = np.asarray([len(a) for a in adj], np.int64)
    nbr = np.asarray([w for a in adj for w in sorted(a)], np.int32)
    lab = _host_cc_labels(n, deg, nbr)
    # brute-force union-find reference
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    ref = np.zeros(n, np.int64)
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min.setdefault(r, v)
    for v in range(n):
        ref[v] = comp_min[find(v)]
    np.testing.assert_array_equal(lab, ref)
