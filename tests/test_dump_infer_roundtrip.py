"""quant --dump-eqclasses -> infer roundtrip: re-running the EM from the
dumped gene-level equivalence classes must reproduce quant's matrix
(infer.rs is exactly that re-run)."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.infer import infer
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_rna_rad


def _pad_umi(i):
    i = i + 1
    v = 0
    for k in range(5):
        d = (i >> (2 * k)) & 3
        v |= d << (4 * k)
        v |= d << (4 * k + 2)
    return v


def _mat(path):
    r, c, v, shape = read_matrix_market(path)
    m = np.zeros(shape)
    m[r, c] = v
    return m


def test_dump_eq_infer_roundtrip(tmp_path):
    refs = ["t0", "t1", "t2"]
    bcs = ["AAAAAAAA", "CCCCCCCC"]
    reads = []
    rng = np.random.RandomState(2)
    for bc in bcs:
        # 120 reads per cell: 60 unique t0, 30 unique t1, 30 ambiguous
        for i in range(60):
            reads.append((pack_seq(bc), _pad_umi(i), [(0, True)]))
        for i in range(30):
            reads.append((pack_seq(bc), _pad_umi(200 + i), [(1, True)]))
        for i in range(30):
            reads.append((pack_seq(bc), _pad_umi(400 + i),
                          [(0, True), (1, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=8, umi_len=10)
    (tmp_path / "wl.txt").write_text("".join(b + "\n" for b in bcs))
    (tmp_path / "t2g.tsv").write_text("t0\tg0\nt1\tg1\nt2\tg2\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=tmp_path / "t2g.tsv", output_dir=qdir,
        resolution="cr-like-em", dump_eq=True, cmdline="t",
    ))
    assert (qdir / "alevin" / "geqc_counts.mtx").exists()
    assert (qdir / "alevin" / "gene_eqclass.txt.gz").exists()

    # infer needs rows/cols next to the count matrix — they are
    infer(
        qdir / "alevin" / "geqc_counts.mtx",
        qdir / "alevin" / "gene_eqclass.txt.gz",
        False, 1, None, tmp_path / "inferred",
    )
    m_quant = _mat(qdir / "alevin" / "quants_mat.mtx")
    m_infer = _mat(tmp_path / "inferred" / "quants_mat.mtx")
    assert m_quant.shape == m_infer.shape
    np.testing.assert_allclose(m_infer, m_quant, rtol=5e-3, atol=5e-3)


def test_dump_eq_native_matches_pure(tmp_path):
    """Native interning/formatting and the pure-Python fallback write
    byte-identical geqc_counts.mtx and gene_eqclass.txt.gz (USA mode
    exercises the vectorized relabeling)."""
    import gzip

    import pytest

    from alevin_fry_tpu.radz import _native

    if not _native.available():
        pytest.skip("native codec not built")

    refs = ["t0", "t1", "t2", "t3"]
    bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG"]
    reads = []
    rng = np.random.RandomState(5)
    for bc in bcs:
        for i in range(150):
            tids = sorted(set(rng.randint(0, 4, rng.randint(1, 4)).tolist()))
            reads.append(
                (pack_seq(bc), _pad_umi(rng.randint(500)),
                 [(t, True) for t in tids])
            )
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=8, umi_len=10)
    (tmp_path / "wl.txt").write_text("".join(b + "\n" for b in bcs))
    # 3-column t2g -> USA mode (t3 unspliced of g1)
    (tmp_path / "t2g.tsv").write_text(
        "t0\tg0\tS\nt1\tg1\tS\nt2\tg0\tU\nt3\tg1\tU\n"
    )
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")

    outs = {}
    for tag in ("native", "pure"):
        qdir = tmp_path / f"q_{tag}"
        if tag == "pure":
            lib, _native._LIB = _native._LIB, None
        try:
            quantify(QuantOpts(
                input_dir=gpl, tg_map=tmp_path / "t2g.tsv", output_dir=qdir,
                resolution="cr-like", dump_eq=True, cmdline="t",
            ))
        finally:
            if tag == "pure":
                _native._LIB = lib
        outs[tag] = (
            (qdir / "alevin" / "geqc_counts.mtx").read_bytes(),
            gzip.open(qdir / "alevin" / "gene_eqclass.txt.gz", "rb").read(),
        )
    assert outs["native"][0] == outs["pure"][0]
    assert outs["native"][1] == outs["pure"][1]


def test_usa_transform_labels_hand_fixture():
    """Hand-computed fixture for the USA relabeling (utils.rs:825-909),
    independent of this repo's writer: interleaved ids (even = spliced
    gene g at 2g, odd = unspliced at 2g+1) map to the 3-section space
    [spliced | unspliced@G | ambiguous@2G], with a spliced gene
    IMMEDIATELY followed by its own unspliced partner collapsing to one
    ambiguous id, in label-iteration order (the reference skips the
    sort: "the tvec won't necessarily be in sorted order").

    G = 10, so uoff = 10, aoff = 20.  Expected vectors worked by hand
    from the reference's match arms (len-1 vs iterate-and-peek):

      [6]         -> [3]            single spliced g3
      [7]         -> [13]           single unspliced g3 -> 10+3
      [6,7]       -> [23]           pair collapses to ambiguous 20+3
      [6,9]       -> [3,14]         spliced g3; unspliced g4 (no pair)
      [4,5,8]     -> [22,4]         (4,5) -> ambig g2; 8 -> spliced g4
                                     — ambiguous id PRECEDES the larger
                                     spliced id (unsorted output)
      [1,2]       -> [10,1]         unspliced g0; spliced g1
      [0,1,2,3,5] -> [20,21,12]     two pair-collapses then unspliced g2
      [3,4]       -> [11,2]         odd 3 cannot pair forward with 4
      [2,4]       -> [1,2]          two spliced genes
    """
    import numpy as np

    from alevin_fry_tpu.ops.crlike import CellEqClasses, usa_transform_labels

    cases = [
        ([6], [3]),
        ([7], [13]),
        ([6, 7], [23]),
        ([6, 9], [3, 14]),
        ([4, 5, 8], [22, 4]),
        ([1, 2], [10, 1]),
        ([0, 1, 2, 3, 5], [20, 21, 12]),
        ([3, 4], [11, 2]),
        ([2, 4], [1, 2]),
    ]
    labels = np.asarray(
        [g for lab, _ in cases for g in lab], np.uint32
    )
    offsets = np.zeros(len(cases) + 1, np.int64)
    np.cumsum([len(lab) for lab, _ in cases], out=offsets[1:])
    eqc = CellEqClasses(
        cell_ids=np.zeros(1, np.int64),
        cell_eq_offsets=np.asarray([0, len(cases)], np.int64),
        label_offsets=offsets,
        labels=labels,
        counts=np.ones(len(cases), np.uint32),
    )
    new_offsets, new_labels = usa_transform_labels(eqc, num_rows=30)
    for i, (_lab, want) in enumerate(cases):
        got = new_labels[new_offsets[i]:new_offsets[i + 1]].tolist()
        assert got == want, f"case {i}: {_lab} -> {got}, want {want}"
