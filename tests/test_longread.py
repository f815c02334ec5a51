"""Long-read scRNA tests: record sniffing, probability models, and the
probability-weighted parsimony/EM path."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import (
    QuantOpts, _longread_aln_probs, quantify,
)
from alevin_fry_tpu.radz import KnownRecordType, read_prelude, record_type_from_prelude
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_longread_rad

BC_LEN = 8
UMI_LEN = 8


def _pad_umi(i):
    i = i + 1
    v = 0
    for k in range(4):
        d = (i >> (2 * k)) & 3
        v |= d << (4 * k)
        v |= d << (4 * k + 2)
    return v


def test_longread_sniffing(tmp_path):
    refs = ["t0"]
    write_longread_rad(
        tmp_path / "map.rad", refs,
        [[(pack_seq("AAAAAAAA"), 0, [(0, True, 10, 0, 900, 1000)])]],
        bc_len=BC_LEN, umi_len=UMI_LEN,
    )
    with open(tmp_path / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        rec_type, info = record_type_from_prelude(prelude, ftm)
    assert rec_type == KnownRecordType.RNA_LONG
    assert info["bc_len"] == BC_LEN


def test_aln_prob_model():
    """score model exp((AS-max)/5), end model with the 100bp threshold
    and 1e-3 floor (eq_class.rs:20-85), normalized per read."""
    sub = {
        "offs": np.asarray([0, 2], np.int64),
        "aln_cols": {
            "as": np.asarray([20, 10], np.uint64),
            "end": np.asarray([1000, 500], np.uint64),
            "tlen": np.asarray([1000, 1000], np.uint64),
        },
    }
    p = _longread_aln_probs(sub)
    # aln0: score 1.0, end dist 0 -> w=1; aln1: score e^-2, dist 500 ->
    # extra 400 -> ln_w = -400^2/(2*10^4) = -8 < ln(1e-3) -> floored 1e-3
    s1 = np.exp(-2.0) * 1e-3
    expect = np.asarray([1.0, s1])
    expect /= expect.sum()
    np.testing.assert_allclose(p, expect, rtol=1e-6)


def _dataset(tmp_path):
    """Cell with an ambiguous eqclass whose probabilities strongly favor
    t1 over t0 — weighted parsimony/EM should follow the probabilities."""
    refs = ["t0", "t1", "t2"]
    CB = "AAAAAAAA"
    reads = []
    # 5 gene-unique molecules on t1 (gene g1)
    for i in range(5):
        reads.append((pack_seq(CB), _pad_umi(50 + i),
                      [(1, True, 10, 0, 1000, 1000)]))
    # 3 ambiguous molecules {t0,t1} whose AS strongly favors t1
    for i in range(3):
        reads.append((pack_seq(CB), _pad_umi(100 + i), [
            (0, True, 0, 0, 1000, 1000),    # low score on t0
            (1, True, 40, 0, 1000, 1000),   # high score on t1
        ]))
    # pad reads on t2 to exceed the small-cell threshold
    for i in range(95):
        reads.append((pack_seq(CB), _pad_umi(i),
                      [(2, True, 10, 0, 1000, 1000)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_longread_rad(rad_dir / "map.rad", refs, [reads],
                       bc_len=BC_LEN, umi_len=UMI_LEN)
    (tmp_path / "wl.txt").write_text(CB + "\n")
    (tmp_path / "t2g.tsv").write_text("t0\tg0\nt1\tg1\nt2\tg2\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    return gpl, tmp_path / "t2g.tsv"


def test_longread_parsimony_em(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=qdir,
        resolution="parsimony-em", pug_exact_umi=False, cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    m = np.zeros(shape)
    m[r, c] = v
    # the probability-weighted EM sends the 3 ambiguous molecules to g1
    assert m[0, 1] > 7.5, m
    assert m[0, 0] < 0.5, m
    assert abs(m[0].sum() - 103) < 0.2


def test_longread_parsimony_unique_only(tmp_path):
    gpl, t2g = _dataset(tmp_path)
    qdir = tmp_path / "q2"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=qdir,
        resolution="parsimony", pug_exact_umi=False, cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    m = np.zeros(shape)
    m[r, c] = v
    # gene-ambiguous molecules dropped without EM
    np.testing.assert_array_equal(m, [[0, 5, 95]])
