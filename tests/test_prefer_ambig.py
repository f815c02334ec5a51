"""Prefer-ambiguity splicing model vs winner-take-all
(resolve_num_molecules_crlike_from_vec_prefer_ambig,
pugutils.rs:505-641): aggregates are per gene-modulo-splicing, and a
winning gene keeps its observed spliced/unspliced variants."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_rna_rad


def _pad_umi(i):
    i = i + 1
    v = 0
    for k in range(4):
        d = (i >> (2 * k)) & 3
        v |= d << (4 * k)
        v |= d << (4 * k + 2)
    return v


def test_prefer_ambig_vs_wta(tmp_path):
    # transcripts: t0=g0-S, t1=g0-U, t2=g1-S, t3=g2-S (padding gene)
    refs = ["t0", "t1", "t2", "t3"]
    CB = "AAAAAAAA"
    U = (3 << 14) | (3 << 12)  # umi far from the pads
    reads = [
        (pack_seq(CB), U, [(0, True)]),   # g0-S
        (pack_seq(CB), U, [(1, True)]),   # g0-U
        (pack_seq(CB), U, [(2, True)]),   # g1-S
        (pack_seq(CB), U, [(2, True)]),   # g1-S again
    ]
    for i in range(97):
        reads.append((pack_seq(CB), _pad_umi(i), [(3, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=8, umi_len=8)
    (tmp_path / "wl.txt").write_text(CB + "\n")
    t2g = tmp_path / "t2g.tsv"
    t2g.write_text("t0\tg0\tS\nt1\tg0\tU\nt2\tg1\tS\nt3\tg2\tS\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")

    def run(sa_model, outdir):
        quantify(QuantOpts(
            input_dir=gpl, tg_map=t2g, output_dir=outdir,
            resolution="cr-like", sa_model=sa_model, cmdline="t",
        ))
        r, c, v, shape = read_matrix_market(outdir / "alevin" / "quants_mat.mtx")
        m = np.zeros(shape)
        m[r, c] = v
        return m[0]

    # columns: [g0, g1, g2, g0-U, g1-U, g2-U, g0-A, g1-A, g2-A]
    wta = run("winner-take-all", tmp_path / "q_wta")
    # per-gene-variant aggregates: g0-S=1, g0-U=1, g1-S=2 -> winner g1-S
    expect_wta = np.zeros(9)
    expect_wta[1] = 1    # g1 spliced
    expect_wta[2] = 97   # padding gene
    np.testing.assert_array_equal(wta, expect_wta)

    pa = run("prefer-ambig", tmp_path / "q_pa")
    # pair aggregates: g0 (S+U) = 2 ties g1 = 2 -> label {g0-S, g0-U,
    # g1-S}: two spliced genes -> UMI dropped under gene-unique counting
    expect_pa = np.zeros(9)
    expect_pa[2] = 97
    np.testing.assert_array_equal(pa, expect_pa)
