"""End-to-end gpl -> collate -> quant tests on synthetic RNA data.

Mirrors the reference CI smoke recipe (unfiltered-pl -> collate ->
quant cr-like, .github/workflows/rust.yml:51-81) with hand-computed
expected counts.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod,
    GenPermitListOpts,
    generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_rna_rad

BC_LEN = 8
UMI_LEN = 6


def bc(s):
    return pack_seq(s)


def make_dataset(tmp_path: Path):
    """Three true cells; reads designed to exercise exact match, 1-edit
    rescue, strand filtering and multi-gene UMIs."""
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    refs = [f"tx_{i}" for i in range(6)]  # tx_i -> gene g_{i//2}

    CB1, CB2, CB3 = "AAAAAAAA", "CCCCCCCC", "GGGGGGGG"
    CB1_mut = "AAAAAAAT"  # 1 substitution from CB1 -> rescued
    FAR = "ACGTACGT"      # no neighbor -> dropped

    reads = []
    # cell 1: 3 umis, umi1 seen twice mapping uniquely to tx_0 (gene 0)
    reads.append((bc(CB1), bc("AAAAAA"), [(0, True)]))
    reads.append((bc(CB1), bc("AAAAAA"), [(0, True)]))
    # umi2 multi-maps tx_2, tx_3 (both gene 1) -> unique gene
    reads.append((bc(CB1), bc("AAAACC"), [(2, True), (3, True)]))
    # umi3 ties gene 0 and gene 2 -> discarded under cr-like (non-USA)
    reads.append((bc(CB1), bc("AAGGGG"), [(0, True), (4, True)]))
    # rescued read for cell 1 (1-edit barcode), gene 2
    reads.append((bc(CB1_mut), bc("TTTTTT"), [(4, True)]))
    # cell 2: two umis on gene 1 and gene 2
    reads.append((bc(CB2), bc("CCCCCC"), [(2, True)]))
    reads.append((bc(CB2), bc("CCCCCA"), [(5, True)]))
    # reverse-strand-only read: dropped when expected_ori is fw
    reads.append((bc(CB2), bc("CCCCAA"), [(2, False)]))
    # cell 3: below min_reads (1 read) -> recycled + no unique neighbor
    reads.append((bc(CB3), bc("GGGGGG"), [(1, True)]))
    # unknown barcode far from everything -> dropped
    reads.append((bc(FAR), bc("ACACAC"), [(0, True)]))

    # split into two chunks
    write_rna_rad(rad_dir / "map.rad", refs, [reads[:5], reads[5:]],
                  bc_len=BC_LEN, umi_len=UMI_LEN)

    wl = tmp_path / "permit.txt"
    wl.write_text(f"{CB1}\n{CB2}\n{CB3}\n")

    t2g = tmp_path / "t2g.tsv"
    with open(t2g, "w") as fh:
        for i in range(6):
            fh.write(f"tx_{i}\tg_{i // 2}\n")
    return rad_dir, wl, t2g


def test_gpl_unfiltered(tmp_path):
    rad_dir, wl, _ = make_dataset(tmp_path)
    out = tmp_path / "gpl"
    opts = GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="test",
    )
    n = generate_permit_list(opts)
    assert n == 1  # one rescued barcode (CB1_mut)

    from alevin_fry_tpu.radz import bincodeio

    bclen, keys, vals = bincodeio.read_permit_freq(out / "permit_freq.bin")
    assert bclen == BC_LEN
    freq = dict(zip(keys.tolist(), vals.tolist()))
    # CB1: 4 strand-compatible exact reads + 1 rescued = 5
    assert freq[pack_seq("AAAAAAAA")] == 5
    # CB2: 2 fw reads (the rc-only read filtered out)
    assert freq[pack_seq("CCCCCCCC")] == 2
    # CB3 below min_reads -> not kept
    assert pack_seq("GGGGGGGG") not in freq

    mk, mv = bincodeio.read_u64_map_file(out / "permit_map.bin")
    m = dict(zip(mk.tolist(), mv.tolist()))
    assert m[pack_seq("AAAAAAAT")] == pack_seq("AAAAAAAA")
    assert m[pack_seq("AAAAAAAA")] == pack_seq("AAAAAAAA")

    meta = json.loads((out / "generate_permit_list.json").read_text())
    assert meta["permit-list-type"] == "unfiltered"
    assert meta["expected_ori"] == "+"


def test_gpl_unfiltered_device_rescue_identity(tmp_path, monkeypatch):
    """The device rescue backend produces byte-identical permit
    artifacts to the host path (VERDICT round-1 item 2)."""
    rad_dir, wl, _ = make_dataset(tmp_path)
    outs = {}
    for mode in ("host", "jax"):
        monkeypatch.setenv("AFT_RESCUE_BACKEND", mode)
        out = tmp_path / f"gpl_{mode}"
        generate_permit_list(GenPermitListOpts(
            input_dir=rad_dir, output_dir=out,
            fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
            expected_ori="fw", cmdline="test",
        ))
        outs[mode] = out
    for name in ("permit_freq.bin", "permit_map.bin"):
        assert (
            (outs["host"] / name).read_bytes() == (outs["jax"] / name).read_bytes()
        ), name


@pytest.fixture()
def quant_ready(tmp_path):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    out = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="test",
    ))
    collate(out, rad_dir, num_threads=2, cmdline="test")
    return out, t2g, tmp_path


def test_collate(quant_ready):
    out, _t2g, _tmp = quant_ready
    from alevin_fry_tpu.radz import read_prelude
    from alevin_fry_tpu.radz.chunkio import decode_all_chunks
    from alevin_fry_tpu.radz.records import RecordSchema

    with open(out / "map.collated.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        assert prelude.hdr.num_chunks == 2  # two surviving cells
        schema = RecordSchema.from_prelude(prelude)
        batch = decode_all_chunks(fh, schema, prelude.hdr.num_chunks)
    # cells ordered by descending read count: CB1 (5 reads), CB2 (2)
    assert batch.n_reads == 7
    cells = np.diff(batch.chunk_offsets)
    np.testing.assert_array_equal(cells, [5, 2])
    # every read in a chunk has the (corrected) chunk barcode
    b = batch.barcode()
    assert set(b[:5].tolist()) == {pack_seq("AAAAAAAA")}
    assert set(b[5:].tolist()) == {pack_seq("CCCCCCCC")}
    cmeta = json.loads((out / "collate.json").read_text())
    assert cmeta["compressed_output"] is False


def test_quant_crlike(quant_ready):
    out, t2g, tmp = quant_ready
    qdir = tmp / "quant"
    quantify(QuantOpts(
        input_dir=out, tg_map=t2g, output_dir=qdir, resolution="cr-like",
        cmdline="test",
    ))
    rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text().splitlines()
    cols = (qdir / "alevin" / "quants_mat_cols.txt").read_text().splitlines()
    assert rows == ["AAAAAAAA", "CCCCCCCC"]
    assert cols == ["g_0", "g_1", "g_2"]
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    assert shape == (2, 3)
    mat = np.zeros(shape)
    mat[r, c] = v
    # cell 1 (<100 reads -> fast path): umi AAAAAA -> g0 (2 reads),
    # umi AAAACC -> g1 (tx2+tx3 same gene), umi AAGGGG ties g0/g2 ->
    # discarded, rescued read TTTTTT -> g2.
    np.testing.assert_array_equal(mat[0], [1, 1, 1])
    # cell 2: one umi g1, one umi g2
    np.testing.assert_array_equal(mat[1], [0, 1, 1])

    fd = (qdir / "featureDump.txt").read_text().splitlines()
    assert fd[0].startswith("CB\tCorrectedReads")
    assert len(fd) == 3
    row1 = fd[1].split("\t")
    assert row1[0] == "AAAAAAAA"
    assert row1[1] == "5" and row1[2] == "5"  # corrected, mapped
    assert row1[3] == "3"  # deduplicated (3 umis counted)

    meta = json.loads((qdir / "quant.json").read_text())
    assert meta["usa_mode"] is False
    assert meta["num_genes"] == 3
    assert meta["resolution_strategy"] == "CellRangerLike"


def test_quant_crlike_usa(quant_ready):
    out, _t2g, tmp = quant_ready
    # 3-column t2g: tx_0..3 spliced, tx_4,5 unspliced of g_2... make
    # gene 0 have spliced+unspliced transcripts to exercise ambiguity
    t2g3 = tmp / "t2g3.tsv"
    with open(t2g3, "w") as fh:
        fh.write("tx_0\tg_0\tS\n")
        fh.write("tx_1\tg_0\tU\n")
        fh.write("tx_2\tg_1\tS\n")
        fh.write("tx_3\tg_1\tU\n")
        fh.write("tx_4\tg_2\tS\n")
        fh.write("tx_5\tg_2\tU\n")
    qdir = tmp / "quant_usa"
    quantify(QuantOpts(
        input_dir=out, tg_map=t2g3, output_dir=qdir, resolution="cr-like",
        cmdline="test",
    ))
    cols = (qdir / "alevin" / "quants_mat_cols.txt").read_text().splitlines()
    assert cols == ["g_0", "g_1", "g_2", "g_0-U", "g_1-U", "g_2-U",
                    "g_0-A", "g_1-A", "g_2-A"]
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    assert shape == (2, 9)
    mat = np.zeros(shape)
    mat[r, c] = v
    # cell 1: umi AAAAAA -> {g0-S} spliced slot 0;
    # umi AAAACC -> tx2(g1-S), tx3(g1-U) -> same gene S+U -> ambiguous g1;
    # umi AAGGGG -> tx0(g0-S) + tx4(g2-S): two spliced genes -> dropped;
    # umi TTTTTT -> tx4 -> g2-S.
    expect1 = np.zeros(9)
    expect1[0] = 1      # g_0 spliced
    expect1[7] = 1      # g_1 ambiguous
    expect1[2] = 1      # g_2 spliced
    np.testing.assert_array_equal(mat[0], expect1)
    # cell 2: umi CCCCCC -> tx2 -> g1-S; umi CCCCCA -> tx5 -> g2-U
    expect2 = np.zeros(9)
    expect2[1] = 1
    expect2[5] = 1
    np.testing.assert_array_equal(mat[1], expect2)
    meta = json.loads((qdir / "quant.json").read_text())
    assert meta["usa_mode"] is True
    assert meta["num_genes"] == 9

    # the USA-mode device WTA (AFT_CRLIKE_BACKEND=jax) produces the
    # byte-identical matrix at the pipeline surface
    import os

    qdev = tmp / "quant_usa_dev"
    os.environ["AFT_CRLIKE_BACKEND"] = "jax"
    try:
        quantify(QuantOpts(
            input_dir=out, tg_map=t2g3, output_dir=qdev,
            resolution="cr-like", cmdline="test",
        ))
    finally:
        os.environ.pop("AFT_CRLIKE_BACKEND", None)
    assert (
        (qdev / "alevin" / "quants_mat.mtx").read_bytes()
        == (qdir / "alevin" / "quants_mat.mtx").read_bytes()
    )
