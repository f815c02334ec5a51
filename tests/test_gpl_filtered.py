"""Filtered permit-list methods: knee, force-cells, expect-cells,
explicit list (cellfilter.rs:336-480 semantics)."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq, unpack_seq
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.radz import bincodeio
from synth import write_rna_rad

BC_LEN = 8


def _make_rad(tmp_path, cell_counts):
    """cell_counts: list of (barcode str, n_reads)."""
    refs = ["t0"]
    reads = []
    for bc, n in cell_counts:
        for i in range(n):
            reads.append((pack_seq(bc), 7 + 16 * i, [(0, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=BC_LEN, umi_len=6)
    return rad_dir


# well-separated barcodes (pairwise Hamming > 2)
BCS = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT", "ACACACAC", "GTGTGTGT"]


def _freqs(out):
    _bl, k, v = bincodeio.read_permit_freq(out / "permit_freq.bin")
    return dict(zip(k.tolist(), v.tolist()))


def test_force_cells(tmp_path):
    counts = [(b, n) for b, n in zip(BCS, [100, 90, 80, 5, 4, 3])]
    rad = _make_rad(tmp_path, counts)
    out = tmp_path / "out"
    n = generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("force", count=3),
        expected_ori="fw", cmdline="t",
    ))
    f = _freqs(out)
    # top-3 by count
    assert set(f) == {pack_seq(b) for b in BCS[:3]}
    assert n == 3
    assert (out / "all_freq.bin").exists()


def test_explicit_list(tmp_path):
    counts = [(b, n) for b, n in zip(BCS, [100, 90, 80, 5, 4, 3])]
    rad = _make_rad(tmp_path, counts)
    vb = tmp_path / "valid.txt"
    vb.write_text(f"{BCS[1]}\n{BCS[3]}\n")
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("explicit", path=vb),
        expected_ori="fw", cmdline="t",
    ))
    f = _freqs(out)
    assert set(f) == {pack_seq(BCS[1]), pack_seq(BCS[3])}


def test_expect_cells(tmp_path):
    # expect 4 cells: robust_ind = round(4*0.99) = 4 -> freq[4]=4;
    # min_freq = max(1, round(4/10)) = 1 -> all barcodes kept
    counts = [(b, n) for b, n in zip(BCS, [100, 90, 80, 5, 4, 3])]
    rad = _make_rad(tmp_path, counts)
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("expect", count=4),
        expected_ori="fw", cmdline="t",
    ))
    f = _freqs(out)
    assert len(f) == 6


def test_knee_method_e2e(tmp_path):
    big = [(unpack_seq(pack_seq(b), BC_LEN), 500) for b in BCS[:3]]
    # many small background barcodes with distinct values
    small = []
    for i in range(60):
        bc = unpack_seq((i * 2654435761) & ((1 << 16) - 1) | (0b01 << 14), BC_LEN)
        small.append((bc, 1))
    rad = _make_rad(tmp_path, big + small)
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("knee"),
        expected_ori="fw", cmdline="t",
    ))
    f = _freqs(out)
    kept_big = {pack_seq(b) for b in BCS[:3]} & set(f)
    assert len(kept_big) == 3  # the three real cells survive the knee


def test_filtered_one_edit_correction(tmp_path):
    # a mutant barcode 1 substitution from a kept cell folds its counts in
    counts = [("AAAAAAAA", 100), ("AAAAAAAT", 2), ("CCCCCCCC", 90)]
    rad = _make_rad(tmp_path, counts)
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("force", count=2),
        expected_ori="fw", cmdline="t",
    ))
    f = _freqs(out)
    assert f[pack_seq("AAAAAAAA")] == 102
    assert f[pack_seq("CCCCCCCC")] == 90
    mk, mv = bincodeio.read_u64_map_file(out / "permit_map.bin")
    m = dict(zip(mk.tolist(), mv.tolist()))
    assert m[pack_seq("AAAAAAAT")] == pack_seq("AAAAAAAA")


def test_filtered_full_pipeline(tmp_path):
    """force-cells gpl -> collate -> quant end-to-end (the filtered-path
    counterpart of the unfiltered CI flow)."""
    from alevin_fry_tpu.pipeline.collate import collate
    from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
    from alevin_fry_tpu.radz.mtx import read_matrix_market

    counts = [("AAAAAAAA", 20), ("AAAAAAAT", 2), ("CCCCCCCC", 15),
              ("GGGGGGGG", 1)]
    rad = _make_rad(tmp_path, counts)
    (tmp_path / "t2g.tsv").write_text("t0\tg0\n")
    out = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("force", count=2),
        expected_ori="fw", cmdline="t",
    ))
    collate(out, rad, cmdline="t")
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=out, tg_map=tmp_path / "t2g.tsv", output_dir=qdir,
        resolution="cr-like", cmdline="t",
    ))
    rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text().splitlines()
    assert rows == ["AAAAAAAA", "CCCCCCCC"]
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    import numpy as np

    m = np.zeros(shape)
    m[r, c] = v
    # the 2 corrected AAAAAAAT reads carry UMIs already present in
    # AAAAAAAA (same generator), so they deduplicate: 20 molecules
    np.testing.assert_array_equal(m, [[20], [15]])


def test_version_gate(tmp_path):
    """collate rejects artifacts from an incompatible stage version."""
    import json

    import pytest

    from alevin_fry_tpu.pipeline.collate import collate

    counts = [("AAAAAAAA", 5)]
    rad = _make_rad(tmp_path, counts)
    out = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad, output_dir=out,
        fmeth=CellFilterMethod("force", count=1),
        expected_ori="fw", cmdline="t",
    ))
    meta = json.loads((out / "generate_permit_list.json").read_text())
    meta["version_str"] = "0.1.0"
    (out / "generate_permit_list.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="regenerate"):
        collate(out, rad, cmdline="t")
