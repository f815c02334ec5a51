"""Multi-barcode (10x Flex) pipeline tests — Python ports of the
reference integration tests (tests/multi_barcode_integration.rs)."""

import json

import numpy as np

from alevin_fry_tpu.ops.barcodes import unpack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from synth import make_packed_bc, write_multi_bc_rad

SAMPLE_BC_LEN = 8
CELL_BC_LEN = 16
UMI_LEN = 12
NUM_REFS = 10


def _write_sample_list(path, entries):
    with open(path, "w") as fh:
        for name, bc in entries:
            fh.write(f"{unpack_seq(bc, SAMPLE_BC_LEN)}\t{name}\n")


def _write_t2g(path):
    with open(path, "w") as fh:
        for i in range(NUM_REFS):
            fh.write(f"gene_{i}\tgene_{i}\n")


def test_multi_bc_generate_permit_list(tmp_path):
    """Port of test_multi_bc_generate_permit_list (:337-427)."""
    refs = [f"gene_{i}" for i in range(NUM_REFS)]
    sample_bcs = [make_packed_bc(100, SAMPLE_BC_LEN), make_packed_bc(200, SAMPLE_BC_LEN)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_multi_bc_rad(rad_dir / "map.rad", refs, 2, 5, 10, sample_bcs)
    slist = tmp_path / "samples.tsv"
    with open(slist, "w") as fh:
        for bc in sample_bcs:
            fh.write(unpack_seq(bc, SAMPLE_BC_LEN) + "\n")
    out = tmp_path / "out"
    n = generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("force", count=5),
        expected_ori="both", cmdline="test",
        sample_bc_list=slist,
    ))
    assert n > 0
    assert (out / "sample_permit_map.bin").exists()
    assert (out / "sample_info.json").exists()
    assert (out / "generate_permit_list.json").exists()
    info = json.loads((out / "sample_info.json").read_text())
    assert info["num_samples"] == 2
    assert info["num_barcodes"] == 2
    assert info["matched_reads"] > 0
    for entry in info["samples"]:
        if entry["num_cells"] > 0:
            sdir = out / f"sample_{entry['name']}"
            assert (sdir / "permit_map.bin").exists()
            assert (sdir / "permit_freq.bin").exists()


def _run_full(tmp_path, used_positions, all_entries, cells_per_sample=4,
              reads_per_cell=8):
    refs = [f"gene_{i}" for i in range(NUM_REFS)]
    used_bcs = [all_entries[p][1] for p in used_positions]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_multi_bc_rad(
        rad_dir / "map.rad", refs, len(used_bcs), cells_per_sample,
        reads_per_cell, used_bcs, share_cell_barcodes=True,
    )
    slist = tmp_path / "samples.tsv"
    _write_sample_list(slist, all_entries)
    t2g = tmp_path / "t2g.tsv"
    _write_t2g(t2g)
    out = tmp_path / "out"
    total = generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("force", count=cells_per_sample),
        expected_ori="both", cmdline="test",
        sample_bc_list=slist,
    ))
    assert total == len(used_bcs) * cells_per_sample
    collate(out, rad_dir, num_threads=2, cmdline="test")
    qdir = tmp_path / "quant"
    quantify(QuantOpts(
        input_dir=out, tg_map=t2g, output_dir=qdir,
        resolution="trivial", cmdline="test",
    ))
    return out, qdir


def test_multi_bc_collate_and_quant_preserve_sample_cell_identity(tmp_path):
    """Port of the shared-cell-barcode identity test (:429-543)."""
    entries = [
        ("sample_a", make_packed_bc(100, SAMPLE_BC_LEN)),
        ("sample_b", make_packed_bc(200, SAMPLE_BC_LEN)),
    ]
    out, qdir = _run_full(tmp_path, [0, 1], entries)

    from alevin_fry_tpu.radz import read_prelude

    with open(out / "map.collated.rad", "rb") as fh:
        prelude, _ftm, _ = read_prelude(fh)
    assert prelude.hdr.num_chunks == 2 * 4

    rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text().splitlines()
    assert len(rows) == 8
    assert len(set(rows)) == 8  # shared cell BCs stay distinct via prefix
    assert any(r.startswith("sample_a_") for r in rows)
    assert any(r.startswith("sample_b_") for r in rows)


def test_multi_bc_sparse_sample_positions(tmp_path):
    """Port of the simpleaf#195 regression (:570-777): 8-entry plate,
    only wells {0, 3, 7} used; featureDump must have 10 fields per row
    and all three sample names must appear."""
    entries = [
        (f"sample_{i:02d}", make_packed_bc(100 + i * 37, SAMPLE_BC_LEN))
        for i in range(8)
    ]
    used = [0, 3, 7]
    out, qdir = _run_full(tmp_path, used, entries)

    fd = (qdir / "featureDump.txt").read_text().splitlines()
    field_counts = {len(l.split("\t")) for l in fd}
    assert field_counts == {10}, f"field counts seen: {field_counts}"
    assert len(fd) - 1 == len(used) * 4

    rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text().splitlines()
    assert len(rows) == len(used) * 4
    expected_names = {f"sample_{p:02d}" for p in used}
    for n in expected_names:
        assert any(r.startswith(n + "_") for r in rows), f"missing {n}"
    observed = {l.split("\t")[1] for l in fd[1:]}
    assert observed == expected_names


def test_collation_manifest_roundtrip(tmp_path):
    """Port of test_collation_manifest_roundtrip (:1017-1049)."""
    from alevin_fry_tpu.radz.collation import CollationManifest, SampleGroup

    p = tmp_path / "collation_manifest.bin"
    m = CollationManifest(["sample", "cell"])
    m.add_sample_group(SampleGroup(0x1234, "sample_A", 0, 100, 50000))
    m.add_sample_group(SampleGroup(0x5678, "sample_B", 100, 80, 40000))
    m.write_to_file(p)
    r = CollationManifest.read_from_file(p)
    assert len(r.levels) == 2
    assert len(r.sample_groups) == 2
    assert r.sample_groups[0].name == "sample_A"
    assert r.sample_groups[1].num_chunks == 80
    assert r.total_chunks() == 180
    assert r.total_records() == 90000

    # Exact bincode-1.x fixint byte layout (libradicl serializes its
    # sidecars with bincode's default config; struct field order from
    # collate.rs:1908-1914).
    import struct

    expect = b"".join(
        [
            struct.pack("<Q", 2),
            struct.pack("<Q", 6), b"sample",
            struct.pack("<Q", 4), b"cell",
            struct.pack("<Q", 2),
            struct.pack("<Q", 0x1234), b"\x01",
            struct.pack("<Q", 8), b"sample_A",
            struct.pack("<QQQ", 0, 100, 50000),
            struct.pack("<Q", 0x5678), b"\x01",
            struct.pack("<Q", 8), b"sample_B",
            struct.pack("<QQQ", 100, 80, 40000),
        ]
    )
    assert p.read_bytes() == expect


def test_unmapped_sidecar_bincode_layout(tmp_path):
    """unmapped_bc_count_collated.bin is bincode HashMap<u64,u32> for
    single-barcode data — the layout the reference's own ATAC collate
    writes for the same filename (atac/collate.rs:255-260) — and
    bincode HashMap<(u64,u64),u32> for multi-barcode keys."""
    import struct

    import numpy as np

    from alevin_fry_tpu.radz import unmapped as unmappedio

    p = tmp_path / "unmapped_bc_count_collated.bin"
    unmappedio.write_collated_single(
        p, np.array([7, 3], np.uint64), np.array([10, 20], np.uint32)
    )
    # sorted by key: (3,20), (7,10)
    assert p.read_bytes() == (
        struct.pack("<Q", 2)
        + struct.pack("<QI", 3, 20)
        + struct.pack("<QI", 7, 10)
    )
    bcs, cts, nf = unmappedio.read_collated(p)
    assert nf == 1 and list(bcs) == [3, 7] and list(cts) == [20, 10]

    pm = tmp_path / "multi.bin"
    unmappedio.write_collated_multi(
        pm,
        np.array([1, 1], np.uint64),
        np.array([9, 4], np.uint64),
        np.array([5, 6], np.uint32),
    )
    assert pm.read_bytes() == (
        struct.pack("<Q", 2)
        + struct.pack("<QQI", 1, 4, 6)
        + struct.pack("<QQI", 1, 9, 5)
    )
    bcs, cts, nf = unmappedio.read_collated(pm)
    assert nf == 2 and list(bcs) == [4, 9] and list(cts) == [6, 5]

    # legacy raw pairs (no length prefix) still sniffed correctly
    pl = tmp_path / "legacy.bin"
    pl.write_bytes(struct.pack("<QI", 11, 2) + struct.pack("<QI", 12, 3))
    bcs, cts = unmappedio.read_raw_unmapped(pl)
    assert list(bcs) == [11, 12] and list(cts) == [2, 3]


def test_sample_names_file_override(tmp_path):
    """--sample-names maps barcodes to human-readable names
    (main.rs:136-139)."""
    refs = [f"gene_{i}" for i in range(NUM_REFS)]
    sample_bcs = [make_packed_bc(100, SAMPLE_BC_LEN), make_packed_bc(200, SAMPLE_BC_LEN)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_multi_bc_rad(rad_dir / "map.rad", refs, 2, 3, 6, sample_bcs)
    slist = tmp_path / "samples.txt"
    with open(slist, "w") as fh:
        for bc in sample_bcs:
            fh.write(unpack_seq(bc, SAMPLE_BC_LEN) + "\n")
    names = tmp_path / "names.tsv"
    with open(names, "w") as fh:
        fh.write(f"{unpack_seq(sample_bcs[0], SAMPLE_BC_LEN)}\twellA\n")
        fh.write(f"{unpack_seq(sample_bcs[1], SAMPLE_BC_LEN)}\twellB\n")
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("force", count=3),
        expected_ori="both", cmdline="t",
        sample_bc_list=slist, sample_names=names,
    ))
    info = json.loads((out / "sample_info.json").read_text())
    assert {e["name"] for e in info["samples"]} == {"wellA", "wellB"}
    assert (out / "sample_wellA" / "permit_freq.bin").exists()


def test_multi_bc_out_of_core_matches_in_memory(tmp_path):
    """Multi-BC collation above --max-records scatters to rank-range
    spill buckets (the reference's TempBucket plan, collate.rs:1413-1480)
    and must produce byte-identical collated RAD + manifest."""
    entries = [
        ("sample_a", make_packed_bc(100, SAMPLE_BC_LEN)),
        ("sample_b", make_packed_bc(200, SAMPLE_BC_LEN)),
    ]
    refs = [f"gene_{i}" for i in range(NUM_REFS)]
    used_bcs = [e[1] for e in entries]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_multi_bc_rad(
        rad_dir / "map.rad", refs, 2, 5, 9, used_bcs,
        share_cell_barcodes=True,
    )
    slist = tmp_path / "samples.tsv"
    _write_sample_list(slist, entries)
    out = tmp_path / "out"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=out,
        fmeth=CellFilterMethod("force", count=5),
        expected_ori="both", cmdline="test", sample_bc_list=slist,
    ))

    collate(out, rad_dir, num_threads=2, cmdline="test")
    in_mem = (out / "map.collated.rad").read_bytes()
    manifest_mem = (out / "collation_manifest.bin").read_bytes()

    collate(out, rad_dir, num_threads=2, cmdline="test", max_records=11)
    assert not (out / "_collate_tmp").exists()
    assert (out / "map.collated.rad").read_bytes() == in_mem
    assert (out / "collation_manifest.bin").read_bytes() == manifest_mem

    # two-round mode through the spill path too
    collate(out, rad_dir, num_threads=2, cmdline="test",
            collation_mode="two-round")
    tr_mem = (out / "map.collated.rad").read_bytes()
    collate(out, rad_dir, num_threads=2, cmdline="test", max_records=11,
            collation_mode="two-round")
    assert (out / "map.collated.rad").read_bytes() == tr_mem


def test_two_round_collation_matches_fast(tmp_path):
    """The two-round mode (collate.rs:1977-2475) corrects cells through
    the per-sample gpl permit_map.bin; on data whose noisy barcodes all
    have a unique 1-edit representative, the fast mode's tiered search
    makes the same corrections, so the collated file, manifest and
    downstream quant must agree.  Also checks the two-round collate.json
    records its mode (collate.rs:2447-2454)."""
    entries = [
        ("sample_a", make_packed_bc(100, SAMPLE_BC_LEN)),
        ("sample_b", make_packed_bc(200, SAMPLE_BC_LEN)),
    ]
    out, qdir = _run_full(tmp_path, [0, 1], entries)
    fast_bytes = (out / "map.collated.rad").read_bytes()
    fast_manifest = (out / "collation_manifest.bin").read_bytes()
    fast_mtx = (qdir / "alevin" / "quants_mat.mtx").read_bytes()
    fast_rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text()

    collate(out, tmp_path / "rad", num_threads=2, cmdline="test",
            collation_mode="two-round")
    cmeta = json.loads((out / "collate.json").read_text())
    assert cmeta["collation_mode"] == "two-round"
    assert (out / "map.collated.rad").read_bytes() == fast_bytes
    assert (out / "collation_manifest.bin").read_bytes() == fast_manifest

    qdir2 = tmp_path / "quant2"
    quantify(QuantOpts(
        input_dir=out, tg_map=tmp_path / "t2g.tsv", output_dir=qdir2,
        resolution="trivial", cmdline="test",
    ))
    assert (qdir2 / "alevin" / "quants_mat.mtx").read_bytes() == fast_mtx
    assert (qdir2 / "alevin" / "quants_mat_rows.txt").read_text() == fast_rows
