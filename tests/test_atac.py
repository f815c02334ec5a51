"""ATAC pipeline tests: gpl (bin histogram) -> collate -> sort / dedup."""

import json

import numpy as np

from alevin_fry_tpu.cli import main
from alevin_fry_tpu.ops.barcodes import pack_seq, revcomp_packed, unpack_seq
from synth import write_atac_rad

BC_LEN = 8


def _dataset(tmp_path):
    refs = ["chr1", "chr2"]
    ref_lens = [250_000, 150_000]  # 3 bins + 2 bins
    CB1, CB2 = "AAAAAAAA", "CCCCCCCC"
    CB1_mut = "AAAAAAAT"
    chunks = [[
        # cell1: duplicate fragment (x2), one long fragment, one multimapped
        (pack_seq(CB1), [(0, 4, 1000, 150)]),
        (pack_seq(CB1), [(0, 4, 1000, 150)]),
        (pack_seq(CB1), [(1, 4, 120_000, 3000)]),   # >= 2000 -> not written
        (pack_seq(CB1), [(0, 4, 5, 70), (1, 4, 9, 70)]),  # multimapped
        (pack_seq(CB1_mut), [(0, 4, 220_000, 90)]),  # 1-edit rescue
        # cell2
        (pack_seq(CB2), [(1, 4, 50, 100)]),
        (pack_seq(CB2), [(0, 2, 700, 80)]),          # non-proper (type != 4)
    ]]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=BC_LEN)
    # whitelist given in reverse-complement orientation (default rc mode)
    wl = tmp_path / "wl.txt"
    rc1 = unpack_seq(int(revcomp_packed(np.asarray([pack_seq(CB1)], np.uint64), BC_LEN)[0]), BC_LEN)
    rc2 = unpack_seq(int(revcomp_packed(np.asarray([pack_seq(CB2)], np.uint64), BC_LEN)[0]), BC_LEN)
    wl.write_text(f"{rc1}\n{rc2}\n")
    return rad_dir, wl, CB1, CB2


def test_atac_full_pipeline(tmp_path):
    rad_dir, wl, CB1, CB2 = _dataset(tmp_path)
    gpl = tmp_path / "gpl"
    assert main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "rc",
    ]) == 0
    meta = json.loads((gpl / "generate_permit_list.json").read_text())
    assert meta["permit-list-type"] == "unfiltered"
    assert meta["gpl_options"]["rc"] is True
    assert meta["num-chunks"] == 1
    # bin histogram: uniquely-mapped reads only (6 of 7)
    from alevin_fry_tpu.radz import bincodeio

    bins = bincodeio.read_u64_vec_file(gpl / "bin_recs.bin")
    blens = bincodeio.read_u64_vec_file(gpl / "bin_lens.bin")
    np.testing.assert_array_equal(blens, [0, 3, 5])
    # chr1 bin 0: pos 1000 x2 + pos 700 = 3; chr1 bin 2: rescue read at
    # 220000; chr2 bin 0 (idx 3): pos 50; chr2 bin 1 (idx 4): 120000
    np.testing.assert_array_equal(bins, [3, 0, 1, 1, 1])
    assert meta["max-rec-in-bin"] == 3

    assert main([
        "atac", "collate", "-i", str(gpl), "-r", str(rad_dir), "-t", "2",
    ]) == 0
    from alevin_fry_tpu.radz import read_prelude
    from alevin_fry_tpu.radz.chunkio import decode_all_chunks
    from alevin_fry_tpu.radz.records import RecordSchema

    with open(gpl / "map.collated.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        batch = decode_all_chunks(
            fh, RecordSchema.from_prelude(prelude), prelude.hdr.num_chunks
        )
    assert prelude.hdr.num_chunks == 2
    np.testing.assert_array_equal(np.diff(batch.chunk_offsets), [5, 2])

    # dedup over the collated file
    assert main(["atac", "deduplicate", "-i", str(gpl), "-d", "rc"]) == 0
    bed = (gpl / "map.bed").read_text().splitlines()
    # proper unique pairs: cell1 {1000x2 dup, 3000-long (dropped), rescue},
    # cell2 {50}; long fragment excluded from BED
    assert len(bed) == 3
    # barcodes written reverse-complemented (rc mode)
    rc_cb1 = bed[0].split("\t")[3]
    assert rc_cb1 == "TTTTTTTT"  # revcomp of AAAAAAAA
    row0 = bed[0].split("\t")
    assert row0[:3] == ["chr1", "1000", "1150"] and row0[4] == "2"

    # sort path over the original RAD
    assert main([
        "atac", "sort", "-i", str(gpl), "-r", str(rad_dir), "-t", "2",
    ]) == 0
    sbed = (gpl / "map.bed").read_text().splitlines()
    # sort ignores map_type (keeps non-proper) but drops multimapped;
    # fragments: chr1:1000x2, chr1:220000 (rescued), chr1:700, chr2:50,
    # chr2:120000(3000bp dropped)
    assert len(sbed) == 4
    cols = [l.split("\t") for l in sbed]
    assert [c[0] for c in cols] == ["chr1", "chr1", "chr1", "chr2"]
    assert cols[0][1] == "700"      # globally coordinate-sorted
    assert cols[1][1] == "1000" and cols[1][4] == "2"
    assert cols[2][1] == "220000"
    assert cols[3][1] == "50"


def _random_dataset(tmp_path, n_reads=3000, seed=0):
    """Random ATAC dataset spanning many genomic bins, two cells of
    which one needs 1-edit rescue."""
    rng = np.random.RandomState(seed)
    refs = ["chr1", "chr2", "chr3"]
    ref_lens = [900_000, 500_000, 300_000]
    CB = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG"]
    reads = []
    for _ in range(n_reads):
        bc = CB[rng.randint(3)]
        ref = rng.randint(3)
        pos = int(rng.randint(ref_lens[ref] - 3000))
        flen = int(rng.randint(30, 2500))
        if rng.rand() < 0.05:  # some multimapped (dropped by sort)
            alns = [(ref, 4, pos, flen), ((ref + 1) % 3, 4, pos + 7, flen)]
        else:
            alns = [(ref, 4, pos, flen)]
        reads.append((pack_seq(bc), alns))
    # duplicate ~10% of fragments
    for i in rng.choice(n_reads, n_reads // 10, replace=False):
        reads.append(reads[int(i)])
    chunks = [reads[i : i + 500] for i in range(0, len(reads), 500)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=BC_LEN)
    wl = tmp_path / "wl.txt"
    rcs = [
        unpack_seq(int(revcomp_packed(np.asarray([pack_seq(c)], np.uint64), BC_LEN)[0]), BC_LEN)
        for c in CB
    ]
    wl.write_text("".join(r + "\n" for r in rcs))
    return rad_dir, wl


def test_atac_sort_out_of_core_matches_in_memory(tmp_path):
    """Sorting with max_records smaller than the dataset scatters to
    genomic-bin spill buckets (atac/sort.rs:484-512) and produces
    byte-identical BED output to the single-bucket in-memory path."""
    from alevin_fry_tpu.atac.sort import sort as atac_sort

    rad_dir, wl = _random_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    assert main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "rc",
    ]) == 0

    atac_sort(gpl, rad_dir, num_threads=2, max_records=10_000_000)
    in_mem = (gpl / "map.bed").read_bytes()
    assert len(in_mem) > 0

    atac_sort(gpl, rad_dir, num_threads=2, max_records=300)
    assert not (gpl / "_sort_tmp").exists()
    assert (gpl / "map.bed").read_bytes() == in_mem

    # compressed output round-trips to the same bytes
    atac_sort(gpl, rad_dir, num_threads=2, max_records=300, compress_out=True)
    import gzip

    assert gzip.open(gpl / "map.bed.gz", "rb").read() == in_mem


def test_atac_compressed_collate_dedup_matches_uncompressed(tmp_path):
    """collate --compress writes map.collated.rad.sz (real snappy
    frames) and deduplicate streams it to the same BED bytes as the
    uncompressed path (atac/collate.rs + deduplicate.rs over .sz)."""
    rad_dir, wl = _random_dataset(tmp_path, n_reads=800, seed=5)

    beds = {}
    for label, flags in (("plain", []), ("sz", ["-c"])):
        gpl = tmp_path / f"gpl_{label}"
        assert main([
            "atac", "generate-permit-list", "-i", str(rad_dir),
            "-o", str(gpl), "-u", str(wl), "-m", "1", "-d", "rc",
        ]) == 0
        assert main([
            "atac", "collate", "-i", str(gpl), "-r", str(rad_dir),
            "-t", "2", *flags,
        ]) == 0
        assert main(["atac", "deduplicate", "-i", str(gpl), "-d", "rc"]) == 0
        beds[label] = (gpl / "map.bed").read_bytes()

    sz = tmp_path / "gpl_sz" / "map.collated.rad.sz"
    assert sz.exists() and not (tmp_path / "gpl_sz" / "map.collated.rad").exists()
    # real compression: random-but-duplicated fragments compress below
    # the raw collated size
    raw = (tmp_path / "gpl_plain" / "map.collated.rad").stat().st_size
    assert sz.stat().st_size < raw
    assert beds["sz"] == beds["plain"] and len(beds["plain"]) > 0


def test_atac_forward_orientation(tmp_path):
    """-d fw: the whitelist is matched as-given and BED barcodes are
    written without reverse-complementing (atac/utils.rs:9,
    get_bc_string rc-aware decode)."""
    refs = ["chr1"]
    ref_lens = [200_000]
    CB1 = "ACGTACGT"
    chunks = [[
        (pack_seq(CB1), [(0, 4, 1000, 150)]),
        (pack_seq(CB1), [(0, 4, 1000, 150)]),   # duplicate
        (pack_seq("ACGTACGA"), [(0, 4, 2000, 90)]),  # 1-edit -> rescued
    ]]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=BC_LEN)
    wl = tmp_path / "wl.txt"
    wl.write_text(f"{CB1}\n")

    gpl = tmp_path / "gpl"
    assert main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "fw",
    ]) == 0
    meta = json.loads((gpl / "generate_permit_list.json").read_text())
    assert meta["gpl_options"]["rc"] is False

    assert main(["atac", "sort", "-i", str(gpl), "-r", str(rad_dir),
                 "-t", "1"]) == 0
    rows = [l.split("\t") for l in (gpl / "map.bed").read_text().splitlines()]
    assert len(rows) == 2
    # barcode emitted as-is, not reverse-complemented
    assert all(r[3] == CB1 for r in rows)
    assert rows[0][:3] == ["chr1", "1000", "1150"] and rows[0][4] == "2"
    assert rows[1][1] == "2000"

    assert main(["atac", "collate", "-i", str(gpl), "-r", str(rad_dir),
                 "-t", "1"]) == 0
    assert main(["atac", "deduplicate", "-i", str(gpl), "-d", "fw"]) == 0
    drows = [l.split("\t") for l in (gpl / "map.bed").read_text().splitlines()]
    assert [r[3] for r in drows] == [CB1, CB1]


def test_atac_ambiguous_one_edit_not_rescued(tmp_path):
    """A barcode 1 edit away from TWO whitelist entries is dropped
    (unique-neighbor rescue rule, cellfilter.rs:198-233 shared by the
    ATAC path); a unique 1-edit mutant is rescued."""
    refs = ["chr1"]
    ref_lens = [200_000]
    W1, W2 = "AAAAAAAA", "CAAAAAAA"
    amb = "GAAAAAAA"    # 1 edit from both W1 and W2
    uniq = "AAAAAAAT"   # 1 edit from W1 only
    chunks = [[
        (pack_seq(W1), [(0, 4, 100, 50)]),
        (pack_seq(W2), [(0, 4, 200, 50)]),
        (pack_seq(amb), [(0, 4, 300, 50)]),
        (pack_seq(uniq), [(0, 4, 400, 50)]),
    ]]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=BC_LEN)
    wl = tmp_path / "wl.txt"
    wl.write_text(f"{W1}\n{W2}\n")

    gpl = tmp_path / "gpl"
    assert main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "fw",
    ]) == 0
    assert main(["atac", "sort", "-i", str(gpl), "-r", str(rad_dir),
                 "-t", "1"]) == 0
    rows = [l.split("\t") for l in (gpl / "map.bed").read_text().splitlines()]
    # W1 keeps its own read + the rescued uniq read; amb is dropped
    starts = sorted(r[1] for r in rows)
    assert starts == ["100", "200", "400"]
    bcs = {r[1]: r[3] for r in rows}
    assert bcs["400"] == W1  # corrected to the whitelist barcode


def test_format_bed_native_matches_numpy(tmp_path):
    """Native BED renderer and the NumPy fallback emit identical bytes."""
    import pytest

    from alevin_fry_tpu.atac.sort import format_bed_rows
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        pytest.skip("native codec not built")
    rng = np.random.RandomState(3)
    n = 500
    chrs = rng.randint(0, 3, n)
    starts = rng.randint(0, 1 << 31, n)
    flens = rng.randint(1, 2 * 2000, n)  # some beyond MAX get filtered
    bcs = rng.randint(0, 1 << 16, n).astype(np.uint64)
    counts = rng.randint(1, 9, n)
    args = (["chr1", "chrMT", "x"], chrs, starts, flens, bcs, counts, BC_LEN, True)
    nat = format_bed_rows(*args, n_threads=2)
    lib, _native._LIB = _native._LIB, None
    try:
        pure = format_bed_rows(*args)
    finally:
        _native._LIB = lib
    assert nat == pure


def test_atac_device_backends_match_host(tmp_path, monkeypatch):
    """Full ATAC pipeline (gpl -> collate -> sort; collate -> dedup)
    with the device backends forced — mesh bin/barcode histograms
    (parallel/mesh.py) and the device segmented sort+RLE kernel
    (ops/atac_device.py) — writes byte-identical artifacts to the host
    path."""
    rng = np.random.RandomState(31)
    refs = ["chr1", "chr2", "chr3"]
    ref_lens = [250_000, 150_000, 400_000]
    wl_bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT"]
    chunks = []
    for _ in range(3):
        recs = []
        for _ in range(150):
            b = wl_bcs[rng.randint(4)]
            na = 1 if rng.rand() < 0.9 else 2
            alns = []
            for _ in range(na):
                c = rng.randint(3)
                alns.append((
                    c, 4 if rng.rand() < 0.9 else 2,
                    int(rng.randint(0, ref_lens[c] - 3000)),
                    int(rng.randint(50, 2500)),
                ))
            recs.append((pack_seq(b), alns))
        chunks.append(recs)
    outs = {}
    for tag, env in (
        ("host", {"AFT_GPL_MESH": "0", "AFT_ATAC_SORT_BACKEND": "host"}),
        ("dev", {"AFT_GPL_MESH": "auto", "AFT_ATAC_SORT_BACKEND": "jax"}),
    ):
        root = tmp_path / tag
        rad_dir = root / "rad"
        rad_dir.mkdir(parents=True)
        write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks,
                       bc_len=BC_LEN)
        wl = root / "wl.txt"
        wl.write_text("".join(
            unpack_seq(int(revcomp_packed(
                np.asarray([pack_seq(b)], np.uint64), BC_LEN)[0]), BC_LEN)
            + "\n" for b in wl_bcs
        ))
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        gpl = root / "gpl"
        assert main([
            "atac", "generate-permit-list", "-i", str(rad_dir),
            "-o", str(gpl), "-u", str(wl), "-m", "1", "-d", "rc",
        ]) == 0
        assert main([
            "atac", "collate", "-i", str(gpl), "-r", str(rad_dir),
        ]) == 0
        assert main([
            "atac", "sort", "-i", str(gpl), "-r", str(rad_dir),
        ]) == 0
        bed_sorted = (gpl / "map.bed").read_bytes()
        assert main(["atac", "deduplicate", "-i", str(gpl)]) == 0
        outs[tag] = {
            "bin_recs": (gpl / "bin_recs.bin").read_bytes(),
            "permit_freq": (gpl / "permit_freq.bin").read_bytes(),
            "permit_map": (gpl / "permit_map.bin").read_bytes(),
            "bed_sorted": bed_sorted,
            "bed_dedup": (gpl / "map.bed").read_bytes(),
        }
        for k in env:
            monkeypatch.delenv(k)
    assert outs["host"] == outs["dev"]


def test_sort_rle_device_matches_lexsort():
    """ops/atac_device.py::sort_rle_device == np.lexsort + RLE across
    column counts and bit widths (incl. a 2-word packing)."""
    from alevin_fry_tpu.ops.atac_device import sort_rle_device

    rng = np.random.RandomState(7)
    for ncols, hi in ((2, 1 << 8), (4, 1 << 20), (5, 1 << 30)):
        cols = [
            rng.randint(0, hi, 500).astype(np.int64) for _ in range(ncols)
        ]
        got = sort_rle_device(cols)
        assert got is not None
        (g_cols, g_cnt) = got
        order = np.lexsort(tuple(cols[::-1]))
        sc = [c[order] for c in cols]
        new = np.ones(500, bool)
        for c in sc:
            new[1:] |= False
        neq = np.zeros(499, bool)
        for c in sc:
            neq |= c[1:] != c[:-1]
        new[1:] = neq
        si = np.flatnonzero(new)
        cnt = np.diff(np.append(si, 500))
        np.testing.assert_array_equal(g_cnt, cnt)
        for gc, c in zip(g_cols, sc):
            np.testing.assert_array_equal(gc, c[si])


def test_atac_native_collate_matches_columnar(tmp_path, monkeypatch):
    """The byte-level native ATAC collation (shared RNA engine, barcode
    key) writes the identical map.collated.rad to the columnar
    decode/re-encode fallback."""
    from alevin_fry_tpu.atac.gpl import AtacGplOpts
    from alevin_fry_tpu.atac.gpl import generate_permit_list as atac_gpl
    from alevin_fry_tpu.atac.collate import collate as atac_collate
    from alevin_fry_tpu.pipeline import collate as rna_collate_mod

    rng = np.random.RandomState(71)
    refs = ["chr1", "chr2"]
    ref_lens = [250_000, 150_000]
    wl_bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG"]
    chunks = []
    for _ in range(3):
        recs = []
        for _ in range(70):
            b = wl_bcs[rng.randint(3)]
            na = 1 if rng.rand() < 0.85 else 2
            alns = [(
                int(rng.randint(2)), 4, int(rng.randint(0, 200_000)),
                int(rng.randint(50, 1500)),
            ) for _ in range(na)]
            recs.append((pack_seq(b), alns))
        chunks.append(recs)
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=BC_LEN)
    wl = tmp_path / "wl.txt"
    wl.write_text("".join(
        unpack_seq(int(revcomp_packed(
            np.asarray([pack_seq(b)], np.uint64), BC_LEN)[0]), BC_LEN) + "\n"
        for b in wl_bcs
    ))
    gpl = tmp_path / "gpl"
    atac_gpl(AtacGplOpts(
        input_dir=rad_dir, output_dir=gpl, unfiltered_pl=wl,
        min_reads=1, rc=True, cmdline="t",
    ))
    atac_collate(gpl, rad_dir, cmdline="t")
    native_bytes = (gpl / "map.collated.rad").read_bytes()

    # force the columnar fallback and re-collate
    monkeypatch.setattr(
        rna_collate_mod, "_collate_in_memory_native",
        lambda *a, **k: False,
    )
    atac_collate(gpl, rad_dir, cmdline="t")
    assert (gpl / "map.collated.rad").read_bytes() == native_bytes


def test_sort_rle_host_matches_lexsort():
    """The packed-word host path (and its raw-column fallback) must
    equal np.lexsort + RLE, including negative/huge columns that
    exceed the word budget."""
    from alevin_fry_tpu.ops.atac_device import sort_rle_host

    rng = np.random.RandomState(17)
    cases = [
        [rng.randint(0, 1 << 8, 400), rng.randint(0, 1 << 26, 400),
         rng.randint(0, 1 << 11, 400), rng.randint(0, 1 << 33, 400)],
        # duplicate-heavy two-word case: few distinct values but wide
        # bit-widths (>64 total), pinning the RLE counts of the fused
        # native 2-word kernel
        [rng.randint(0, 3, 500) << 35, rng.randint(0, 4, 500) << 35,
         rng.randint(0, 3, 500)],
        # 3 wide columns -> >3 words is impossible here, but force the
        # raw fallback with a negative column
        [rng.randint(-5, 5, 300), rng.randint(0, 100, 300)],
    ]
    for cols in cases:
        cols = [np.asarray(c, np.int64) for c in cols]
        (g_cols), g_cnt = sort_rle_host(cols)
        n = len(cols[0])
        order = np.lexsort(tuple(cols[::-1]))
        sc = [c[order] for c in cols]
        neq = np.zeros(n - 1, bool)
        for c in sc:
            neq |= c[1:] != c[:-1]
        new = np.ones(n, bool)
        new[1:] = neq
        si = np.flatnonzero(new)
        cnt = np.diff(np.append(si, n))
        np.testing.assert_array_equal(g_cnt, cnt)
        for gc, c in zip(g_cols, sc):
            np.testing.assert_array_equal(gc, c[si])
