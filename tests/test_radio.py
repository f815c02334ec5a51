"""RAD codec roundtrip tests (model: tests/multi_barcode_integration.rs:262-333)."""

import io

import numpy as np
import pytest

from alevin_fry_tpu.radz import (
    KnownRecordType,
    decode_all_chunks,
    read_prelude,
    record_type_from_prelude,
)
from alevin_fry_tpu.radz.records import RecordSchema
from synth import (
    make_packed_bc,
    write_atac_rad,
    write_multi_bc_rad,
    write_rna_rad,
)


def test_rna_roundtrip(tmp_path):
    refs = [f"tx_{i}" for i in range(10)]
    chunks = [
        [
            (make_packed_bc(1, 16), make_packed_bc(11, 12), [(0, True), (3, False)]),
            (make_packed_bc(2, 16), make_packed_bc(12, 12), [(5, True)]),
        ],
        [
            (make_packed_bc(3, 16), make_packed_bc(13, 12), [(9, False)]),
        ],
    ]
    p = tmp_path / "map.rad"
    write_rna_rad(p, refs, chunks)

    with open(p, "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        assert prelude.hdr.ref_names == refs
        assert prelude.hdr.num_chunks == 2
        assert ftm["cblen"] == 16 and ftm["ulen"] == 12
        rec_type, info = record_type_from_prelude(prelude, ftm)
        assert rec_type == KnownRecordType.RNA_SHORT
        assert info["bc_len"] == 16
        schema = RecordSchema.from_prelude(prelude)
        batch = decode_all_chunks(fh, schema, prelude.hdr.num_chunks)

    assert batch.n_reads == 3
    assert batch.n_aln == 4
    np.testing.assert_array_equal(
        batch.barcode(), [make_packed_bc(i, 16) for i in (1, 2, 3)]
    )
    np.testing.assert_array_equal(
        batch.umi, [make_packed_bc(i, 12) for i in (11, 12, 13)]
    )
    np.testing.assert_array_equal(batch.refs, [0, 3, 5, 9])
    np.testing.assert_array_equal(batch.dirs, [True, False, True, False])
    np.testing.assert_array_equal(batch.aln_offsets, [0, 2, 3, 4])
    np.testing.assert_array_equal(batch.chunk_id, [0, 0, 1])
    np.testing.assert_array_equal(batch.chunk_offsets, [0, 2, 3])


def test_multi_bc_roundtrip(tmp_path):
    refs = [f"gene_{i}" for i in range(10)]
    sample_bcs = [make_packed_bc(100, 8), make_packed_bc(200, 8)]
    p = tmp_path / "map.rad"
    write_multi_bc_rad(p, refs, 2, 3, 5, sample_bcs)

    with open(p, "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        assert prelude.hdr.num_chunks == 6
        assert ftm["num_barcodes"] == 2
        assert ftm["b0len"] == 8 and ftm["b1len"] == 16
        assert ftm["known_rad_type"] == "sc_rna_multi_bc"
        rec_type, info = record_type_from_prelude(prelude, ftm)
        assert rec_type == KnownRecordType.RNA_MULTI_BC
        assert info == {"num_barcodes": 2, "cell_bc_len": 16}
        schema = RecordSchema.from_prelude(prelude)
        assert schema.barcode_fields == ["b0", "b1"]
        batch = decode_all_chunks(fh, schema, prelude.hdr.num_chunks)

    assert batch.n_reads == 2 * 3 * 5
    # each sample should have cells_per_sample * reads_per_cell reads
    sbc = batch.barcode(0)
    for bc in sample_bcs:
        assert int((sbc == np.uint64(bc)).sum()) == 15
    # collate key is the last barcode level (cell BC); 2 samples x 3
    # distinct cells each (not shared across samples by default)
    assert len(np.unique(batch.barcode(-1))) == 6


def test_atac_roundtrip(tmp_path):
    refs = ["chr1", "chr2"]
    chunks = [
        [
            (make_packed_bc(5, 16), [(0, 4, 1000, 150)]),
            (make_packed_bc(6, 16), [(1, 4, 250000, 80), (0, 2, 5, 70)]),
        ]
    ]
    p = tmp_path / "map.rad"
    write_atac_rad(p, refs, [300000, 500000], chunks)
    with open(p, "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        rec_type, _ = record_type_from_prelude(prelude, ftm)
        assert rec_type == KnownRecordType.ATAC
        np.testing.assert_array_equal(ftm["ref_lengths"], [300000, 500000])
        schema = RecordSchema.from_prelude(prelude)
        batch = decode_all_chunks(fh, schema, prelude.hdr.num_chunks)
    np.testing.assert_array_equal(batch.refs, [0, 1, 0])
    np.testing.assert_array_equal(batch.aln_cols["type"], [4, 4, 2])
    np.testing.assert_array_equal(batch.aln_cols["start_pos"], [1000, 250000, 5])
    np.testing.assert_array_equal(batch.aln_cols["frag_len"], [150, 80, 70])


def test_native_walk_matches_python(tmp_path):
    from alevin_fry_tpu.radz import _native, chunkio

    if not _native.available():
        pytest.skip("native codec not built")
    refs = [f"tx_{i}" for i in range(4)]
    rng = np.random.RandomState(7)
    chunks = []
    for _ in range(5):
        chunk = []
        for _ in range(rng.randint(1, 50)):
            na = rng.randint(1, 6)
            chunk.append(
                (
                    int(rng.randint(0, 2**32)),
                    int(rng.randint(0, 2**24)),
                    [(int(rng.randint(0, 4)), bool(rng.randint(2))) for _ in range(na)],
                )
            )
        chunks.append(chunk)
    p = tmp_path / "map.rad"
    write_rna_rad(p, refs, chunks)
    with open(p, "rb") as fh:
        prelude, ftm, data_start = read_prelude(fh)
        schema = RecordSchema.from_prelude(prelude)
        raw = fh.read()

    # decode via file interface (uses native walk when available)
    batch = decode_all_chunks(io.BytesIO(raw), schema, prelude.hdr.num_chunks)
    # force the python walk
    import struct

    bufs, recs = [], []
    bio = io.BytesIO(raw)
    for _ in range(prelude.hdr.num_chunks):
        nbytes, nrec = struct.unpack("<II", bio.read(8))
        bufs.append(bio.read(nbytes - 8))
        recs.append(nrec)
    buf = np.frombuffer(b"".join(bufs), np.uint8)
    starts = []
    pos = 0
    for b in bufs:
        starts.append(pos)
        pos += len(b)
    rs_py, na_py = chunkio._walk_records_py(
        buf, starts, recs, schema.read_bytes, schema.aln_bytes
    )
    rs_c, na_c = _native.walk_records(
        buf,
        np.asarray(starts, np.int64),
        np.asarray(recs, np.int64),
        schema.read_bytes,
        schema.aln_bytes,
    )
    np.testing.assert_array_equal(rs_py, rs_c)
    np.testing.assert_array_equal(na_py, na_c)
    assert batch.n_reads == len(rs_c)


def test_count_records_rejects_corrupt_header():
    """A chunk header claiming nbytes < 8 must raise, not seek backwards
    and loop forever (ADVICE r4; reachable from bench.py --real on a
    truncated/garbage RAD)."""
    import io
    import struct

    import pytest

    from alevin_fry_tpu.radz.chunkio import count_records

    good = struct.pack("<II", 8 + 4, 1) + b"\x00" * 4
    bad = struct.pack("<II", 0, 7)
    fh = io.BytesIO(good + bad)
    with pytest.raises(ValueError, match="corrupt RAD chunk header"):
        count_records(fh)


def test_native_mixed_mtx_body_matches_python():
    """radc_format_triplets_f32 (r5) must be byte-identical to the
    numpy/python fallback across exact-int, fractional, tiny, huge,
    and float32-boundary values."""
    import numpy as np

    from alevin_fry_tpu.radz import _native
    from alevin_fry_tpu.radz.mtx import format_f32_list

    if not _native.available():
        import pytest

        pytest.skip("native lib absent")
    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randint(0, 1000, 500).astype(np.float32),
        rng.rand(500).astype(np.float32) * 1e-8,
        (rng.rand(500) * 1e12).astype(np.float32),
        np.array([0.0, -0.0, 1.5, 0.1, 123456.78, 3.4e38, 1e-45,
                  np.float32(2 ** 24), np.float32(2 ** 24) + 2],
                 np.float32),
    ])
    rows = rng.randint(1, 1 << 40, len(vals))
    cols = rng.randint(1, 100000, len(vals))
    native = _native.format_triplets_f32(rows, cols, vals)
    with np.errstate(invalid="ignore"):
        ivals = vals.astype(np.int64)
    is_int = (vals == ivals) & np.isfinite(vals)
    vstr = np.char.mod("%d", ivals).astype(object)
    ni = np.flatnonzero(~is_int)
    vstr[ni] = format_f32_list(vals[ni])
    body = np.char.add(
        np.char.add(np.char.mod("%d ", rows), np.char.mod("%d ", cols)),
        np.char.add(np.asarray(vstr, dtype=np.str_), "\n"),
    )
    assert native == "".join(body.tolist()).encode()
