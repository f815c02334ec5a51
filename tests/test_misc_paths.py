"""Compressed collation, quant-subset filtering, position-tagged
records, and snappy codec roundtrips."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.radz.mtx import read_matrix_market
from test_pipeline_rna import make_dataset


def test_snappy_block_roundtrip():
    from alevin_fry_tpu.radz import snappyz

    data = b"hello world " * 100 + bytes(range(256))
    blk = snappyz.block_compress_literal(data)
    assert snappyz.block_decompress(blk) == data


def test_snappy_block_with_copies():
    from alevin_fry_tpu.radz import snappyz

    # hand-encode a block with a copy element: "abcdabcd"
    # varint len 8, literal "abcd" (tag len-1=3 -> 0b1100), copy1
    # len=4 offset=4: tag kind=1, len-4=0 in bits 2-4, offset high 0
    blk = bytes([8, (3 << 2), ord("a"), ord("b"), ord("c"), ord("d"),
                 0b000_000_01, 4])
    assert snappyz.block_decompress(blk) == b"abcdabcd"
    # overlapping copy: "a" then copy len 4 offset 1 -> "aaaaa"
    blk2 = bytes([5, (0 << 2), ord("a"), 0b000_000_01, 1])
    assert snappyz.block_decompress(blk2) == b"aaaaa"


def test_snappy_real_compression():
    """The native block compressor emits real literals+copies: output
    shrinks on repetitive input and round-trips through the pure-Python
    spec decoder (cross-implementation conformance)."""
    import pytest

    from alevin_fry_tpu.radz import _native, snappyz

    if not _native.available():
        pytest.skip("native codec not built")

    rng = np.random.RandomState(7)
    cases = [
        b"",
        b"x",
        b"hello world " * 1000,
        rng.bytes(65536),                       # incompressible
        bytes(rng.randint(0, 4, 65536, np.uint8)),  # low-entropy
        (b"ACGT" * 7 + b"\x00\x01") * 2000,
        rng.bytes(13) * 5000,                   # long-range copies
    ]
    pure_decoder_available = True
    for data in cases:
        comp = _native.snappy_compress(data)
        # conformance: the pure-Python decoder must accept native output
        assert snappyz.block_decompress(comp) == data
        if pure_decoder_available:
            # force the pure path too (native flag off temporarily)
            lib, snappyz._native._LIB = snappyz._native._LIB, None
            try:
                assert snappyz.block_decompress(comp) == data
            finally:
                snappyz._native._LIB = lib
    # repetitive input must actually shrink
    rep = b"hello world " * 1000
    assert len(_native.snappy_compress(rep)) < len(rep) // 10

    # framing writer emits compressed chunks that the streaming reader
    # (and the whole-stream decoder) round-trip
    import io

    data = (b"alevin-fry-tpu " * 40000)[: 3 * 65536 + 123]
    buf = io.BytesIO()
    w = snappyz.SnappyFrameWriter(buf)
    w.write(data)
    w.flush()
    assert buf.tell() < len(data) // 4
    buf.seek(0)
    assert snappyz.frame_decompress(buf) == data


def test_snappy_frame_roundtrip(tmp_path):
    import io

    from alevin_fry_tpu.radz import snappyz

    data = np.random.RandomState(0).bytes(200_000)
    buf = io.BytesIO()
    snappyz.frame_compress_stream(data, buf)
    buf.seek(0)
    assert snappyz.frame_decompress(buf) == data

    # streaming reader: exact reads, relative/absolute seeks, history drop
    buf.seek(0)
    r = snappyz.SnappyFrameReader(buf)
    assert r.read(5) == data[:5]
    r.seek(-3, 1)                       # backward within history
    assert r.read(3) == data[2:5]
    assert r.tell() == 5
    r.drop_history()
    rest = r.read(-1)
    assert rest == data[5:]


def test_compressed_collate_quant(tmp_path):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, compress_out=True, cmdline="t")
    assert (gpl / "map.collated.rad.sz").exists()
    assert not (gpl / "map.collated.rad").exists()
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=qdir, resolution="cr-like",
        cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    mat = np.zeros(shape)
    mat[r, c] = v
    np.testing.assert_array_equal(mat, [[1, 1, 1], [0, 1, 1]])


def test_quant_subset(tmp_path):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    subset = tmp_path / "subset.txt"
    subset.write_text("CCCCCCCC\n")
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=qdir, resolution="cr-like",
        filter_list=subset, cmdline="t",
    ))
    rows = (qdir / "alevin" / "quants_mat_rows.txt").read_text().splitlines()
    assert rows == ["CCCCCCCC"]
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    mat = np.zeros(shape)
    mat[r, c] = v
    np.testing.assert_array_equal(mat, [[0, 1, 1]])


def test_pos_records_pipeline(tmp_path):
    """RNA-with-positions records (aln tag 'pos') run through the full
    pipeline; the pos column rides along untouched."""
    from alevin_fry_tpu.radz import RadHeader, RadPrelude, RadWriter
    from alevin_fry_tpu.radz import types as rt
    from alevin_fry_tpu.radz.types import (
        RadType, TagSection, SECTION_ALN, SECTION_FILE, SECTION_READ,
    )

    refs = ["t0", "t1"]
    hdr = RadHeader(0, refs, 0)
    ft = TagSection(SECTION_FILE)
    ft.add("cblen", RadType(rt.U16))
    ft.add("ulen", RadType(rt.U16))
    rtg = TagSection(SECTION_READ)
    rtg.add("b", RadType(rt.U16))
    rtg.add("u", RadType(rt.U16))
    at = TagSection(SECTION_ALN)
    at.add("compressed_ori_refid", RadType(rt.U32))
    at.add("pos", RadType(rt.U32))
    prelude = RadPrelude(hdr, ft, rtg, at)
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    with open(rad_dir / "map.rad", "wb") as fh:
        w = RadWriter(fh, prelude, {"cblen": 8, "ulen": 6})
        w.write_chunk(
            read_cols={
                "b": np.asarray([pack_seq("AAAAAAAA")] * 2, np.uint64),
                "u": np.asarray([5, 9], np.uint64),
            },
            aln_offsets=np.asarray([0, 1, 2], np.int64),
            refs=np.asarray([0, 1], np.uint32),
            dirs=np.asarray([True, True]),
            aln_cols={"pos": np.asarray([123, 456], np.uint64)},
        )
        w.finalize()
    (tmp_path / "wl.txt").write_text("AAAAAAAA\n")
    (tmp_path / "t2g.tsv").write_text("t0\tg0\nt1\tg1\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt", min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    # collated file retains the pos column
    from alevin_fry_tpu.radz import read_prelude
    from alevin_fry_tpu.radz.chunkio import decode_all_chunks
    from alevin_fry_tpu.radz.records import RecordSchema

    with open(gpl / "map.collated.rad", "rb") as fh:
        p2, _ftm, _ = read_prelude(fh)
        batch = decode_all_chunks(fh, RecordSchema.from_prelude(p2), p2.hdr.num_chunks)
    np.testing.assert_array_equal(batch.aln_cols["pos"], [123, 456])
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=tmp_path / "t2g.tsv", output_dir=qdir,
        resolution="cr-like", cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "quants_mat.mtx")
    mat = np.zeros(shape)
    mat[r, c] = v
    np.testing.assert_array_equal(mat, [[1, 1]])


def test_truncated_rad_raises(tmp_path):
    """A RAD truncated mid-chunk fails loudly (EOFError/ValueError),
    never silently under-counting."""
    import pytest

    rad_dir, wl, _t2g = make_dataset(tmp_path)
    raw = (rad_dir / "map.rad").read_bytes()
    (rad_dir / "map.rad").write_bytes(raw[: len(raw) - 15])
    with pytest.raises((EOFError, ValueError)):
        generate_permit_list(GenPermitListOpts(
            input_dir=rad_dir, output_dir=tmp_path / "gpl",
            fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=1),
            expected_ori="fw", cmdline="t",
        ))


def test_corrupt_chunk_record_count_raises(tmp_path):
    """A chunk whose declared record count overruns its byte span is a
    clean error from the native walk, not a crash or garbage output."""
    import struct as _st

    import pytest

    from alevin_fry_tpu.radz import read_prelude

    rad_dir, wl, _t2g = make_dataset(tmp_path)
    raw = bytearray((rad_dir / "map.rad").read_bytes())
    # find the first chunk header (after the prelude) and inflate nrec
    import io

    with open(rad_dir / "map.rad", "rb") as fh:
        read_prelude(fh)
        pos = fh.tell()
    nbytes, nrec = _st.unpack_from("<II", raw, pos)
    _st.pack_into("<II", raw, pos, nbytes, nrec + 1000)
    (rad_dir / "map.rad").write_bytes(bytes(raw))
    with pytest.raises((EOFError, ValueError)):
        generate_permit_list(GenPermitListOpts(
            input_dir=rad_dir, output_dir=tmp_path / "gpl",
            fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=1),
            expected_ori="fw", cmdline="t",
        ))
