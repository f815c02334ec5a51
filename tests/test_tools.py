"""view / convert / infer / bootstrap tool tests."""

import gzip
import io

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.convert import bam2rad
from alevin_fry_tpu.pipeline.infer import infer
from alevin_fry_tpu.pipeline.view import view
from alevin_fry_tpu.radz.mtx import read_matrix_market, write_matrix_market
from synth import write_rna_rad


def test_view(tmp_path):
    refs = ["tx_a", "tx_b"]
    chunks = [[
        (pack_seq("AAAA"), pack_seq("CCC"), [(0, True), (1, False)]),
        (pack_seq("GGGG"), pack_seq("TTT"), [(1, True)]),
    ]]
    p = tmp_path / "map.rad"
    write_rna_rad(p, refs, chunks, bc_len=4, umi_len=3)
    buf = io.StringIO()
    n = view(p, print_header=True, out=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == "0:tx_a" and lines[1] == "1:tx_b"
    assert n == 3
    assert lines[2] == "ID:0\tHI:1\tNH:2\tCB:AAAA\tUMI:CCC\tDIR:true\ttx_a"
    assert lines[3] == "ID:0\tHI:2\tNH:2\tCB:AAAA\tUMI:CCC\tDIR:false\ttx_b"
    assert lines[4] == "ID:1\tHI:1\tNH:1\tCB:GGGG\tUMI:TTT\tDIR:true\ttx_b"


def _write_sam(path, recs, refs):
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.6\n")
        for r in refs:
            fh.write(f"@SQ\tSN:{r}\tLN:1000\n")
        for qname, flag, rname, cr, ur, score in recs:
            fh.write(
                f"{qname}\t{flag}\t{rname}\t1\t255\t4M\t*\t0\t0\tACGT\tIIII\t"
                f"CR:Z:{cr}\tUR:Z:{ur}\tAS:i:{score}\n"
            )


def test_convert_sam(tmp_path):
    refs = ["tx_a", "tx_b"]
    recs = [
        ("r1", 0, "tx_a", "AAAA", "CCC", 10),     # fw
        ("r1", 16, "tx_b", "AAAA", "CCC", 8),     # second aln, reverse, lower AS
        ("r2", 16, "tx_b", "GGGG", "TTT", 5),
        ("r3", 4, "tx_a", "TTTT", "AAA", 1),      # unmapped -> skipped
        ("r4", 0, "tx_a", "NNAA", "CCC", 1),      # two Ns -> dropped
    ]
    sam = tmp_path / "aln.sam"
    _write_sam(sam, recs, refs)
    rad = tmp_path / "out.rad"
    bam2rad(sam, rad, filter_best=False)

    buf = io.StringIO()
    n = view(rad, print_header=False, out=buf)
    lines = buf.getvalue().splitlines()
    # r1 has both alignments (no AS filtering), r2 one, r3/r4 dropped
    assert n == 3
    assert lines[0].endswith("DIR:true\ttx_a")
    assert lines[1].endswith("DIR:false\ttx_b")
    assert "CB:GGGG" in lines[2] and lines[2].endswith("DIR:false\ttx_b")

    # with filter_best, r1 keeps only the AS=10 alignment
    rad2 = tmp_path / "out2.rad"
    bam2rad(sam, rad2, filter_best=True)
    buf = io.StringIO()
    n = view(rad2, print_header=False, out=buf)
    assert n == 2


def test_convert_bam(tmp_path):
    # build a tiny BAM by hand (single gzip member is valid BGZF-wise
    # for our reader)
    import struct

    refs = ["tx_a"]
    rec_core = struct.pack(
        "<iiBBHHHiiii", 0, 0, 3, 255, 0, 0, 0, 4, -1, -1, 0
    )
    aux = b"CRZAAAA\x00URZCCC\x00ASi" + struct.pack("<i", 7)
    body = rec_core + b"r1\x00" + b"" + b"\x12\x48" + b"\xff" * 4 + aux
    bam = io.BytesIO()
    bam.write(b"BAM\x01")
    bam.write(struct.pack("<i", 0))
    bam.write(struct.pack("<i", 1))
    bam.write(struct.pack("<i", 5) + b"tx_a\x00" + struct.pack("<i", 1000))
    bam.write(struct.pack("<i", len(body)))
    bam.write(body)
    p = tmp_path / "t.bam"
    with gzip.open(p, "wb") as fh:
        fh.write(bam.getvalue())
    rad = tmp_path / "t.rad"
    bam2rad(p, rad)
    buf = io.StringIO()
    n = view(rad, print_header=False, out=buf)
    assert n == 1
    assert "CB:AAAA" in buf.getvalue() and "UMI:CCC" in buf.getvalue()


def test_convert_corrupt_bam_raises(tmp_path):
    """Malformed BAM records (tiny block_size values) must raise a
    clean ValueError, not crash the native scanner."""
    import gzip as _gz
    import struct as _st

    import pytest

    bam = io.BytesIO()
    bam.write(b"BAM\x01")
    bam.write(_st.pack("<i", 0))
    bam.write(_st.pack("<i", 1))
    bam.write(_st.pack("<i", 5) + b"tx_a\x00" + _st.pack("<i", 1000))
    for _ in range(50):
        bam.write(_st.pack("<i", 1) + b"\x00")  # block_size=1: invalid
    p = tmp_path / "corrupt.bam"
    with _gz.open(p, "wb") as fh:
        fh.write(bam.getvalue())
    with pytest.raises(ValueError):
        bam2rad(p, tmp_path / "out.rad")


def test_convert_bam_python_fallback(tmp_path, monkeypatch):
    """Without the native library the BAM path must still work via the
    pure-Python scanner (same column contract)."""
    import struct as _st

    refs = ["tx_a"]
    rec_core = _st.pack(
        "<iiBBHHHiiii", 0, 0, 3, 255, 0, 0, 0, 4, -1, -1, 0
    )
    aux = b"CRZAAAA\x00URZCCC\x00ASi" + _st.pack("<i", 7)
    body = rec_core + b"r1\x00" + b"\x12\x48" + b"\xff" * 4 + aux
    bam = io.BytesIO()
    bam.write(b"BAM\x01")
    bam.write(_st.pack("<i", 0))
    bam.write(_st.pack("<i", 1))
    bam.write(_st.pack("<i", 5) + b"tx_a\x00" + _st.pack("<i", 1000))
    bam.write(_st.pack("<i", len(body)))
    bam.write(body)
    p = tmp_path / "t.bam"
    with gzip.open(p, "wb") as fh:
        fh.write(bam.getvalue())

    from alevin_fry_tpu.radz import _native

    lib, _native._LIB = _native._LIB, None
    try:
        rad = tmp_path / "t.rad"
        bam2rad(p, rad)
    finally:
        _native._LIB = lib
    buf = io.StringIO()
    n = view(rad, print_header=False, out=buf)
    assert n == 1
    assert "CB:AAAA" in buf.getvalue() and "UMI:CCC" in buf.getvalue()


def test_infer_roundtrip(tmp_path):
    # cell x eqc matrix with 2 cells, labels {0}, {1}, {0,1}
    rows = np.asarray([0, 0, 1, 1])
    cols = np.asarray([0, 2, 1, 2])
    vals = np.asarray([10.0, 4.0, 6.0, 2.0])
    write_matrix_market(tmp_path / "geqc_counts.mtx", rows, cols, vals, (2, 3))
    with gzip.open(tmp_path / "gene_eqclass.txt.gz", "wt") as fh:
        fh.write("2\n3\n")
        fh.write("0\t0\n")
        fh.write("1\t1\n")
        fh.write("0\t1\t2\n")
    (tmp_path / "quants_mat_rows.txt").write_text("AAAA\nCCCC\n")
    (tmp_path / "quants_mat_cols.txt").write_text("g0\ng1\n")

    out = tmp_path / "out"
    infer(tmp_path / "geqc_counts.mtx", tmp_path / "gene_eqclass.txt.gz",
          False, 1, None, out)
    r, c, v, shape = read_matrix_market(out / "quants_mat.mtx")
    assert shape == (2, 2)
    m = np.zeros(shape)
    m[r, c] = v
    # cell 0: 10 unique on g0 + 4 ambiguous -> EM drives all to g0
    assert m[0, 0] > 13.5 and m[0, 1] < 0.5
    # cell 1: 6 unique on g1 + 2 ambiguous -> all to g1
    assert m[1, 1] > 7.5 and m[1, 0] < 0.5
    assert (out / "quants_mat_rows.txt").read_text().splitlines() == ["AAAA", "CCCC"]
    assert (out / "quants_mat_cols.txt").read_text().splitlines() == ["g0", "g1"]


def test_bootstrap_pipeline(tmp_path):
    """cr-like-em with bootstraps produces mean/var matrices."""
    from alevin_fry_tpu.pipeline.collate import collate
    from alevin_fry_tpu.pipeline.gpl import (
        CellFilterMethod, GenPermitListOpts, generate_permit_list,
    )
    from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify

    refs = ["t0", "t1"]
    CB = "AAAAAAAA"
    reads = []
    for i in range(60):
        reads.append((pack_seq(CB), 2 * i, [(0, True)]))
    for i in range(30):
        reads.append((pack_seq(CB), 1000 + 2 * i, [(1, True)]))
    for i in range(20):
        reads.append((pack_seq(CB), 5000 + 2 * i, [(0, True), (1, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=8, umi_len=8)
    (tmp_path / "permit.txt").write_text(CB + "\n")
    (tmp_path / "t2g.tsv").write_text("t0\tg0\nt1\tg1\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "permit.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    qdir = tmp_path / "q"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=tmp_path / "t2g.tsv", output_dir=qdir,
        resolution="cr-like-em", num_bootstraps=10, summary_stat=True,
        cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(qdir / "alevin" / "bootstraps_mean.mtx")
    assert shape[0] == 1
    mean = np.zeros(shape)
    mean[r, c] = v
    # bootstrap means should hover near the point estimates
    assert abs(mean.sum() - 110) < 5
    assert (qdir / "alevin" / "bootstraps_var.mtx").exists()


def _bgzf_compress(payload: bytes, block_payload: int = 3000) -> bytes:
    """Hand-rolled BGZF writer: split ``payload`` into members with the
    BC extra subfield, ending with the standard BGZF EOF block."""
    import struct as _s
    import zlib

    out = io.BytesIO()
    for i in range(0, len(payload), block_payload) if payload else [0]:
        part = payload[i : i + block_payload]
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(part) + c.flush()
        bsize = 12 + 6 + len(body) + 8
        out.write(b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff")
        out.write(_s.pack("<H", 6))  # XLEN
        out.write(b"BC" + _s.pack("<HH", 2, bsize - 1))
        out.write(body)
        out.write(_s.pack("<II", zlib.crc32(part), len(part) & 0xFFFFFFFF))
    # EOF marker block (empty payload)
    out.write(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    ))
    return out.getvalue()


def test_convert_bam_bgzf_threaded(tmp_path):
    """A real multi-block BGZF BAM must decode through the threaded
    native inflate path to the same RAD as the plain-gzip stream."""
    import struct

    from alevin_fry_tpu.pipeline.convert import _BgzfReader, _open_bam_stream
    from alevin_fry_tpu.radz import _native

    if not _native.available():
        import pytest

        pytest.skip("native library not built")

    refs = ["tx_a", "tx_b"]
    bam = io.BytesIO()
    bam.write(b"BAM\x01")
    bam.write(struct.pack("<i", 0))
    bam.write(struct.pack("<i", 2))
    for nm in refs:
        bam.write(struct.pack("<i", len(nm) + 1) + nm.encode() + b"\x00"
                  + struct.pack("<i", 1000))
    rng = np.random.RandomState(3)
    for r in range(400):
        qname = f"read{r}".encode() + b"\x00"
        rec_core = struct.pack(
            "<iiBBHHHiiii", int(rng.randint(2)), 0, len(qname), 255,
            0, 0, 0, 4, -1, -1, 0,
        )
        aux = (b"CRZ" + b"ACGT"[r % 4 : r % 4 + 1] * 8 + b"\x00"
               + b"URZCCCAAA\x00ASi" + struct.pack("<i", 5 + r % 7))
        body = rec_core + qname + b"\x12\x48" + b"\xff" * 4 + aux
        bam.write(struct.pack("<i", len(body)))
        bam.write(body)
    payload = bam.getvalue()

    p_bgzf = tmp_path / "t_bgzf.bam"
    p_bgzf.write_bytes(_bgzf_compress(payload, block_payload=777))
    p_gz = tmp_path / "t_gz.bam"
    with gzip.open(p_gz, "wb") as fh:
        fh.write(payload)

    # the sniffer must route each file to the right reader
    assert isinstance(_open_bam_stream(p_bgzf), _BgzfReader)
    assert not isinstance(_open_bam_stream(p_gz), _BgzfReader)

    r1 = tmp_path / "bgzf.rad"
    r2 = tmp_path / "gz.rad"
    bam2rad(p_bgzf, r1)
    bam2rad(p_gz, r2)
    assert r1.read_bytes() == r2.read_bytes()

    # corrupt one block body -> loud failure
    blob = bytearray(p_bgzf.read_bytes())
    blob[60] ^= 0xFF
    p_bad = tmp_path / "bad.bam"
    p_bad.write_bytes(bytes(blob))
    import pytest

    with pytest.raises(ValueError):
        bam2rad(p_bad, tmp_path / "bad.rad")


def test_convert_bgzf_crc_mismatch_raises(tmp_path):
    """A BGZF member whose payload inflates cleanly to the right size
    but fails the CRC32 trailer must raise — the per-member check the
    sequential gzip reader performed, now done in the native inflate
    workers."""
    import struct

    from alevin_fry_tpu.radz import _native

    if not _native.available():
        import pytest

        pytest.skip("native library not built")

    payload = bytes(range(256)) * 40
    blob = bytearray(_bgzf_compress(payload, block_payload=1000))
    # flip a bit in the FIRST member's stored CRC (trailer = last 8
    # bytes of the member: CRC32 then ISIZE); the deflate stream is
    # untouched, so only the CRC check can catch it
    xlen = int.from_bytes(blob[10:12], "little")
    e = 0
    bsize = None
    extra = blob[12 : 12 + xlen]
    while e + 4 <= xlen:
        si1, si2 = extra[e], extra[e + 1]
        slen = int.from_bytes(extra[e + 2 : e + 4], "little")
        if si1 == 66 and si2 == 67 and slen == 2:
            bsize = int.from_bytes(extra[e + 4 : e + 6], "little") + 1
        e += 4 + slen
    assert bsize is not None
    blob[bsize - 8] ^= 0x01
    p = tmp_path / "crc.bam"
    p.write_bytes(bytes(blob))

    from alevin_fry_tpu.pipeline.convert import _BgzfReader

    rd = _BgzfReader(p)
    import pytest

    with pytest.raises(ValueError):
        rd.read(len(payload))
    rd.close()
