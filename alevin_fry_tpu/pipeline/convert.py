"""convert — BAM/SAM (transcriptomic coordinates) to RAD.

Re-implements src/convert.rs:167-594 with a minimal pure-Python BAM
reader (BGZF is a multi-member gzip stream, which zlib handles):

* consecutive alignments sharing a qname form one read record;
* barcode/UMI come from the CR/UR tags, 2-bit packed with a single
  N->A replacement (more than one N drops the read,
  convert.rs:525-531);
* with ``--filter_best`` only alignments whose AS ties the best score
  are kept (convert.rs:461-468);
* forward orientation sets the high bit of the u32 ref id
  (convert.rs:441-444); unmapped and supplementary records are skipped;
* records are written in chunks of ~10k with the num_chunks header
  backpatch.

Divergence note: when a read's barcode or UMI still contains an N
after the single replacement, the reference half-skips the record in a
way that can leak the previous read's alignment list (convert.rs
:525-552 interplay); we drop the whole read cleanly.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..radz import RadHeader, RadPrelude, RadWriter
from ..radz import types as rt
from ..radz.types import RadType, TagSection, SECTION_ALN, SECTION_FILE, SECTION_READ
from ..ops.barcodes import pack_seq
from .logging_ import get_logger

log = get_logger("convert")

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SUPPLEMENTARY = 0x800
MASK_LOWER_31 = 0x8000_0000
BUF_LIMIT = 10_000


def _bgzf_reader(path: Path):
    """BGZF = concatenated gzip members; gzip.open handles it."""
    return gzip.open(path, "rb")


def _parse_bam_tags(buf: bytes):
    """Extract CR, UR (strings) and AS (int) from a BAM aux data blob."""
    cr = ur = None
    as_score = None
    pos = 0
    n = len(buf)
    while pos + 3 <= n:
        tag = buf[pos : pos + 2].decode("ascii", "replace")
        vt = chr(buf[pos + 2])
        pos += 3
        if vt == "A":
            val = chr(buf[pos]); pos += 1
        elif vt == "c":
            val = struct.unpack_from("<b", buf, pos)[0]; pos += 1
        elif vt == "C":
            val = struct.unpack_from("<B", buf, pos)[0]; pos += 1
        elif vt == "s":
            val = struct.unpack_from("<h", buf, pos)[0]; pos += 2
        elif vt == "S":
            val = struct.unpack_from("<H", buf, pos)[0]; pos += 2
        elif vt == "i":
            val = struct.unpack_from("<i", buf, pos)[0]; pos += 4
        elif vt == "I":
            val = struct.unpack_from("<I", buf, pos)[0]; pos += 4
        elif vt == "f":
            val = struct.unpack_from("<f", buf, pos)[0]; pos += 4
        elif vt in ("Z", "H"):
            end = buf.index(b"\x00", pos)
            val = buf[pos:end].decode("ascii", "replace")
            pos = end + 1
        elif vt == "B":
            sub = chr(buf[pos]); cnt = struct.unpack_from("<i", buf, pos + 1)[0]
            sz = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            pos += 5 + cnt * sz
            val = None
        else:
            break
        if tag == "CR" and isinstance(val, str):
            cr = val
        elif tag == "UR" and isinstance(val, str):
            ur = val
        elif tag == "AS" and isinstance(val, (int,)):
            as_score = int(val)
    return cr, ur, as_score


def iter_bam(path: Path) -> Tuple[List[str], Iterator[tuple]]:
    """Returns (ref_names, iterator of (qname, flags, tid, cr, ur, as))."""
    fh = _bgzf_reader(path)
    magic = fh.read(4)
    if magic != b"BAM\x01":
        raise ValueError(f"{path} is not a BAM file")
    (l_text,) = struct.unpack("<i", fh.read(4))
    fh.read(l_text)
    (n_ref,) = struct.unpack("<i", fh.read(4))
    names = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", fh.read(4))
        names.append(fh.read(l_name)[:-1].decode())
        fh.read(4)  # l_ref

    def gen():
        while True:
            hdr = fh.read(4)
            if len(hdr) < 4:
                break
            (block_size,) = struct.unpack("<i", hdr)
            rec = fh.read(block_size)
            (tid, _pos, l_qname, _mapq, _bin, n_cigar, flag, l_seq,
             _ntid, _npos, _tlen) = struct.unpack_from("<iiBBHHHiiii", rec, 0)
            off = 32
            qname = rec[off : off + l_qname - 1].decode("ascii", "replace")
            off += l_qname + n_cigar * 4 + (l_seq + 1) // 2 + l_seq
            cr, ur, as_score = _parse_bam_tags(rec[off:])
            yield qname, flag, tid, cr, ur, as_score
        fh.close()

    return names, gen()


def iter_sam(path: Path) -> Tuple[List[str], Iterator[tuple]]:
    fh = open(path, "r")
    names: List[str] = []
    first_aln = None
    for line in fh:
        if line.startswith("@"):
            if line.startswith("@SQ"):
                for tok in line.rstrip("\n").split("\t")[1:]:
                    if tok.startswith("SN:"):
                        names.append(tok[3:])
            continue
        first_aln = line
        break
    name_to_id = {n: i for i, n in enumerate(names)}

    def parse(line):
        toks = line.rstrip("\n").split("\t")
        qname, flag, rname = toks[0], int(toks[1]), toks[2]
        tid = name_to_id.get(rname, -1)
        cr = ur = None
        as_score = None
        for t in toks[11:]:
            if t.startswith("CR:Z:"):
                cr = t[5:]
            elif t.startswith("UR:Z:"):
                ur = t[5:]
            elif t.startswith("AS:i:"):
                as_score = int(t[5:])
        return qname, flag, tid, cr, ur, as_score

    def gen():
        if first_aln is not None:
            yield parse(first_aln)
        for line in fh:
            yield parse(line)
        fh.close()

    return names, gen()


def _pack_with_n(seq: str) -> Optional[int]:
    """Pack; replace the first N with A, drop if any N remains
    (convert.rs:525-531)."""
    s = seq.replace("N", "A", 1)
    if "N" in s:
        return None
    return pack_seq(s)


def bam2rad(
    input_file: Path, rad_file: Path, num_threads: int = 1,
    filter_best: bool = False,
) -> None:
    input_file = Path(input_file)
    ext = input_file.suffix.lower()
    if ext == ".bam":
        ref_names, it = iter_bam(input_file)
    elif ext == ".sam":
        ref_names, it = iter_sam(input_file)
    else:
        raise ValueError(
            "unsupported input file format, must end with bam/BAM or sam/SAM"
        )

    rad_file = Path(rad_file)
    rad_file.parent.mkdir(parents=True, exist_ok=True)

    writer = None
    schema_lens = None

    # group consecutive records by qname
    pend_bc = pend_umi = None
    tid_list: List[int] = []
    score_list: List[int] = []
    cur_qname = None

    chunk_bcs: List[int] = []
    chunk_umis: List[int] = []
    chunk_refs: List[int] = []
    chunk_offs: List[int] = [0]
    total_records = 0

    out_fh = open(rad_file, "wb")

    def ensure_writer(bclen, umilen):
        nonlocal writer, schema_lens
        if writer is not None:
            return
        schema_lens = (bclen, umilen)
        hdr = RadHeader(is_paired=0, ref_names=ref_names, num_chunks=0)
        ft = TagSection(SECTION_FILE)
        ft.add("cblen", RadType(rt.U16))
        ft.add("ulen", RadType(rt.U16))
        rtg = TagSection(SECTION_READ)
        rtg.add("b", RadType(rt.int_type_for_seq_len(bclen)))
        rtg.add("u", RadType(rt.int_type_for_seq_len(umilen)))
        at = TagSection(SECTION_ALN)
        at.add("compressed_ori_refid", RadType(rt.U32))
        prelude = RadPrelude(hdr, ft, rtg, at)
        writer = RadWriter(out_fh, prelude, {"cblen": bclen, "ulen": umilen})

    def flush_chunk():
        nonlocal chunk_bcs, chunk_umis, chunk_refs, chunk_offs
        if not chunk_bcs:
            return
        refs_arr = np.asarray(chunk_refs, np.uint64)
        writer.write_chunk(
            read_cols={
                "b": np.asarray(chunk_bcs, np.uint64),
                "u": np.asarray(chunk_umis, np.uint64),
            },
            aln_offsets=np.asarray(chunk_offs, np.int64),
            refs=(refs_arr & np.uint64(0x7FFFFFFF)).astype(np.uint32),
            dirs=(refs_arr & np.uint64(MASK_LOWER_31)) != 0,
        )
        chunk_bcs, chunk_umis, chunk_refs, chunk_offs = [], [], [], [0]

    def emit_group():
        nonlocal total_records
        if not tid_list or pend_bc is None:
            return
        best = max(score_list)
        flist = [t for t, s in zip(tid_list, score_list) if s >= best]
        chunk_bcs.append(pend_bc)
        chunk_umis.append(pend_umi)
        chunk_refs.extend(flist)
        chunk_offs.append(len(chunk_refs))
        total_records += 1
        if len(chunk_bcs) > BUF_LIMIT:
            flush_chunk()

    n_in = 0
    for qname, flag, tid, cr, ur, as_score in it:
        n_in += 1
        if flag & (FLAG_UNMAPPED | FLAG_SUPPLEMENTARY):
            continue
        fwd = not (flag & FLAG_REVERSE)
        enc_tid = tid | MASK_LOWER_31 if fwd else tid
        if qname == cur_qname:
            tid_list.append(enc_tid)
            score_list.append(as_score if (filter_best and as_score is not None) else 1)
            continue
        emit_group()
        cur_qname = qname
        tid_list = []
        score_list = []
        pend_bc = pend_umi = None
        if cr is None or ur is None:
            raise ValueError("Input record missing CR or UR tag!")
        b = _pack_with_n(cr)
        u = _pack_with_n(ur)
        if b is None or u is None:
            cur_qname = qname  # reads of this group will be skipped
            continue
        ensure_writer(len(cr.replace("N", "A", 1)), len(ur.replace("N", "A", 1)))
        pend_bc, pend_umi = b, u
        tid_list.append(enc_tid)
        score_list.append(as_score if (filter_best and as_score is not None) else 1)
    emit_group()
    if writer is None:
        out_fh.close()
        raise ValueError("bam file had no records!")
    flush_chunk()
    n_chunks = writer.finalize()
    out_fh.close()
    log.info(
        "wrote %d records in %d chunks from %d input alignments",
        total_records, n_chunks, n_in,
    )
