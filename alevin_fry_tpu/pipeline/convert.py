"""convert — BAM/SAM (transcriptomic coordinates) to RAD.

Re-implements src/convert.rs:167-594 with a columnar design: the
native scanner (csrc/radc.cpp::radc_bam_scan) walks decompressed BAM
records and emits numpy columns (flag, tid, 2-bit packed CR/UR, AS,
same-qname-as-previous-kept flag); read grouping, best-AS filtering
and chunk assembly are then pure vectorized numpy.  SAM input is
parsed per line (text format) but batched into the same columns so
both paths share one grouping engine.

Behavioral spec (from the reference):

* consecutive alignments sharing a qname form one read record
  (grouping is evaluated between *kept* records only — skipped
  unmapped/supplementary lines do not break a qname run);
* barcode/UMI come from the CR/UR tags, 2-bit packed with a single
  N->A replacement (more than one N drops the read,
  convert.rs:525-531);
* with ``--filter_best`` only alignments whose AS ties the group best
  are kept (convert.rs:461-468); a missing AS scores 1;
* forward orientation sets the high bit of the u32 ref id
  (convert.rs:441-444); unmapped (0x4) and supplementary (0x800)
  records are skipped;
* records are written in ~10k-record chunks with the num_chunks
  header backpatch (convert.rs:584-590).

Divergence note: when a read's barcode or UMI still contains an N
after the single replacement, the reference half-skips the record in a
way that can leak the previous read's alignment list (convert.rs
:525-552 interplay); we drop the whole read cleanly.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..radz import RadHeader, RadPrelude, RadWriter
from ..radz import types as rt
from ..radz import _native as native
from ..radz.types import RadType, TagSection, SECTION_ALN, SECTION_FILE, SECTION_READ
from ..ops.barcodes import pack_seq
from .logging_ import get_logger

log = get_logger("convert")

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SUPPLEMENTARY = 0x800
FLAG_SKIP = FLAG_UNMAPPED | FLAG_SUPPLEMENTARY
MASK_LOWER_31 = 0x8000_0000
BUF_LIMIT = 10_000
AS_MISSING = np.int32(np.iinfo(np.int32).min)
_SCAN_BUF = 1 << 22
_SAM_BATCH = 1 << 16


def _pack_with_n(seq: str) -> Optional[int]:
    """Pack; replace the first N with A, drop if any N remains
    (convert.rs:525-531)."""
    s = seq.replace("N", "A", 1)
    if "N" in s:
        return None
    return pack_seq(s)


def _bam_scan_py(buf: bytes, qname_state: np.ndarray):
    """Pure-Python fallback with the native scanner's exact contract
    (same columns, carry-over qname state, bytes_consumed)."""
    pos = 0
    n = len(buf)
    recs: List[tuple] = []
    prev_len = int(np.frombuffer(qname_state[:2].tobytes(), np.uint16)[0])
    prev_q = qname_state[2 : 2 + prev_len].tobytes()
    while pos + 4 <= n:
        (block_size,) = struct.unpack_from("<I", buf, pos)
        if block_size < 32:
            raise ValueError("structurally invalid BAM record")
        if pos + 4 + block_size > n:
            break
        r = buf[pos + 4 : pos + 4 + block_size]
        tid, _p, l_qname, _mq, _bin, n_cigar, flag, l_read = struct.unpack_from(
            "<iiBBHHHi", r, 0
        )
        off = 32 + l_qname + 4 * n_cigar + (l_read + 1) // 2 + l_read
        if l_read < 0 or off > block_size:
            raise ValueError("structurally invalid BAM record")
        qname = r[32 : 32 + max(l_qname - 1, 0)]
        same = qname == prev_q
        if not (flag & FLAG_SKIP):
            prev_q = qname
        cr, ur, as_score = _parse_bam_tags_py(r[off:])
        b = _pack_with_n(cr) if cr is not None else None
        u = _pack_with_n(ur) if ur is not None else None
        recs.append((
            flag, tid,
            b or 0, len(cr) if cr is not None else -1, b is not None,
            u or 0, len(ur) if ur is not None else -1, u is not None,
            as_score if as_score is not None else int(AS_MISSING), same,
        ))
        pos += 4 + block_size
    qname_state[:] = 0
    qname_state[:2] = np.frombuffer(
        np.uint16(len(prev_q)).tobytes(), np.uint8
    )
    qname_state[2 : 2 + len(prev_q)] = np.frombuffer(prev_q, np.uint8)
    a = np.asarray(recs, object) if recs else np.zeros((0, 10), object)
    cols = {
        "flags": a[:, 0].astype(np.uint16),
        "tid": a[:, 1].astype(np.int32),
        "bc": a[:, 2].astype(np.uint64),
        "bclen": a[:, 3].astype(np.int32),
        "bc_valid": a[:, 4].astype(bool),
        "umi": a[:, 5].astype(np.uint64),
        "umilen": a[:, 6].astype(np.int32),
        "umi_valid": a[:, 7].astype(bool),
        "as": a[:, 8].astype(np.int32),
        "same_qname": a[:, 9].astype(bool),
    }
    return cols, pos


def _parse_bam_tags_py(buf: bytes):
    """Extract CR, UR (strings) and AS (int) from a BAM aux blob."""
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
            if cnt < 0:
                raise ValueError("structurally invalid BAM record")
            sz = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            pos += 5 + cnt * sz
            val = None
        else:
            break
        if tag == "CR" and isinstance(val, str):
            cr = val
        elif tag == "UR" and isinstance(val, str):
            ur = val
        elif tag == "AS" and isinstance(val, int):
            as_score = int(val)
    return cr, ur, as_score


class _BgzfReader:
    """Forward-only threaded BGZF reader.

    BAM's container format is BGZF: independent gzip members <= 64 KB,
    each carrying its compressed size in a BC extra subfield.  The
    reference inflates them with a multithreaded bgzf reader
    (convert.rs:205-220); the Python ``gzip`` module is a single
    sequential stream and was the convert bottleneck once the record
    scan went native.  Here the boundary scan is a cheap per-block
    Python loop over raw file chunks and the payload inflation fans out
    across threads in native code (radc_bgzf_inflate)."""

    def __init__(self, path, chunk_bytes: int = 8 << 20):
        self._fh = open(path, "rb")
        self._chunk = chunk_bytes
        self._carry = b""
        self._out = b""
        self._pos = 0
        self._eof = False

    @staticmethod
    def sniff(head: bytes) -> bool:
        """True when ``head`` (>= 18 bytes) starts a BGZF member."""
        if len(head) < 18 or head[:2] != b"\x1f\x8b" or head[2] != 8:
            return False
        if not head[3] & 4:  # FEXTRA
            return False
        xlen = int.from_bytes(head[10:12], "little")
        extra = head[12 : 12 + min(xlen, len(head) - 12)]
        pos = 0
        while pos + 4 <= len(extra):
            si1, si2 = extra[pos], extra[pos + 1]
            slen = int.from_bytes(extra[pos + 2 : pos + 4], "little")
            if si1 == 66 and si2 == 67 and slen == 2:
                return True
            pos += 4 + slen
        return False

    def _scan_blocks(self, raw: bytes):
        offs, lens, isizes, crcs = [], [], [], []
        pos = 0
        while pos + 18 <= len(raw):
            if raw[pos : pos + 2] != b"\x1f\x8b" or raw[pos + 2] != 8:
                raise ValueError("corrupt BGZF member header")
            xlen = int.from_bytes(raw[pos + 10 : pos + 12], "little")
            extra = raw[pos + 12 : pos + 12 + xlen]
            if len(extra) < xlen:
                break  # header split across chunks
            bsize = None
            e = 0
            while e + 4 <= xlen:
                si1, si2 = extra[e], extra[e + 1]
                slen = int.from_bytes(extra[e + 2 : e + 4], "little")
                if si1 == 66 and si2 == 67 and slen == 2:
                    bsize = int.from_bytes(extra[e + 4 : e + 6], "little") + 1
                e += 4 + slen
            if bsize is None:
                raise ValueError("gzip member without a BGZF BC subfield")
            if pos + bsize > len(raw):
                break
            offs.append(pos + 12 + xlen)
            lens.append(bsize - 12 - xlen - 8)
            crcs.append(
                int.from_bytes(raw[pos + bsize - 8 : pos + bsize - 4], "little")
            )
            isizes.append(
                int.from_bytes(raw[pos + bsize - 4 : pos + bsize], "little")
            )
            pos += bsize
        return offs, lens, isizes, crcs, pos

    def _fill(self) -> None:
        data = self._fh.read(self._chunk)
        raw = self._carry + data
        if not data:
            self._eof = True
            if raw:
                raise ValueError("truncated BGZF stream")
            return
        offs, lens, isizes, crcs, consumed = self._scan_blocks(raw)
        self._carry = raw[consumed:]
        if not offs:
            return
        out_offs = np.zeros(len(isizes) + 1, np.int64)
        np.cumsum(np.asarray(isizes, np.int64), out=out_offs[1:])
        out = np.empty(int(out_offs[-1]), np.uint8)
        native.bgzf_inflate(
            np.frombuffer(raw, np.uint8),
            np.asarray(offs, np.int64), np.asarray(lens, np.int64),
            out_offs[:-1], np.asarray(isizes, np.int64), out,
            crcs=np.asarray(crcs, np.uint32),
        )
        self._out = self._out[self._pos :] + out.tobytes()
        self._pos = 0

    def read(self, n: int) -> bytes:
        while len(self._out) - self._pos < n and not self._eof:
            self._fill()
        b = self._out[self._pos : self._pos + n]
        self._pos += len(b)
        return b

    def close(self) -> None:
        self._fh.close()


def _open_bam_stream(path: Path):
    """BGZF-threaded reader when the native library is built and the
    file really is BGZF; plain ``gzip`` stream otherwise (valid BAMs in
    a bare gzip member decode identically, just single-threaded)."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(64)
    except OSError:
        head = b""
    if native.available() and _BgzfReader.sniff(head):
        return _BgzfReader(path)
    return gzip.open(path, "rb")


def iter_bam_columns(path: Path) -> Tuple[List[str], Iterator[dict]]:
    """Columnar batches from a BAM file (native scanner when built,
    pure-Python fallback otherwise — same column contract)."""
    fh = _open_bam_stream(path)
    magic = fh.read(4)
    if magic != b"BAM\x01":
        fh.close()
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
        scan = native.bam_scan if native.available() else _bam_scan_py
        qstate = np.zeros(258, np.uint8)
        carry = b""
        while True:
            data = fh.read(_SCAN_BUF)
            if not data:
                break
            buf = carry + data
            cols, consumed = scan(buf, qstate)
            carry = buf[consumed:]
            if cols["flags"].size:
                yield cols
        fh.close()
        if carry:
            raise ValueError("truncated BAM record at end of file")

    return names, gen()


def iter_sam_columns(path: Path) -> Tuple[List[str], Iterator[dict]]:
    """Batched columnar parse of a SAM file (same column contract as
    the native BAM scanner)."""
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

    def gen():
        prev_qname = None  # last *kept* record's qname, across batches
        pending = [] if first_aln is None else [first_aln]

        def emit(lines):
            nonlocal prev_qname
            n = len(lines)
            flags = np.empty(n, np.uint16)
            tid = np.empty(n, np.int32)
            bc = np.zeros(n, np.uint64)
            bclen = np.full(n, -1, np.int32)
            bc_valid = np.zeros(n, bool)
            umi = np.zeros(n, np.uint64)
            umilen = np.full(n, -1, np.int32)
            umi_valid = np.zeros(n, bool)
            as_score = np.full(n, AS_MISSING, np.int32)
            same = np.zeros(n, bool)
            for i, line in enumerate(lines):
                toks = line.rstrip("\n").split("\t")
                qname, flag = toks[0], int(toks[1])
                flags[i] = flag
                tid[i] = name_to_id.get(toks[2], -1)
                same[i] = qname == prev_qname
                if not (flag & FLAG_SKIP):
                    prev_qname = qname
                for t in toks[11:]:
                    if t.startswith("CR:Z:"):
                        cr = t[5:]
                        bclen[i] = len(cr)
                        b = _pack_with_n(cr)
                        if b is not None:
                            bc[i] = b
                            bc_valid[i] = True
                    elif t.startswith("UR:Z:"):
                        ur = t[5:]
                        umilen[i] = len(ur)
                        u = _pack_with_n(ur)
                        if u is not None:
                            umi[i] = u
                            umi_valid[i] = True
                    elif t.startswith("AS:i:"):
                        as_score[i] = int(t[5:])
            return {
                "flags": flags, "tid": tid,
                "bc": bc, "bclen": bclen, "bc_valid": bc_valid,
                "umi": umi, "umilen": umilen, "umi_valid": umi_valid,
                "as": as_score, "same_qname": same,
            }

        for line in fh:
            pending.append(line)
            if len(pending) >= _SAM_BATCH:
                yield emit(pending)
                pending = []
        fh.close()
        if pending:
            yield emit(pending)

    return names, gen()


class _GroupEmitter:
    """Vectorized qname-run grouping + chunked RAD writing.

    Feeds on columnar batches; a group that may continue into the next
    batch is carried as ``pend`` and finalized when the next group
    starts (or at close).  Mirrors the reference's streaming grouping
    loop (convert.rs:420-560) without per-record Python work.
    """

    def __init__(self, out_fh, ref_names: List[str], filter_best: bool):
        self.out_fh = out_fh
        self.ref_names = ref_names
        self.filter_best = filter_best
        self.writer: Optional[RadWriter] = None
        self.total_records = 0
        self.n_in = 0
        # pending (possibly continuing) group
        self._pend: Optional[dict] = None
        # chunk accumulators: per-group bc/umi/ref-count + flat refs
        self._g_bc: List[np.ndarray] = []
        self._g_umi: List[np.ndarray] = []
        self._g_cnt: List[np.ndarray] = []
        self._refs: List[np.ndarray] = []
        self._n_groups = 0

    # -- writer / chunk plumbing -------------------------------------

    def _ensure_writer(self, bclen: int, umilen: int) -> None:
        if self.writer is not None:
            return
        hdr = RadHeader(is_paired=0, ref_names=self.ref_names, num_chunks=0)
        ft = TagSection(SECTION_FILE)
        ft.add("cblen", RadType(rt.U16))
        ft.add("ulen", RadType(rt.U16))
        rtg = TagSection(SECTION_READ)
        rtg.add("b", RadType(rt.int_type_for_seq_len(bclen)))
        rtg.add("u", RadType(rt.int_type_for_seq_len(umilen)))
        at = TagSection(SECTION_ALN)
        at.add("compressed_ori_refid", RadType(rt.U32))
        prelude = RadPrelude(hdr, ft, rtg, at)
        self.writer = RadWriter(
            self.out_fh, prelude, {"cblen": bclen, "ulen": umilen}
        )

    def _flush_chunk(self) -> None:
        if self._n_groups == 0:
            return
        bcs = np.concatenate(self._g_bc)
        umis = np.concatenate(self._g_umi)
        cnts = np.concatenate(self._g_cnt)
        refs = np.concatenate(self._refs) if self._refs else np.empty(0, np.uint64)
        offs = np.zeros(cnts.size + 1, np.int64)
        np.cumsum(cnts, out=offs[1:])
        self.writer.write_chunk(
            read_cols={"b": bcs, "u": umis},
            aln_offsets=offs,
            refs=(refs & np.uint64(0x7FFFFFFF)).astype(np.uint32),
            dirs=(refs & np.uint64(MASK_LOWER_31)) != 0,
        )
        self._g_bc, self._g_umi, self._g_cnt, self._refs = [], [], [], []
        self._n_groups = 0

    def _append_groups(self, bc, umi, cnt, refs) -> None:
        self._g_bc.append(np.ascontiguousarray(bc, np.uint64))
        self._g_umi.append(np.ascontiguousarray(umi, np.uint64))
        self._g_cnt.append(np.ascontiguousarray(cnt, np.int64))
        self._refs.append(np.ascontiguousarray(refs, np.uint64))
        self._n_groups += int(bc.size)
        self.total_records += int(bc.size)
        if self._n_groups >= BUF_LIMIT:
            self._flush_chunk()

    # -- grouping ------------------------------------------------------

    def _finalize_pend(self) -> None:
        p = self._pend
        self._pend = None
        if p is None or not p["valid"]:
            return
        refs = np.concatenate(p["refs"])
        scores = np.concatenate(p["scores"])
        if self.filter_best:
            keep = scores >= scores.max()
            refs = refs[keep]
        if refs.size == 0:
            return
        self._ensure_writer(p["bclen"], p["umilen"])
        self._append_groups(
            np.asarray([p["bc"]], np.uint64),
            np.asarray([p["umi"]], np.uint64),
            np.asarray([refs.size], np.int64),
            refs,
        )

    def feed(self, cols: dict) -> None:
        self.n_in += int(cols["flags"].size)
        kept = (cols["flags"] & FLAG_SKIP) == 0
        k = np.flatnonzero(kept)
        if k.size == 0:
            return
        fwd = (cols["flags"][k] & FLAG_REVERSE) == 0
        enc = cols["tid"][k].astype(np.uint64)
        enc[fwd] |= np.uint64(MASK_LOWER_31)
        if self.filter_best:
            a = cols["as"][k]
            scores = np.where(a == AS_MISSING, np.int32(1), a)
        else:
            scores = np.ones(k.size, np.int32)
        same = cols["same_qname"][k]
        starts = np.flatnonzero(~same)
        if self._pend is None and (starts.size == 0 or starts[0] != 0):
            # no carried group to continue: force a group start
            starts = np.concatenate([[0], starts]).astype(np.int64)

        if starts.size == 0:
            # whole batch continues the pending group
            self._pend["refs"].append(enc)
            self._pend["scores"].append(scores)
            return
        s0 = int(starts[0])
        if s0 > 0:
            self._pend["refs"].append(enc[:s0])
            self._pend["scores"].append(scores[:s0])
        self._finalize_pend()

        # complete groups: [starts[i], starts[i+1]) for i < len-1
        if starts.size > 1:
            self._emit_complete(
                cols, k, enc, scores, starts[:-1].astype(np.int64),
                int(starts[-1]),
            )
        # last group becomes the new pend
        sl = int(starts[-1])
        fi = int(k[sl])
        bcl, uml = int(cols["bclen"][fi]), int(cols["umilen"][fi])
        if bcl < 0 or uml < 0:
            raise ValueError("Input record missing CR or UR tag!")
        self._pend = {
            "bc": int(cols["bc"][fi]), "umi": int(cols["umi"][fi]),
            "bclen": bcl, "umilen": uml,
            "valid": bool(cols["bc_valid"][fi]) and bool(cols["umi_valid"][fi]),
            "refs": [enc[sl:]], "scores": [scores[sl:]],
        }

    def _emit_complete(self, cols, k, enc, scores, starts, end) -> None:
        """Emit the fully-contained groups of this batch in one
        vectorized pass (group g spans [starts[g], starts[g+1]),
        bounded by ``end``)."""
        firsts = k[starts]
        bclen = cols["bclen"][firsts]
        umilen = cols["umilen"][firsts]
        if np.any(bclen < 0) or np.any(umilen < 0):
            raise ValueError("Input record missing CR or UR tag!")
        valid_g = cols["bc_valid"][firsts] & cols["umi_valid"][firsts]

        bounds = np.concatenate([starts, [end]]).astype(np.int64)
        counts = np.diff(bounds)
        gid = np.repeat(np.arange(starts.size), counts)
        seg_refs = enc[bounds[0]:end]
        seg_scores = scores[bounds[0]:end]
        rel = bounds - bounds[0]
        if self.filter_best:
            gmax = np.maximum.reduceat(seg_scores, rel[:-1])
            keep = seg_scores >= gmax[gid]
        else:
            keep = np.ones(seg_scores.size, bool)
        keep &= valid_g[gid]
        cnt = np.add.reduceat(keep, rel[:-1]) if keep.size else np.zeros(0, np.int64)
        sel_g = valid_g & (cnt > 0)
        if not np.any(sel_g):
            return
        if self.writer is None:
            fv = int(np.flatnonzero(sel_g)[0])
            self._ensure_writer(int(bclen[fv]), int(umilen[fv]))
        self._append_groups(
            cols["bc"][firsts][sel_g],
            cols["umi"][firsts][sel_g],
            cnt[sel_g].astype(np.int64),
            seg_refs[keep],
        )

    def close(self) -> int:
        self._finalize_pend()
        if self.writer is None:
            raise ValueError("bam file had no records!")
        self._flush_chunk()
        return self.writer.finalize()


def bam2rad(
    input_file: Path, rad_file: Path, num_threads: int = 1,
    filter_best: bool = False,
) -> None:
    input_file = Path(input_file)
    ext = input_file.suffix.lower()
    if ext == ".bam":
        ref_names, batches = iter_bam_columns(input_file)
    elif ext == ".sam":
        ref_names, batches = iter_sam_columns(input_file)
    else:
        raise ValueError(
            "unsupported input file format, must end with bam/BAM or sam/SAM"
        )

    rad_file = Path(rad_file)
    rad_file.parent.mkdir(parents=True, exist_ok=True)

    with open(rad_file, "wb") as out_fh:
        em = _GroupEmitter(out_fh, ref_names, filter_best)
        for cols in batches:
            em.feed(cols)
        n_chunks = em.close()
    log.info(
        "wrote %d records in %d chunks from %d input alignments",
        em.total_records, n_chunks, em.n_in,
    )
