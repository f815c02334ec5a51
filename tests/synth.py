"""Synthetic RAD file builders for tests.

Python port of the pattern used by the reference's integration tests
(tests/multi_barcode_integration.rs:35-202): deterministic packed
barcodes, programmatic prelude construction, chunk writing through the
RAD writer, no RNG.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

from alevin_fry_tpu.radz import RadHeader, RadPrelude, RadWriter
from alevin_fry_tpu.radz import types as rt
from alevin_fry_tpu.radz.types import RadType, TagSection, SECTION_FILE, SECTION_READ, SECTION_ALN


def make_packed_bc(idx: int, length: int) -> int:
    """Deterministic barcode from an index (multi_barcode_integration.rs:35-40)."""
    mask = (1 << (2 * length)) - 1
    return (idx * 2654435761) & mask


def make_rna_prelude(
    ref_names: List[str], bc_len: int = 16, umi_len: int = 12
) -> Tuple[RadPrelude, dict]:
    """Classic short-read scRNA prelude: file tags cblen/ulen, read tags
    b/u, aln tag compressed_ori_refid (cf. src/convert.rs:280-370)."""
    hdr = RadHeader(is_paired=0, ref_names=list(ref_names), num_chunks=0)
    ft = TagSection(SECTION_FILE)
    ft.add("cblen", RadType(rt.U16))
    ft.add("ulen", RadType(rt.U16))
    rtg = TagSection(SECTION_READ)
    rtg.add("b", RadType(rt.int_type_for_seq_len(bc_len)))
    rtg.add("u", RadType(rt.int_type_for_seq_len(umi_len)))
    at = TagSection(SECTION_ALN)
    at.add("compressed_ori_refid", RadType(rt.U32))
    prelude = RadPrelude(hdr, ft, rtg, at)
    ftv = {"cblen": bc_len, "ulen": umi_len}
    return prelude, ftv


def write_rna_rad(
    path: Path,
    ref_names: List[str],
    reads_per_chunk: Sequence[Sequence[tuple]],
    bc_len: int = 16,
    umi_len: int = 12,
) -> None:
    """Write a classic RNA RAD file.

    ``reads_per_chunk`` is a list of chunks; each chunk a list of reads
    ``(bc, umi, [(ref_id, fw_bool), ...])``.
    """
    prelude, ftv = make_rna_prelude(ref_names, bc_len, umi_len)
    with open(path, "wb") as fh:
        w = RadWriter(fh, prelude, ftv)
        for chunk in reads_per_chunk:
            bcs, umis, refs, dirs, offs = [], [], [], [], [0]
            for bc, umi, alns in chunk:
                bcs.append(bc)
                umis.append(umi)
                for r, d in alns:
                    refs.append(r)
                    dirs.append(d)
                offs.append(len(refs))
            w.write_chunk(
                read_cols={
                    "b": np.asarray(bcs, np.uint64),
                    "u": np.asarray(umis, np.uint64),
                },
                aln_offsets=np.asarray(offs, np.int64),
                refs=np.asarray(refs, np.uint32),
                dirs=np.asarray(dirs, bool),
            )
        w.finalize()


def make_multi_bc_prelude(
    ref_names: List[str],
    sample_bc_len: int = 8,
    cell_bc_len: int = 16,
    umi_len: int = 12,
) -> Tuple[RadPrelude, dict]:
    """Multi-barcode (10x Flex) prelude mirroring
    tests/multi_barcode_integration.rs:43-117."""
    hdr = RadHeader(is_paired=0, ref_names=list(ref_names), num_chunks=0)
    ft = TagSection(SECTION_FILE)
    ft.add("num_barcodes", RadType(rt.U16))
    ft.add("b0len", RadType(rt.U16))
    ft.add("b1len", RadType(rt.U16))
    ft.add("ulen", RadType(rt.U16))
    ft.add("known_rad_type", RadType(rt.STRING))
    rtg = TagSection(SECTION_READ)
    rtg.add("b0", RadType(rt.U32))
    rtg.add("b1", RadType(rt.U32))
    rtg.add("u", RadType(rt.U32))
    at = TagSection(SECTION_ALN)
    at.add("compressed_ori_refid", RadType(rt.U32))
    prelude = RadPrelude(hdr, ft, rtg, at)
    ftv = {
        "num_barcodes": 2,
        "b0len": sample_bc_len,
        "b1len": cell_bc_len,
        "ulen": umi_len,
        "known_rad_type": "sc_rna_multi_bc",
    }
    return prelude, ftv


def write_multi_bc_rad(
    path: Path,
    ref_names: List[str],
    num_samples: int,
    cells_per_sample: int,
    reads_per_cell: int,
    sample_barcodes: Sequence[int],
    share_cell_barcodes: bool = False,
    sample_bc_len: int = 8,
    cell_bc_len: int = 16,
    umi_len: int = 12,
):
    """Port of create_synthetic_multi_bc_rad_with_shared_cells
    (tests/multi_barcode_integration.rs:141-202)."""
    prelude, ftv = make_multi_bc_prelude(ref_names, sample_bc_len, cell_bc_len, umi_len)
    nrefs = len(ref_names)
    with open(path, "wb") as fh:
        w = RadWriter(fh, prelude, ftv)
        for cell_idx in range(cells_per_sample):
            for sample_idx, sample_bc in enumerate(sample_barcodes[:num_samples]):
                seed = cell_idx if share_cell_barcodes else sample_idx * 1000 + cell_idx
                cell_bc = make_packed_bc(seed, cell_bc_len)
                b0, b1, u, refs, dirs, offs = [], [], [], [], [], [0]
                for read_idx in range(reads_per_cell):
                    umi = make_packed_bc(
                        sample_idx * 100000 + cell_idx * 100 + read_idx, umi_len
                    )
                    b0.append(sample_bc)
                    b1.append(cell_bc)
                    u.append(umi)
                    refs.append(read_idx % nrefs)
                    dirs.append(True)
                    offs.append(len(refs))
                w.write_chunk(
                    read_cols={
                        "b0": np.asarray(b0, np.uint64),
                        "b1": np.asarray(b1, np.uint64),
                        "u": np.asarray(u, np.uint64),
                    },
                    aln_offsets=np.asarray(offs, np.int64),
                    refs=np.asarray(refs, np.uint32),
                    dirs=np.asarray(dirs, bool),
                )
        w.finalize()


def make_longread_prelude(
    ref_names: List[str], bc_len: int = 16, umi_len: int = 12
) -> Tuple[RadPrelude, dict]:
    """Long-read scRNA prelude: aln tags as/start/end (+ tlen) trigger
    the RnaLong record type (src/utils.rs:324-331)."""
    hdr = RadHeader(is_paired=0, ref_names=list(ref_names), num_chunks=0)
    ft = TagSection(SECTION_FILE)
    ft.add("cblen", RadType(rt.U16))
    ft.add("ulen", RadType(rt.U16))
    rtg = TagSection(SECTION_READ)
    rtg.add("b", RadType(rt.int_type_for_seq_len(bc_len)))
    rtg.add("u", RadType(rt.int_type_for_seq_len(umi_len)))
    at = TagSection(SECTION_ALN)
    at.add("compressed_ori_refid", RadType(rt.U32))
    at.add("as", RadType(rt.U32))
    at.add("start", RadType(rt.U32))
    at.add("end", RadType(rt.U32))
    at.add("tlen", RadType(rt.U32))
    prelude = RadPrelude(hdr, ft, rtg, at)
    return prelude, {"cblen": bc_len, "ulen": umi_len}


def write_longread_rad(
    path: Path,
    ref_names: List[str],
    reads_per_chunk: Sequence[Sequence[tuple]],
    bc_len: int = 16,
    umi_len: int = 12,
) -> None:
    """Each read: (bc, umi, [(ref, fw, as, start, end, tlen), ...])."""
    prelude, ftv = make_longread_prelude(ref_names, bc_len, umi_len)
    with open(path, "wb") as fh:
        w = RadWriter(fh, prelude, ftv)
        for chunk in reads_per_chunk:
            bcs, umis, refs, dirs, offs = [], [], [], [], [0]
            a_s, st, en, tl = [], [], [], []
            for bc, umi, alns in chunk:
                bcs.append(bc)
                umis.append(umi)
                for r, d, asv, s0, e0, t0 in alns:
                    refs.append(r)
                    dirs.append(d)
                    a_s.append(asv & 0xFFFFFFFF)
                    st.append(s0)
                    en.append(e0)
                    tl.append(t0)
                offs.append(len(refs))
            w.write_chunk(
                read_cols={
                    "b": np.asarray(bcs, np.uint64),
                    "u": np.asarray(umis, np.uint64),
                },
                aln_offsets=np.asarray(offs, np.int64),
                refs=np.asarray(refs, np.uint32),
                dirs=np.asarray(dirs, bool),
                aln_cols={
                    "as": np.asarray(a_s, np.uint64),
                    "start": np.asarray(st, np.uint64),
                    "end": np.asarray(en, np.uint64),
                    "tlen": np.asarray(tl, np.uint64),
                },
            )
        w.finalize()


def make_atac_prelude(
    ref_names: List[str], ref_lens: List[int], bc_len: int = 16
) -> Tuple[RadPrelude, dict]:
    """ATAC prelude: aln tags {ref, type, start_pos, frag_len}
    (record sniffing per src/utils.rs:340-350)."""
    hdr = RadHeader(is_paired=1, ref_names=list(ref_names), num_chunks=0)
    ft = TagSection(SECTION_FILE)
    ft.add("cblen", RadType(rt.U16))
    ft.add("ref_lengths", RadType(rt.ARRAY, rt.U64, rt.U64))
    rtg = TagSection(SECTION_READ)
    rtg.add("barcode", RadType(rt.int_type_for_seq_len(bc_len)))
    at = TagSection(SECTION_ALN)
    at.add("ref", RadType(rt.U32))
    at.add("type", RadType(rt.U8))
    at.add("start_pos", RadType(rt.U32))
    at.add("frag_len", RadType(rt.U16))
    prelude = RadPrelude(hdr, ft, rtg, at)
    ftv = {"cblen": bc_len, "ref_lengths": np.asarray(ref_lens, np.uint64)}
    return prelude, ftv


def write_atac_rad(
    path: Path,
    ref_names: List[str],
    ref_lens: List[int],
    reads_per_chunk: Sequence[Sequence[tuple]],
    bc_len: int = 16,
) -> None:
    """Write an ATAC RAD file.  Each read is
    ``(bc, [(ref, map_type, start_pos, frag_len), ...])``."""
    prelude, ftv = make_atac_prelude(ref_names, ref_lens, bc_len)
    with open(path, "wb") as fh:
        w = RadWriter(fh, prelude, ftv)
        for chunk in reads_per_chunk:
            bcs, refs, mtype, spos, flen, offs = [], [], [], [], [], [0]
            for bc, alns in chunk:
                bcs.append(bc)
                for r, t, s, fl in alns:
                    refs.append(r)
                    mtype.append(t)
                    spos.append(s)
                    flen.append(fl)
                offs.append(len(refs))
            w.write_chunk(
                read_cols={"barcode": np.asarray(bcs, np.uint64)},
                aln_offsets=np.asarray(offs, np.int64),
                refs=np.asarray(refs, np.uint32),
                dirs=np.zeros(len(refs), bool),
                aln_cols={
                    "type": np.asarray(mtype, np.uint64),
                    "start_pos": np.asarray(spos, np.uint64),
                    "frag_len": np.asarray(flen, np.uint64),
                },
            )
        w.finalize()
