"""atac sort — coordinate-sorted BED (reference: src/atac/sort.rs).

The reference scatters records to genomic-bin temp buckets and sorts
each bucket, then concatenates buckets in bin order.  Since bins are
prefixes of the (chr, start) order, that equals one global sort by
(chr, start, frag_len, barcode) — which is what we do, vectorized:
correct barcodes, drop multimapped records (na > 1,
atac/sort.rs:119-121), sort, run-length count duplicates, and write
BED rows ``chr\tstart\tend\tbarcode\tcount`` for fragments shorter
than MAX_ATAC_FRAG_LEN (write_bed_string, atac/sort.rs:64-86).
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import numpy as np

from .. import __version__
from ..constants import MAX_ATAC_FRAG_LEN
from ..ops.barcodes import revcomp_packed, unpack_seqs
from ..radz import bincodeio, read_prelude
from ..radz.chunkio import decode_all_chunks
from ..radz.records import RecordSchema
from ..utils import check_version_compat, write_json
from ..pipeline.collate import _lookup_map
from ..pipeline.logging_ import get_logger

log = get_logger("atac.sort")


def write_bed_rows(
    fh,
    ref_names,
    chrs: np.ndarray,
    starts: np.ndarray,
    frag_lens: np.ndarray,
    bcs: np.ndarray,
    counts: np.ndarray,
    bc_len: int,
    rc: bool,
):
    keep = frag_lens < MAX_ATAC_FRAG_LEN
    chrs, starts, frag_lens = chrs[keep], starts[keep], frag_lens[keep]
    bcs, counts = bcs[keep], counts[keep]
    if rc:
        bcs = revcomp_packed(bcs, bc_len)
    bmat = unpack_seqs(bcs, bc_len)
    name_arr = np.asarray(list(ref_names), dtype=object)
    lines = []
    ends = starts + frag_lens
    for i in range(len(chrs)):
        lines.append(
            f"{name_arr[chrs[i]]}\t{starts[i]}\t{ends[i]}\t"
            f"{bytes(bmat[i]).decode()}\t{counts[i]}\n"
        )
    fh.write("".join(lines))


def sort(
    input_dir: Path,
    rad_dir: Path,
    num_threads: int = 8,
    max_records: int = 30_000_000,
    compress_out: bool = False,
    cmdline: str = "",
    version: str = __version__,
) -> None:
    input_dir = Path(input_dir)
    rad_dir = Path(rad_dir)
    mdata = check_version_compat(version, input_dir / "generate_permit_list.json")
    rc = bool(mdata["gpl_options"]["rc"])
    for f in ("bin_recs.bin", "bin_lens.bin"):
        if not (input_dir / f).exists():
            raise FileNotFoundError(f"bin file {f} does not exist; re-run atac gpl")

    map_keys, map_vals = bincodeio.read_u64_map_file(input_dir / "permit_map.bin")

    write_json(input_dir / "sort.json", {
        "cmd": cmdline, "version_str": version,
        "compressed_output": compress_out,
    })

    with open(rad_dir / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        schema = RecordSchema.from_prelude(prelude)
        nc = prelude.hdr.num_chunks if prelude.hdr.num_chunks > 0 else None
        batch = decode_all_chunks(fh, schema, nc)
    bc_len = int(ftm["cblen"])

    # correct barcodes; drop non-correctable reads and multimappers
    bcs = batch.barcode()
    hit, corrected = _lookup_map(map_keys, map_vals, bcs)
    uniq_map = batch.num_aln_per_read == 1
    keep = hit & uniq_map
    first_aln = batch.aln_offsets[:-1][keep]
    chrs = batch.refs[first_aln].astype(np.int64)
    starts = batch.aln_cols["start_pos"][first_aln].astype(np.int64)
    flens = batch.aln_cols["frag_len"][first_aln].astype(np.int64)
    cbc = corrected[keep]

    order = np.lexsort((cbc, flens, starts, chrs))
    chrs, starts, flens, cbc = chrs[order], starts[order], flens[order], cbc[order]
    new = np.ones(len(chrs), bool)
    if len(chrs):
        new[1:] = (
            (chrs[1:] != chrs[:-1]) | (starts[1:] != starts[:-1])
            | (flens[1:] != flens[:-1]) | (cbc[1:] != cbc[:-1])
        )
    starts_i = np.flatnonzero(new)
    counts = np.diff(np.append(starts_i, len(chrs)))

    bedname = input_dir / ("map.bed.gz" if compress_out else "map.bed")
    opener = (lambda p: gzip.open(p, "wt")) if compress_out else (lambda p: open(p, "w"))
    with opener(bedname) as fh:
        write_bed_rows(
            fh, prelude.hdr.ref_names,
            chrs[starts_i], starts[starts_i], flens[starts_i], cbc[starts_i],
            counts, bc_len, rc,
        )
    log.info("wrote %d deduplicated fragments to %s", len(starts_i), bedname)
