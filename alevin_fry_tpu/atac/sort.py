"""atac sort — coordinate-sorted BED (reference: src/atac/sort.rs).

The reference scatters records to genomic-bin temp buckets (bucket
planning from the gpl stage's ``bin_recs.bin`` histogram,
atac/sort.rs:484-512; scatter key = 100kb bin of the start position,
atac/sort.rs:591-610), sorts each bucket, and concatenates buckets in
bin order.  Because bins are prefixes of the (chr, start) order, the
concatenation equals one global sort by (chr, start, frag_len,
barcode) — so a dataset that fits ``max_records`` is sorted wholly in
memory, and a larger one is scattered into contiguous-bin spill
buckets that each fit, with identical output bytes either way.

Per bucket: correct barcodes, drop multimapped records (na > 1,
atac/sort.rs:119-121), sort, run-length count duplicates, and write
BED rows ``chr\tstart\tend\tbarcode\tcount`` for fragments shorter
than MAX_ATAC_FRAG_LEN (write_bed_string, atac/sort.rs:64-86).  BED
rendering is bulk (native formatter when built; vectorized NumPy
otherwise) — never a per-fragment Python loop.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from .. import __version__
from ..constants import ATAC_BIN_SIZE, MAX_ATAC_FRAG_LEN
from ..ops.barcodes import revcomp_packed, unpack_seqs
from ..radz import _native, bincodeio, read_prelude
from ..radz.chunkio import iter_decoded_blocks
from ..radz.records import RecordSchema
from ..utils import check_version_compat, write_json
from ..pipeline.collate import _lookup_map
from ..pipeline.logging_ import get_logger

log = get_logger("atac.sort")

# packed spill-row layout: (chr, start, frag_len, corrected barcode)
_SPILL_DT = np.dtype(
    {
        "names": ["chr", "start", "flen", "bc"],
        "formats": ["<i4", "<i8", "<i4", "<u8"],
        "offsets": [0, 4, 12, 16],
        "itemsize": 24,
    }
)


def format_bed_rows(
    ref_names,
    chrs: np.ndarray,
    starts: np.ndarray,
    frag_lens: np.ndarray,
    bcs: np.ndarray,
    counts: np.ndarray,
    bc_len: int,
    rc: bool,
    n_threads: int = 1,
) -> bytes:
    """Render deduplicated fragments as BED bytes (frag_len-filtered)."""
    keep = frag_lens < MAX_ATAC_FRAG_LEN
    chrs, starts, frag_lens = chrs[keep], starts[keep], frag_lens[keep]
    bcs, counts = bcs[keep], counts[keep]
    if rc:
        bcs = revcomp_packed(bcs, bc_len)
    ends = starts + frag_lens
    if len(chrs) == 0:
        return b""
    if _native.available():
        return _native.format_bed(
            list(ref_names), chrs, starts, ends, bcs, bc_len, counts, n_threads
        )
    # vectorized NumPy fallback: column-wise string assembly
    name_u = np.asarray(list(ref_names), dtype="U")
    tab = np.full(len(chrs), "\t", dtype="U1")
    bcstr = (
        unpack_seqs(bcs, bc_len)
        .view(f"S{bc_len}")
        .ravel()
        .astype(f"U{bc_len}")
    )
    line = name_u[chrs]
    for piece in (
        tab, starts.astype("U20"), tab, ends.astype("U20"), tab,
        bcstr, tab, counts.astype("U20"),
        np.full(len(chrs), "\n", dtype="U1"),
    ):
        line = np.char.add(line, piece)
    return "".join(line.tolist()).encode()


def _plan_buckets(bins: np.ndarray, max_records: int) -> np.ndarray:
    """Greedy grouping of consecutive genomic bins into buckets of at
    most ``max_records`` records (one oversized bin gets its own
    bucket; bins are never split — atac/sort.rs:484-512 semantics).
    Returns bucket id per bin."""
    bucket_of_bin = np.zeros(len(bins), np.int64)
    b = 0
    acc = 0
    for i, c in enumerate(bins.astype(np.int64)):
        if acc > 0 and acc + c > max_records:
            b += 1
            acc = 0
        bucket_of_bin[i] = b
        acc += c
    return bucket_of_bin


def _extract_cols(batch, map_keys, map_vals):
    """Corrected (chr, start, frag_len, barcode) columns of the
    uniquely-mapped, permit-correctable reads of one decoded block."""
    bcs = batch.barcode()
    hit, corrected = _lookup_map(map_keys, map_vals, bcs)
    keep = hit & (batch.num_aln_per_read == 1)
    first_aln = batch.aln_offsets[:-1][keep]
    rows = np.empty(int(keep.sum()), _SPILL_DT)
    rows["chr"] = batch.refs[first_aln].astype(np.int32)
    rows["start"] = batch.aln_cols["start_pos"][first_aln].astype(np.int64)
    rows["flen"] = batch.aln_cols["frag_len"][first_aln].astype(np.int32)
    rows["bc"] = corrected[keep]
    return rows


def _sort_dedup_emit(rows: np.ndarray, ref_names, bc_len, rc, fh, n_threads):
    """Sort one bucket's rows, RLE-dedup, render and write BED.

    Sorting routes through the device segmented-sort kernel when an
    accelerator is attached (ops/atac_device.py, AFT_ATAC_SORT_BACKEND
    dispatches like crlike); the host lexsort is the CPU fallback —
    both orders equal atac/sort.rs:45-62's HitInfo ordering."""
    if len(rows) == 0:
        return 0
    chrs = rows["chr"].astype(np.int64)
    starts = rows["start"]
    flens = rows["flen"].astype(np.int64)
    cbc = rows["bc"]
    from ..ops import atac_device

    (chrs_u, starts_u, flens_u, cbc_u), counts = atac_device.sort_rle(
        [chrs, starts, flens, cbc]
    )
    cbc_u = cbc_u.astype(np.uint64)
    fh.write(format_bed_rows(
        ref_names, chrs_u, starts_u, flens_u, cbc_u, counts, bc_len, rc,
        n_threads,
    ))
    return len(chrs_u)


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

    from ..parallel import dist

    dist.initialize()
    rank, world = dist.rank_world()

    map_keys, map_vals = bincodeio.read_u64_map_file(input_dir / "permit_map.bin")
    bins = bincodeio.read_u64_vec_file(input_dir / "bin_recs.bin")
    blens = bincodeio.read_u64_vec_file(input_dir / "bin_lens.bin").astype(np.int64)
    total_unique = int(bins.sum())

    if rank == 0:
        write_json(input_dir / "sort.json", {
            "cmd": cmdline, "version_str": version,
            "compressed_output": compress_out,
        })

    bedname = input_dir / ("map.bed.gz" if compress_out else "map.bed")
    if rank == 0:
        out_fh = gzip.open(bedname, "wb") if compress_out else open(bedname, "wb")
    else:
        import io

        out_fh = io.BytesIO()  # discarded; rank 0 owns the output

    with open(rad_dir / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        schema = RecordSchema.from_prelude(prelude)
        nc = prelude.hdr.num_chunks if prelude.hdr.num_chunks > 0 else None
        bc_len = int(ftm["cblen"])
        ref_names = prelude.hdr.ref_names

        chunk_range = None
        if world > 1:
            nchunks = nc or int(mdata.get("num-chunks", 0) or 0)
            if nchunks <= 0:
                raise ValueError(
                    "multi-host atac sort needs a chunk count (header or "
                    "gpl metadata)"
                )
            chunk_range = dist.host_chunk_plan(nchunks, world, rank)
            log.info(
                "multi-host atac sort: host %d/%d scatters chunks [%d, %d)",
                rank, world, chunk_range[0], chunk_range[1],
            )

        if world == 1 and total_unique <= max_records:
            # one bucket: global in-memory sort (identical output)
            parts = [
                _extract_cols(batch, map_keys, map_vals)
                for batch in iter_decoded_blocks(fh, schema, nc, max_records)
            ]
            rows = (
                np.concatenate(parts) if parts else np.empty(0, _SPILL_DT)
            )
            n_frag = _sort_dedup_emit(
                rows, ref_names, bc_len, rc, out_fh, num_threads
            )
            out_fh.close()
            log.info("wrote %d deduplicated fragments to %s", n_frag, bedname)
            return

        # out-of-core: scatter rows to contiguous-genomic-bin buckets
        bucket_of_bin = _plan_buckets(bins, max_records)
        n_buckets = int(bucket_of_bin[-1]) + 1 if len(bins) else 1
        log.info(
            "out-of-core sort: %d unique records into %d genomic-bin buckets",
            total_unique, n_buckets,
        )
        spill_dir = input_dir / (
            f"_sort_tmp_r{rank}" if world > 1 else "_sort_tmp"
        )
        spill_dir.mkdir(exist_ok=True)
        files = [open(spill_dir / f"bin_{b}.rows", "wb") for b in range(n_buckets)]
        try:
            from ..pipeline.progress import stage_timer

            pb_ctx = stage_timer(log, "atac sort scatter", "reads")
            pb = pb_ctx.__enter__()
            for batch in iter_decoded_blocks(
                fh, schema, nc, max_records, prefetch=True,
                chunk_range=chunk_range,
            ):
                pb.update(batch.n_reads)
                rows = _extract_cols(batch, map_keys, map_vals)
                if len(rows) == 0:
                    continue
                bin_idx = blens[rows["chr"]] + rows["start"] // ATAC_BIN_SIZE
                bmask = bucket_of_bin[bin_idx]
                order = np.argsort(bmask, kind="stable")
                rows, bmask = rows[order], bmask[order]
                bnds = np.flatnonzero(np.diff(bmask)) + 1
                for seg, b in zip(
                    np.split(rows, bnds), bmask[np.append(0, bnds)]
                ):
                    files[int(b)].write(seg.tobytes())
            pb_ctx.__exit__(None, None, None)
            for f in files:
                f.close()
            n_frag = 0
            for b in range(n_buckets):
                if world > 1:
                    # DCN bucket gather: each host scattered its chunk
                    # range; the bucket's global sort is order-
                    # independent, so rank-order concatenation suffices
                    local = np.fromfile(spill_dir / f"bin_{b}.rows", np.uint8)
                    parts = dist.allgather_ragged(local)
                    rows = (
                        np.concatenate(parts) if parts else local
                    ).view(_SPILL_DT) if rank == 0 else np.empty(0, _SPILL_DT)
                else:
                    rows = np.fromfile(spill_dir / f"bin_{b}.rows", _SPILL_DT)
                n_frag += _sort_dedup_emit(
                    rows, ref_names, bc_len, rc, out_fh, num_threads
                )
                (spill_dir / f"bin_{b}.rows").unlink()
        finally:
            for f in files:
                if not f.closed:
                    f.close()
            for p in spill_dir.glob("bin_*.rows"):
                p.unlink(missing_ok=True)
            try:
                spill_dir.rmdir()
            except OSError:
                pass
    out_fh.close()
    if world > 1:
        dist.barrier("atac_sort_done")
    log.info("wrote %d deduplicated fragments to %s", n_frag, bedname)
