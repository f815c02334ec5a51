"""atac deduplicate (reference: src/atac/deduplicate.rs).

Over the *collated* RAD (one chunk per cell): keep uniquely-mapped
proper pairs (na == 1 and map_type == 4, atac/deduplicate.rs:187),
sort each cell's HitInfo records, run-length deduplicate with counts,
and write BED rows (fragments >= 2000bp counted but not written).
Reports the reference's four counters.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .. import __version__
from ..constants import MAX_ATAC_FRAG_LEN
from ..radz import read_prelude
from ..radz.chunkio import iter_decoded_blocks
from ..radz.records import RecordSchema
from .sort import format_bed_rows
from ..pipeline.logging_ import get_logger

log = get_logger("atac.dedup")


def deduplicate(
    input_dir: Path,
    num_threads: int = 8,
    rev: bool = True,
    cmdline: str = "",
    version: str = __version__,
) -> dict:
    import os

    input_dir = Path(input_dir)
    with open(input_dir / "collate.json") as fh:
        collate_md = json.load(fh)
    compressed = bool(collate_md["compressed_output"])
    if compressed:
        from ..radz import snappyz

        br = snappyz.SnappyFrameReader(
            open(input_dir / "map.collated.rad.sz", "rb")
        )
    else:
        br = open(input_dir / "map.collated.rad", "rb")
    block_records = int(os.environ.get("AFT_QUANT_BLOCK_RECORDS", 30_000_000))
    stats = {
        "num_multimapped": 0,
        "num_dedup": 0,
        "num_non_mapped_pair": 0,
        "num_frag_len_over_max": 0,
    }
    from ..parallel import dist

    dist.initialize()
    rank, world = dist.rank_world()

    try:
        prelude, ftm, _ = read_prelude(br)
        getattr(br, "drop_history", lambda: None)()
        schema = RecordSchema.from_prelude(prelude)
        bc_len = int(ftm["cblen"])
        chunk_range = None
        if world > 1:
            # per-host cell-chunk ranges; each host writes a local
            # partial BED (output order = chunk order), stream-merged
            # at rank 0 over bounded DCN chunks below
            chunk_range = dist.host_chunk_plan(
                prelude.hdr.num_chunks, world, rank
            )
            log.info(
                "multi-host atac dedup: host %d/%d owns cell chunks "
                "[%d, %d)", rank, world, chunk_range[0], chunk_range[1],
            )
            bed_path = input_dir / f".map.bed.r{rank}"
        else:
            bed_path = input_dir / "map.bed"
        # the collated file holds one chunk per cell, so streamed blocks
        # contain whole cells and per-block dedup is exact (the
        # reference's workers pop per-cell chunks, deduplicate.rs:175-226)
        with open(bed_path, "wb") as out:
            for batch in iter_decoded_blocks(
                br, schema, prelude.hdr.num_chunks, block_records,
                prefetch=True, chunk_range=chunk_range,
            ):
                na = batch.num_aln_per_read
                first_aln = batch.aln_offsets[:-1]
                mtype = np.zeros(batch.n_reads, np.int64)
                valid_first = na > 0
                mtype[valid_first] = batch.aln_cols["type"][
                    first_aln[valid_first]
                ].astype(np.int64)

                stats["num_multimapped"] += int((na > 1).sum())
                stats["num_non_mapped_pair"] += int(
                    ((na == 1) & (mtype != 4)).sum()
                )

                keep = (na == 1) & (mtype == 4)
                fa = first_aln[keep]
                cell = batch.chunk_id[keep]
                chrs = batch.refs[fa].astype(np.int64)
                starts = batch.aln_cols["start_pos"][fa].astype(np.int64)
                flens = batch.aln_cols["frag_len"][fa].astype(np.int64)
                bcs = batch.barcode()[keep]

                # per-cell sort + dedup (cells are contiguous chunks;
                # sorting with the cell as the outer key preserves
                # per-cell grouping).  Device segmented-sort kernel
                # when an accelerator is attached (ops/atac_device.py),
                # host lexsort otherwise — identical order either way
                # (deduplicate.rs:202-210).
                from ..ops import atac_device

                (_cell_u, chrs_u, starts_u, flens_u, bcs_u), counts = (
                    atac_device.sort_rle([cell, chrs, starts, flens, bcs])
                )
                bcs_u = bcs_u.astype(np.uint64)
                stats["num_dedup"] += int((counts > 1).sum())
                stats["num_frag_len_over_max"] += int(
                    (flens_u >= MAX_ATAC_FRAG_LEN).sum()
                )
                out.write(format_bed_rows(
                    prelude.hdr.ref_names,
                    chrs_u, starts_u, flens_u, bcs_u, counts,
                    bc_len, rev, num_threads,
                ))
        if world > 1:
            # rank-order concatenation of the per-host partial BEDs
            # reproduces the single-process chunk order byte-for-byte
            out_fh = open(input_dir / "map.bed", "wb") if rank == 0 else None
            try:
                dist.stream_concat_files(bed_path, out_fh)
            finally:
                if out_fh is not None:
                    out_fh.close()
            bed_path.unlink(missing_ok=True)
            sums = np.sum(np.stack(dist.allgather_ragged(np.asarray(
                [stats[k] for k in sorted(stats)], np.int64
            ))), axis=0)
            for k, v in zip(sorted(stats), sums):
                stats[k] = int(v)
            dist.barrier("atac_dedup_done")
    finally:
        br.close()
    log.info(
        "records >1 mapping: %d; deduplicated: %d; non-proper pairs: %d; "
        "frag length > %d: %d",
        stats["num_multimapped"], stats["num_dedup"],
        stats["num_non_mapped_pair"], MAX_ATAC_FRAG_LEN,
        stats["num_frag_len_over_max"],
    )
    return stats
