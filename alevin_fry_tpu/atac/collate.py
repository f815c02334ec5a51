"""atac collate (reference: src/atac/collate.rs).

Same shape as the RNA collation — correct barcodes through the permit
map and group reads into one chunk per cell — but keyed purely by
barcode (no strand filtering; ATAC records carry no orientation) and
reading the chunk count from the gpl JSON (ATAC RAD headers may have
num_chunks = 0, atac/collate.rs:212)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .. import __version__
from ..radz import bincodeio, read_prelude
from ..radz.chunkio import decode_all_chunks
from ..radz.records import RecordSchema
from ..radz import unmapped as unmappedio
from ..utils import check_version_compat, write_json
from ..pipeline.collate import _lookup_map
from ..pipeline.logging_ import get_logger

log = get_logger("atac.collate")


def collate(
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
    gpl_meta = check_version_compat(
        version, input_dir / "generate_permit_list.json"
    )

    from ..parallel import dist

    dist.initialize()
    rank, world = dist.rank_world()

    bclen, freq_bc, freq_ct = bincodeio.read_permit_freq(input_dir / "permit_freq.bin")
    del bclen
    order = np.lexsort((freq_bc, -freq_ct.astype(np.int64)))
    cell_bcs = freq_bc[order]
    cell_cts = freq_ct[order]

    map_keys, map_vals = bincodeio.read_u64_map_file(input_dir / "permit_map.bin")

    if rank == 0:
        bcs_u, cts_u = unmappedio.read_raw_unmapped(
            rad_dir / "unmapped_bc_count.bin"
        )
        if len(bcs_u):
            hit, corr = _lookup_map(map_keys, map_vals, bcs_u)
            cb, inv = np.unique(corr[hit], return_inverse=True)
            agg = np.zeros(len(cb), np.uint64)
            np.add.at(agg, inv, cts_u[hit].astype(np.uint64))
            unmappedio.write_collated_single(
                input_dir / "unmapped_bc_count_collated.bin", cb,
                agg.astype(np.uint32),
            )
        else:
            unmappedio.write_collated_single(
                input_dir / "unmapped_bc_count_collated.bin",
                np.zeros(0, np.uint64), np.zeros(0, np.uint32),
            )

    # stage metadata: one write, rank-0 only, ahead of every branch
    if rank == 0:
        write_json(input_dir / "collate.json", {
            "cmd": cmdline, "version_str": version,
            "compressed_output": compress_out,
        })

    # multi-host: per-host chunk ranges (the ATAC chunk count lives in
    # the gpl JSON when the RAD header holds 0, atac/collate.rs:212) +
    # the shared DCN bucket gather
    total_to_collate = int(freq_ct.sum())
    if world > 1:
        from ..pipeline.collate import _collate_out_of_core

        nchunks = int(gpl_meta.get("num-chunks", 0) or 0)
        if nchunks <= 0:
            raise ValueError(
                "multi-host atac collate needs the chunk count from the "
                "gpl metadata"
            )
        chunk_range = dist.host_chunk_plan(nchunks, world, rank)
        log.info(
            "multi-host atac collate: host %d/%d scatters chunks [%d, %d)",
            rank, world, chunk_range[0], chunk_range[1],
        )
        return _collate_out_of_core(
            input_dir, rad_dir, cell_bcs, cell_cts, map_keys, map_vals,
            ".", False, max_records, compress_out, expect_atac=True,
            chunk_range=chunk_range, multihost=True,
        )

    # out-of-core path for datasets beyond the in-memory record bound
    # (the reference's --max-records scatter/gather, reused from the RNA
    # collation; ATAC records carry no orientation so ori = '.')
    if total_to_collate > max_records:
        from ..pipeline.collate import _collate_out_of_core

        return _collate_out_of_core(
            input_dir, rad_dir, cell_bcs, cell_cts, map_keys, map_vals,
            ".", False, max_records, compress_out, expect_atac=True,
        )

    # byte-level native path (no column decode / re-encode; the same
    # engine as the RNA collation with the barcode-only key)
    from ..pipeline.collate import _collate_in_memory_native

    if _collate_in_memory_native(
        input_dir, rad_dir, cell_bcs, cell_cts, map_keys, map_vals,
        ".", False, compress_out, expect_atac=True,
    ):
        return

    with open(rad_dir / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        schema = RecordSchema.from_prelude(prelude)
        nc = prelude.hdr.num_chunks if prelude.hdr.num_chunks > 0 else None
        batch = decode_all_chunks(fh, schema, nc)
    log.info("collating %d ATAC reads into %d cells", batch.n_reads, len(cell_bcs))

    bcs = batch.barcode()
    hit, corrected = _lookup_map(map_keys, map_vals, bcs)
    keep_read = hit

    sort_perm = np.argsort(cell_bcs, kind="stable")
    cell_sorted = cell_bcs[sort_perm]
    rank = sort_perm[np.searchsorted(cell_sorted, corrected[keep_read])]

    kept = np.flatnonzero(keep_read)
    nal = batch.num_aln_per_read[kept]
    offs = np.zeros(len(kept) + 1, np.int64)
    np.cumsum(nal, out=offs[1:])
    gather = np.repeat(batch.aln_offsets[:-1][kept], nal) + (
        np.arange(int(offs[-1])) - np.repeat(offs[:-1], nal)
    )

    sort_idx = np.argsort(rank, kind="stable")
    rank_sorted = rank[sort_idx]
    read_cols = {k: v[kept][sort_idx] for k, v in batch.read_cols.items()}
    read_cols[batch.schema.barcode_fields[-1]] = corrected[keep_read][sort_idx]
    out_nal = nal[sort_idx]
    out_offs = np.zeros(len(kept) + 1, np.int64)
    np.cumsum(out_nal, out=out_offs[1:])
    aln_gather = np.repeat(offs[:-1][sort_idx], out_nal) + (
        np.arange(int(out_offs[-1])) - np.repeat(out_offs[:-1], out_nal)
    )
    refs = batch.refs[gather][aln_gather]
    dirs = batch.dirs[gather][aln_gather]
    aln_cols = {k: v[gather][aln_gather] for k, v in batch.aln_cols.items()}

    per_cell = np.zeros(len(cell_bcs), np.int64)
    u_rank, u_ct = np.unique(rank_sorted, return_counts=True)
    per_cell[u_rank] = u_ct

    out_path = input_dir / ("map.collated.rad.sz" if compress_out else "map.collated.rad")
    import io

    sink = io.BytesIO() if compress_out else open(out_path, "wb")
    try:
        n_cells_written = int((per_cell > 0).sum())
        prelude.hdr.num_chunks = n_cells_written
        prelude.write(sink)
        prelude.write_file_tag_values(sink, ftm)
        from ..radz.chunkio import write_cell_chunks

        write_cell_chunks(
            sink, schema, read_cols, out_offs, refs, dirs, aln_cols, per_cell
        )
        if compress_out:
            from ..radz import snappyz

            with open(out_path, "wb") as out:
                snappyz.frame_compress_stream(sink.getvalue(), out)
    finally:
        if not compress_out:
            sink.close()
    log.info("finished collating; wrote %d cell chunks", n_cells_written)
