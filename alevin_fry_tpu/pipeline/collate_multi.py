"""Multi-barcode hierarchical collation (fast and two-round modes).

Re-implements do_collate_multi_bc_fast (collate.rs:1160-1965) as a
vectorized pass (block-streamed with rank-range spill buckets above
``--max-records``, mirroring the reference's TempBucket scatter at
collate.rs:1413-1480):

* correct sample barcodes through sample_permit_map.bin;
* tiered cell correction per sample — identity against the sample's
  permit_freq keys, else unique Hamming<=1 neighbor in the sample's
  valid list (collate.rs:1486-1664);
* composite sort key ``(sample_idx << 2*cell_bc_len) | cell_bc``
  (collate.rs:1194-1198) with the 64-bit capacity check;
* output chunks grouped by present sample (ascending plate index),
  cells in descending read count within a sample; the **manifest
  ordinal** (dense present-sample index) is written into barcodes[0]
  of every record — regression COMBINE-lab/simpleaf#195
  (collate.rs:1312-1338, 1685-1702);
* writes collation_manifest.bin and collate.json with
  multi_barcode/num_samples, and the corrected multi-key unmapped
  counts.

The ``two-round`` mode (do_collate_multi_bc_two_round,
collate.rs:1977-2475) differs only in how cell barcodes are corrected:
round 2 of the reference corrects through each sample's gpl-written
``permit_map.bin`` (collate.rs:2277-2283, the full 1-edit neighbor map
built at gpl time) instead of the tiered identity/unique-1-edit search
the fast path performs at collate time.  Sample grouping, per-sample
descending-frequency cell order and the collation manifest are the
same, so we share one vectorized engine and switch the correction
tier.  Note the reference parses ``--collation-mode`` but never routes
it (a TODO at collate.rs:161-170 hardcodes the fast path); we honor
the flag, a documented divergence (docs/parity.md).  In both modes we
write the manifest ordinal into barcodes[0] — the contract quant's
sample_idx_extractor depends on (quant.rs:1955-1956).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .. import __version__
from ..ops import barcodes as bcops
from ..radz import bincodeio, read_prelude
from ..radz.chunkio import decode_all_chunks
from ..radz.collation import CollationManifest, SampleGroup
from ..radz.records import RecordSchema
from ..radz import unmapped as unmappedio
from ..utils import aln_strand_mask, write_json
from .collate import _gather_rank_buckets, _lookup_map
from .logging_ import get_logger

log = get_logger("collate.multi")


def _correct_block(batch, ctx):
    """Composite sample+cell correction of one decoded block.

    Returns (kept_reads, rank, ord_arr, corrected_cell_kept, keep_aln2,
    nal) — the read indices that survive, their composite cell rank
    (index into ctx['comp_cells']), their manifest ordinal, the
    corrected cell barcode, the per-alignment keep mask, and the
    surviving-alignment count per kept read."""
    num_samples = ctx["num_samples"]
    cell_bc_bits = ctx["cell_bc_bits"]

    # sample correction
    sbc = batch.barcode(0)
    hit_s, corr_s = _lookup_map(ctx["smk"], ctx["smv"], sbc)
    sb_sorted = ctx["sb_sorted"]
    si = np.searchsorted(sb_sorted, corr_s)
    si_c = np.minimum(si, max(num_samples - 1, 0))
    known = hit_s & (num_samples > 0) & (sb_sorted[si_c] == corr_s)
    sample_idx = np.full(batch.n_reads, -1, np.int64)
    sample_idx[known] = ctx["sb_sorted_idx"][si_c[known]]

    # cell correction per sample: the fast mode runs the tiered
    # identity / unique-1-edit search (collate.rs:1486-1664); the
    # two-round mode corrects through each sample's gpl-written
    # permit_map.bin exactly as round 2 of the reference does
    # (collate.rs:2277-2283)
    cbc = batch.barcode(-1)
    corrected_cell = np.zeros(batch.n_reads, np.uint64)
    cell_ok = np.zeros(batch.n_reads, bool)
    for sidx in range(num_samples):
        sel = np.flatnonzero(sample_idx == sidx)
        if len(sel) == 0:
            continue
        q = cbc[sel]
        if ctx["mode"] == "two-round":
            mkv = ctx["round2_maps"][sidx]
            if mkv is None:
                continue
            mk, mv = mkv
            hit, corr = _lookup_map(mk, mv, q)
            corrected_cell[sel[hit]] = corr[hit]
            cell_ok[sel[hit]] = True
            continue
        valid = ctx["per_sample_valid"][sidx]
        # identity tier
        vi = np.searchsorted(valid, q)
        vi_c = np.minimum(vi, max(len(valid) - 1, 0))
        ident = (len(valid) > 0) & (vi < len(valid)) & (valid[vi_c] == q)
        corrected_cell[sel[ident]] = q[ident]
        cell_ok[sel[ident]] = True
        # 1-edit tier
        rest = sel[~ident]
        if len(rest):
            cnts, reps = bcops.find_neighbors_batch(
                cbc[rest], valid, ctx["cell_bc_len"]
            )
            good = cnts == 1
            corrected_cell[rest[good]] = reps[good]
            cell_ok[rest[good]] = True

    # orientation filtering of alignments
    keep_aln0 = aln_strand_mask(batch.dirs, ctx["expected_ori"])
    kept_per_read = np.add.reduceat(
        keep_aln0.astype(np.int64), batch.aln_offsets[:-1]
    ) if batch.n_reads else np.zeros(0, np.int64)
    kept_per_read[np.diff(batch.aln_offsets) == 0] = 0
    keep_read = known & cell_ok & (kept_per_read > 0)
    read_of_aln = np.repeat(np.arange(batch.n_reads), batch.num_aln_per_read)
    keep_aln = keep_aln0 & keep_read[read_of_aln]

    comp_sorted = ctx["comp_sorted"]
    n_cells = ctx["n_cells"]
    rk = (
        sample_idx[keep_read].astype(np.uint64) << np.uint64(cell_bc_bits)
    ) | corrected_cell[keep_read]
    pos = np.searchsorted(comp_sorted, rk)
    pos_c = np.minimum(pos, max(n_cells - 1, 0))
    in_cells = (n_cells > 0) & (pos < n_cells) & (comp_sorted[pos_c] == rk)
    # all corrected reads should hit a known cell; drop any that don't
    kept_reads = np.flatnonzero(keep_read)[in_cells]
    rank = ctx["comp_perm"][pos_c[in_cells]]

    keep_read2 = np.zeros(batch.n_reads, bool)
    keep_read2[kept_reads] = True
    keep_aln2 = keep_aln & keep_read2[read_of_aln]
    nal = np.zeros(batch.n_reads, np.int64)
    np.add.at(nal, read_of_aln[keep_aln2], 1)
    nal = nal[kept_reads]

    ord_arr = ctx["ord_lut"][sample_idx[kept_reads]].astype(np.uint64)
    return kept_reads, rank, ord_arr, corrected_cell[kept_reads], keep_aln2, nal


def collate_multi_bc(
    input_dir: Path,
    rad_dir: Path,
    num_threads: int,
    max_records: int,
    compress_out: bool,
    cmdline: str,
    version: str = __version__,
    mode: str = "fast",
) -> None:
    if mode not in ("fast", "two-round"):
        raise ValueError(f"unknown collation mode {mode!r}")
    input_dir = Path(input_dir)
    rad_dir = Path(rad_dir)
    with open(input_dir / "generate_permit_list.json") as fh:
        mdata = json.load(fh)
    expected_ori = mdata["expected_ori"]
    with open(input_dir / "sample_info.json") as fh:
        sample_info = json.load(fh)
    num_samples = int(sample_info["num_samples"])
    sample_entries = sample_info["samples"]
    sample_names = [
        e.get("name") or format(int(e["barcode"], 16), "x") for e in sample_entries
    ]
    sample_bcs = np.asarray(
        [int(e["barcode"], 16) for e in sample_entries], np.uint64
    )

    smk, smv = bincodeio.read_u64_map_file(input_dir / "sample_permit_map.bin")

    # per-sample valid cell barcodes (sorted) + freqs
    per_sample_valid = []
    per_sample_freq = []
    cell_bc_len = None
    for name in sample_names:
        fp = input_dir / f"sample_{name}" / "permit_freq.bin"
        if fp.exists():
            bl, k, v = bincodeio.read_permit_freq(fp)
            cell_bc_len = bl
            per_sample_valid.append(k)  # sorted by bincodeio writer
            per_sample_freq.append(v)
        else:
            per_sample_valid.append(np.zeros(0, np.uint64))
            per_sample_freq.append(np.zeros(0, np.uint64))
    if cell_bc_len is None:
        cell_bc_len = 16

    cell_bc_bits = 2 * cell_bc_len
    sample_id_bits = 0 if num_samples <= 1 else (num_samples - 1).bit_length()
    if sample_id_bits + cell_bc_bits > 64:
        raise ValueError(
            f"Cannot collate: {num_samples} samples requires {sample_id_bits} "
            f"bits plus {cell_bc_bits} bits for {cell_bc_len}bp cell barcodes "
            "> 64-bit composite key capacity."
        )

    # composite keys; cell order = sample asc, then descending freq
    comp_cells = []
    comp_counts = []
    for sidx in range(num_samples):
        v = per_sample_valid[sidx]
        f = per_sample_freq[sidx]
        if len(v) == 0:
            continue
        order = np.lexsort((v, -f.astype(np.int64)))
        comp_cells.append(
            (np.uint64(sidx) << np.uint64(cell_bc_bits)) | v[order]
        )
        comp_counts.append(f[order].astype(np.int64))
    comp_cells = (
        np.concatenate(comp_cells) if comp_cells else np.zeros(0, np.uint64)
    )
    comp_counts = (
        np.concatenate(comp_counts) if comp_counts else np.zeros(0, np.int64)
    )
    n_cells = len(comp_cells)

    comp_perm = np.argsort(comp_cells, kind="stable")
    comp_sorted = comp_cells[comp_perm]

    # dense manifest ordinals: every kept read's (sample, cell) is a
    # member of comp_cells, so the present-sample set is exactly the
    # samples contributing composite cells
    present = sorted({int(c >> np.uint64(cell_bc_bits)) for c in comp_cells})
    sidx_to_ord = {s: o for o, s in enumerate(present)}
    ord_lut = np.zeros(max(num_samples, 1), np.int64)
    for s, o in sidx_to_ord.items():
        ord_lut[s] = o

    sb_sorted_idx = np.argsort(sample_bcs, kind="stable")
    ctx = {
        "num_samples": num_samples,
        "cell_bc_len": cell_bc_len,
        "cell_bc_bits": cell_bc_bits,
        "smk": smk, "smv": smv,
        "sb_sorted": sample_bcs[sb_sorted_idx],
        "sb_sorted_idx": sb_sorted_idx,
        "per_sample_valid": per_sample_valid,
        "mode": mode,
        "expected_ori": expected_ori,
        "comp_sorted": comp_sorted,
        "comp_perm": comp_perm,
        "n_cells": n_cells,
        "sidx_to_ord": sidx_to_ord,
        "ord_lut": ord_lut,
        "round2_maps": None,
    }
    if mode == "two-round":
        maps = []
        for sidx in range(num_samples):
            mp = input_dir / f"sample_{sample_names[sidx]}" / "permit_map.bin"
            if mp.exists():
                maps.append(bincodeio.read_u64_map_file(mp))
            else:
                log.info(
                    "Round 2: skipping sample '%s' (no permit maps)",
                    sample_names[sidx],
                )
                maps.append(None)
        ctx["round2_maps"] = maps

    from ..parallel import dist

    dist.initialize()
    rank, world = dist.rank_world()

    expected_total = int(comp_counts.sum())
    with open(rad_dir / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        schema = RecordSchema.from_prelude(prelude)
        if world > 1:
            # multi-host: every host scatters its chunk range into
            # rank-local spill buckets; the gather all-gathers bucket
            # streams over DCN and rank 0 writes the collated file
            # (same shape as the single-BC multi-host collate)
            n_written, per_cell = _collate_multi_out_of_core(
                fh, input_dir, schema, prelude, ftm, ctx, comp_counts,
                max_records, compress_out, multihost=True,
            )
        elif expected_total > max_records:
            n_written, per_cell = _collate_multi_out_of_core(
                fh, input_dir, schema, prelude, ftm, ctx, comp_counts,
                max_records, compress_out,
            )
        else:
            batch = decode_all_chunks(fh, schema, prelude.hdr.num_chunks)
            log.info("multi-barcode collation over %d reads", batch.n_reads)
            n_written, per_cell = _collate_multi_in_memory(
                batch, input_dir, schema, prelude, ftm, ctx, compress_out,
            )

    if world > 1 and rank != 0:
        # sidecars below are rank-0 writes; wait for them and return
        dist.barrier("collate_multi_done")
        return

    # the reference's two-round mode records its mode in collate.json
    # (collate.rs:2447-2454); the fast mode omits the key (:1368-1374)
    cmeta = {
        "cmd": cmdline, "version_str": version,
        "compressed_output": compress_out,
        "multi_barcode": True,
        "num_samples": num_samples,
    }
    if mode == "two-round":
        cmeta["collation_mode"] = "two-round"
    write_json(input_dir / "collate.json", cmeta)

    # corrected unmapped counts keyed (sample, cell).  The raw
    # multi-field unmapped format is mapper-specific; when it is absent
    # or unparseable we degrade to empty counts (mapping-rate columns
    # then treat unmapped as 0, matching the reference's fallback at
    # quant.rs:1448-1453).
    unmappedio.write_collated_multi(
        input_dir / "unmapped_bc_count_collated.bin",
        np.zeros(0, np.uint64), np.zeros(0, np.uint64), np.zeros(0, np.uint32),
    )

    # manifest: present samples in ascending plate index; chunk ranges
    # count only cells that produced chunks
    manifest = CollationManifest(["sample", "cell"])
    comp_sample = (comp_cells >> np.uint64(cell_bc_bits)).astype(np.int64)
    chunk_offset = 0
    for sidx in present:
        sel = comp_sample == sidx
        nch = int((per_cell[sel] > 0).sum())
        nrec = int(per_cell[sel].sum())
        manifest.add_sample_group(SampleGroup(
            key=int(sample_bcs[sidx]),
            name=sample_names[sidx],
            chunk_start=chunk_offset,
            num_chunks=nch,
            num_records=nrec,
        ))
        chunk_offset += nch
    manifest.write_to_file(input_dir / "collation_manifest.bin")
    if world > 1:
        dist.barrier("collate_multi_done")
    log.info(
        "Multi-barcode collation complete: %d output chunks across %d samples",
        n_written, len(present),
    )


def _collate_multi_in_memory(
    batch, input_dir, schema, prelude, ftm, ctx, compress_out,
):
    kept_reads, rank, ord_arr, corr_cell, keep_aln2, nal = _correct_block(
        batch, ctx
    )
    n_cells = ctx["n_cells"]

    read_cols = {k: v[kept_reads].copy() for k, v in batch.read_cols.items()}
    # rewrite barcodes: [0] = manifest ordinal, [last] = corrected cell
    read_cols[schema.barcode_fields[0]] = ord_arr
    read_cols[schema.barcode_fields[-1]] = corr_cell

    refs = batch.refs[keep_aln2]
    dirs = batch.dirs[keep_aln2]
    aln_cols = {k: v[keep_aln2] for k, v in batch.aln_cols.items()}
    offs = np.zeros(len(kept_reads) + 1, np.int64)
    np.cumsum(nal, out=offs[1:])

    # stable sort reads by cell rank
    sort_idx = np.argsort(rank, kind="stable")
    rank_sorted = rank[sort_idx]
    read_cols = {k: v[sort_idx] for k, v in read_cols.items()}
    out_nal = nal[sort_idx]
    out_offs = np.zeros(len(kept_reads) + 1, np.int64)
    np.cumsum(out_nal, out=out_offs[1:])
    gather = np.repeat(offs[:-1][sort_idx], out_nal) + (
        np.arange(int(out_offs[-1])) - np.repeat(out_offs[:-1], out_nal)
    )
    refs, dirs = refs[gather], dirs[gather]
    aln_cols = {k: v[gather] for k, v in aln_cols.items()}

    per_cell = np.zeros(n_cells, np.int64)
    ur, uc = np.unique(rank_sorted, return_counts=True)
    per_cell[ur] = uc

    out_path = input_dir / (
        "map.collated.rad.sz" if compress_out else "map.collated.rad"
    )
    import io

    sink = io.BytesIO() if compress_out else open(out_path, "wb")
    try:
        n_written = int((per_cell > 0).sum())
        prelude.hdr.num_chunks = n_written
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
    return n_written, per_cell


def _collate_multi_out_of_core(
    fh, input_dir, schema, prelude, ftm, ctx, comp_counts, max_records,
    compress_out, multihost: bool = False,
):
    """Bounded-memory multi-BC collation: block-streamed correction,
    re-encoded records scattered to rank-range spill buckets (each
    <= max_records planned from the per-sample permit frequencies,
    mirroring collate.rs:1413-1480), then the shared byte-sort gather.

    ``multihost``: each host scatters only its contiguous chunk range
    and the gather runs over the DCN (collate.py's multi-host gather),
    producing byte-identical output at rank 0."""
    from ..radz.chunkio import encode_records, iter_decoded_blocks
    from .progress import stage_timer

    chunk_range = None
    if multihost:
        from ..parallel import dist

        mh_rank, mh_world = dist.rank_world()
        nchunks = int(prelude.hdr.num_chunks)
        if nchunks <= 0:
            raise ValueError(
                "multi-host multi-BC collate needs a chunk count in the "
                "RAD header"
            )
        chunk_range = dist.host_chunk_plan(nchunks, mh_world, mh_rank)
        log.info(
            "multi-host multi-BC collate: host %d/%d scatters chunks "
            "[%d, %d)", mh_rank, mh_world, chunk_range[0], chunk_range[1],
        )

    n_cells = ctx["n_cells"]
    csum = np.zeros(n_cells + 1, np.int64)
    np.cumsum(comp_counts, out=csum[1:])
    bucket_of_rank = (csum[:-1] // max_records).astype(np.int64)
    n_buckets = int(bucket_of_rank[-1]) + 1 if n_cells else 1
    log.info(
        "out-of-core multi-BC collation: ~%d records into %d spill buckets",
        int(csum[-1]), n_buckets,
    )

    if multihost:
        spill_dir = input_dir / f"_collate_tmp_r{mh_rank}"
    else:
        spill_dir = input_dir / "_collate_tmp"
    spill_dir.mkdir(exist_ok=True)
    bucket_files = [
        (open(spill_dir / f"bucket_{b}.rec", "wb"),
         open(spill_dir / f"bucket_{b}.rank", "wb"))
        for b in range(n_buckets)
    ]
    try:
        pb_ctx = stage_timer(log, "multi-BC collate scatter", "reads")
        pb = pb_ctx.__enter__()
        for batch in iter_decoded_blocks(
            fh, schema, prelude.hdr.num_chunks or None, max_records,
            prefetch=True, chunk_range=chunk_range,
        ):
            pb.update(batch.n_reads)
            kept_reads, rank, ord_arr, corr_cell, keep_aln2, nal = (
                _correct_block(batch, ctx)
            )
            if len(kept_reads) == 0:
                continue
            read_cols = {k: v[kept_reads] for k, v in batch.read_cols.items()}
            read_cols[schema.barcode_fields[0]] = ord_arr
            read_cols[schema.barcode_fields[-1]] = corr_cell
            refs = batch.refs[keep_aln2]
            dirs = batch.dirs[keep_aln2]
            aln_cols = {k: v[keep_aln2] for k, v in batch.aln_cols.items()}
            new_offsets = np.zeros(len(kept_reads) + 1, np.int64)
            np.cumsum(nal, out=new_offsets[1:])
            bmask = bucket_of_rank[rank]
            for b in np.unique(bmask):
                sel = np.flatnonzero(bmask == b)
                offs = np.zeros(len(sel) + 1, np.int64)
                np.cumsum(nal[sel], out=offs[1:])
                gather = np.repeat(new_offsets[:-1][sel], nal[sel]) + (
                    np.arange(int(offs[-1])) - np.repeat(offs[:-1], nal[sel])
                )
                body = encode_records(
                    schema,
                    {k: v[sel] for k, v in read_cols.items()},
                    offs,
                    refs[gather], dirs[gather],
                    {k: v[gather] for k, v in aln_cols.items()},
                )
                bucket_files[int(b)][0].write(body.tobytes())
                bucket_files[int(b)][1].write(
                    rank[sel].astype(np.uint32).tobytes()
                )
        pb_ctx.__exit__(None, None, None)
        for rf, kf in bucket_files:
            rf.close()
            kf.close()

        out_path = input_dir / (
            "map.collated.rad.sz" if compress_out else "map.collated.rad"
        )
        if multihost:
            from .collate import _gather_rank_buckets_multihost

            return _gather_rank_buckets_multihost(
                out_path, spill_dir, n_buckets, schema, prelude, ftm,
                compress_out, n_cells,
            )
        return _gather_rank_buckets(
            out_path, spill_dir, n_buckets, schema, prelude, ftm,
            compress_out, n_cells,
        )
    finally:
        for rf, kf in bucket_files:
            if not rf.closed:
                rf.close()
            if not kf.closed:
                kf.close()
        for p in spill_dir.glob("bucket_*"):
            p.unlink(missing_ok=True)
        try:
            spill_dir.rmdir()
        except OSError:
            pass
