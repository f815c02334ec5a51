"""atac generate-permit-list (reference: src/atac/cellfilter.rs).

Only the unfiltered-external-list method is supported (the reference's
CellFilterMethod for ATAC, atac/cellfilter.rs:56-65).  In the same pass
over the reads we histogram the genomic 100kb bins of uniquely-mapped
read start positions (atac/cellfilter.rs:67-102) for the later sort
stage's bucket planning, and optionally reverse-complement the
whitelist (permit-bc-ori, default rc).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .. import __version__
from ..constants import ATAC_BIN_SIZE
from ..ops import barcodes as bcops
from ..radz import bincodeio, read_prelude, record_type_from_prelude, KnownRecordType
from ..radz.records import RecordSchema
from ..utils import read_barcode_file, write_json
from ..pipeline.logging_ import get_logger

log = get_logger("atac.gpl")


@dataclass
class AtacGplOpts:
    input_dir: Path
    output_dir: Path
    unfiltered_pl: Path
    min_reads: int = 10
    rc: bool = True
    threads: int = 8
    cmdline: str = ""
    version: str = __version__


def initialize_rec_list(ref_lens: np.ndarray, size_range: int):
    """Cumulative bin offsets per reference (atac/cellfilter.rs:38-53).
    Returns (blens[nrefs+1], total_bins)."""
    nrange = np.ceil(ref_lens.astype(np.float32) / np.float32(size_range)).astype(
        np.int64
    )
    blens = np.zeros(len(ref_lens) + 1, np.uint64)
    np.cumsum(nrange, out=blens[1:])
    return blens, int(blens[-1])


def generate_permit_list(opts: AtacGplOpts) -> int:
    import os

    from ..pipeline.gpl import _histogram, _merge_histograms
    from ..pipeline.progress import stage_timer
    from ..radz.chunkio import iter_decoded_blocks

    from ..parallel import dist

    dist.initialize()
    rank, world = dist.rank_world()

    i_dir = Path(opts.input_dir)
    block_records = int(os.environ.get("AFT_GPL_BLOCK_RECORDS", 20_000_000))
    with open(i_dir / "map.rad", "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        rec_type, _info = record_type_from_prelude(prelude, ftm)
        if rec_type != KnownRecordType.ATAC:
            raise ValueError(
                f"atac generate-permit-list requires an ATAC RAD file, got {rec_type}"
            )
        schema = RecordSchema.from_prelude(prelude)
        nc = prelude.hdr.num_chunks if prelude.hdr.num_chunks > 0 else None
        bclen = int(ftm["cblen"])
        ref_lens = np.asarray(ftm["ref_lengths"], np.uint64)

        chunk_range = None
        if world > 1:
            if nc is None:
                raise ValueError(
                    "multi-host atac gpl needs a chunk count in the RAD "
                    "header"
                )
            chunk_range = dist.host_chunk_plan(nc, world, rank)
            log.info(
                "multi-host atac gpl: process %d/%d owns chunks [%d, %d)",
                rank, world, chunk_range[0], chunk_range[1],
            )

        # whitelist (optionally reverse-complemented,
        # atac/cellfilter.rs:104-139) — read up front so the device
        # histogram path can count matches against it on the mesh
        wl, first_bclen = read_barcode_file(opts.unfiltered_pl)
        if opts.rc:
            wl = bcops.revcomp_packed(wl, first_bclen)
        wl_sorted = np.sort(np.unique(wl))
        log.info("number of unfiltered bcs read = %d", len(wl_sorted))

        # device regime (same dispatcher as the RNA gpl): the genomic
        # bin histogram scatter-adds on the mesh and the barcode
        # histogram accumulates matched counts on device, with only the
        # unmatched tail histogrammed on host for the 1-edit rescue
        from ..pipeline.gpl import gpl_mesh_from_env

        # (multi-host runs merge host-local histograms over the DCN —
        # a global-mesh device_put of host-local arrays is ill-defined)
        gpl_mesh = gpl_mesh_from_env() if world == 1 else None
        wl_dev_counts = (
            np.zeros(len(wl_sorted), np.int64) if gpl_mesh is not None else None
        )

        # genomic bin histogram over uniquely-mapped reads
        # (start_pos.len() == 1, atac/cellfilter.rs:92-99); both
        # histograms accumulate over streamed blocks so memory is
        # bounded by bins + distinct barcodes, not read count
        blens, tot_bins = initialize_rec_list(ref_lens, ATAC_BIN_SIZE)
        bins = np.zeros(tot_bins, np.uint64)
        h_bc = np.zeros(0, np.uint64)
        h_ct = np.zeros(0, np.uint64)
        num_reads = 0
        num_chunks = 0
        max_ambig = 0
        with stage_timer(log, "atac gpl histogram", "reads") as pb:
            for batch in iter_decoded_blocks(
                fh, schema, nc, block_records, prefetch=True,
                chunk_range=chunk_range,
            ):
                pb.update(batch.n_reads)
                num_reads += batch.n_reads
                num_chunks += len(batch.chunk_offsets) - 1
                if batch.n_reads:
                    max_ambig = max(
                        max_ambig, int(batch.num_aln_per_read.max())
                    )
                uniq_read = batch.num_aln_per_read == 1
                first_aln = batch.aln_offsets[:-1][uniq_read]
                uref = batch.refs[first_aln].astype(np.int64)
                upos = batch.aln_cols["start_pos"][first_aln].astype(np.int64)
                bin_idx = blens[uref].astype(np.int64) + upos // ATAC_BIN_SIZE
                bcs_blk = batch.barcode()
                if gpl_mesh is not None:
                    from ..parallel.mesh import (
                        sharded_bin_histogram, sharded_histogram,
                    )

                    if len(bin_idx):
                        bins += sharded_bin_histogram(
                            gpl_mesh, bin_idx, tot_bins
                        ).astype(np.uint64)
                    if len(bcs_blk):
                        cnt, _unm, hit = sharded_histogram(
                            gpl_mesh, bcs_blk, wl_sorted
                        )
                        wl_dev_counts += np.asarray(cnt, np.int64)
                        bcs_blk = bcs_blk[~hit]
                else:
                    np.add.at(bins, bin_idx, 1)
                if len(bcs_blk):
                    b_bc, b_ct = _histogram(bcs_blk)
                    h_bc, h_ct = _merge_histograms(h_bc, h_ct, b_bc, b_ct)
    # multi-host: merge the per-host chunk-range histograms over the
    # DCN so every rank holds the global bins + barcode histogram
    if world > 1:
        bin_parts = dist.allgather_ragged(bins)
        bins = np.sum(np.stack(bin_parts), axis=0).astype(np.uint64)
        key_parts = dist.allgather_ragged(h_bc)
        ct_parts = dist.allgather_ragged(h_ct)
        h_bc = np.zeros(0, np.uint64)
        h_ct = np.zeros(0, np.uint64)
        for kp, cp in zip(key_parts, ct_parts):
            h_bc, h_ct = _merge_histograms(h_bc, h_ct, kp, cp)
        scal = dist.allgather_ragged(np.asarray(
            [num_reads, num_chunks, max_ambig], np.int64
        ))
        sums = np.stack(scal)
        num_reads = int(sums[:, 0].sum())
        num_chunks = int(sums[:, 1].sum())
        max_ambig = int(sums[:, 2].max())
        log.info(
            "multi-host atac gpl: merged %d per-host histograms", world
        )
    bmax = int(bins.max()) if tot_bins else 0

    out_dir = Path(opts.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if rank == 0:
        bincodeio.write_u64_vec_file(out_dir / "bin_recs.bin", bins)
        bincodeio.write_u64_vec_file(out_dir / "bin_lens.bin", blens)

    # barcode histogram + unique-1-edit rescue (same machinery as RNA)
    if wl_dev_counts is not None:
        # device regime: matched counts accumulated on the mesh; the
        # host histogram holds only the unmatched tail
        nz = wl_dev_counts > 0
        matched_bc = wl_sorted[nz]
        matched_ct = wl_dev_counts[nz].astype(np.uint64)
        unmatched_bc, unmatched_ct = h_bc, h_ct
    else:
        uniq, counts = h_bc, h_ct
        idx = np.searchsorted(wl_sorted, uniq)
        idx_c = np.minimum(idx, max(len(wl_sorted) - 1, 0))
        in_wl = (
            (len(wl_sorted) > 0)
            & (idx < len(wl_sorted))
            & (wl_sorted[idx_c] == uniq)
        )
        matched_bc, matched_ct = uniq[in_wl], counts[in_wl]
        unmatched_bc, unmatched_ct = uniq[~in_wl], counts[~in_wl]
    num_unmatched_reads = int(unmatched_ct.sum())
    if num_reads > 0 and num_unmatched_reads / num_reads >= 0.3:
        log.warning(
            "Percentage of mapped reads not matching a known barcode exactly "
            "(%.3f%%) is > the suggested fraction (30%%)",
            100.0 * num_unmatched_reads / num_reads,
        )

    keep = matched_ct >= np.uint64(opts.min_reads)
    kept_bc = matched_bc[keep]
    kept_ct = matched_ct[keep].copy()
    below_bc, below_ct = matched_bc[~keep], matched_ct[~keep]
    log.info("num_passing = %d", len(kept_bc))

    rescue_bc = np.concatenate([unmatched_bc, below_bc])
    rescue_ct = np.concatenate([unmatched_ct, below_ct])
    order = np.argsort(rescue_bc, kind="stable")
    rescue_bc, rescue_ct = rescue_bc[order], rescue_ct[order]
    ncounts, reps = bcops.find_neighbors(rescue_bc, kept_bc, bclen)
    rescued = (ncounts == 1) & (reps != rescue_bc)
    num_corrected = int(rescued.sum())
    if num_corrected:
        tgt = np.searchsorted(kept_bc, reps[rescued])
        np.add.at(kept_ct, tgt, rescue_ct[rescued])
    log.info(
        "%d distinct unmatched barcodes, %d recoverable", len(rescue_bc),
        num_corrected,
    )

    map_keys = np.concatenate([kept_bc, rescue_bc[rescued]])
    map_vals = np.concatenate([kept_bc, reps[rescued]])
    if rank == 0:
        bincodeio.write_permit_freq(
            out_dir / "permit_freq.bin", bclen, kept_bc, kept_ct
        )
        bincodeio.write_u64_map_file(
            out_dir / "permit_map.bin", map_keys, map_vals
        )

    meta = {
        "version_str": opts.version,
        "max-ambig-record": max_ambig,
        "num-chunks": num_chunks,
        "cmd": opts.cmdline,
        "permit-list-type": "unfiltered",
        "gpl_options": {
            "input_dir": str(opts.input_dir),
            "output_dir": str(opts.output_dir),
            "fmeth": f"UnfilteredExternalList({opts.unfiltered_pl}, {opts.min_reads})",
            "threads": opts.threads,
            "rc": opts.rc,
            "cmdline": opts.cmdline,
            "version": opts.version,
        },
        "max-rec-in-bin": bmax,
    }
    if rank == 0:
        write_json(out_dir / "generate_permit_list.json", meta)
    # all ranks wait for the artifacts before the next stage reads them
    dist.barrier("atac_gpl_done")
    log.info("total number of distinct corrected barcodes: %d", num_corrected)
    return num_corrected
