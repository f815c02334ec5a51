"""Multi-barcode (10x Flex) generate-permit-list.

Re-implements do_generate_permit_list_multi_bc (cellfilter.rs:563-1063):

* loads the sample barcode list (1-column, 2-column barcode\\tname, or
  3-column observed\\tcanonical\\tname rotation format), optionally
  reverse-complemented (sample-bc-ori=reverse);
* builds the rotation->canonical sample permit map (exact or 1-edit);
* one pass over the reads: strand filter, sample BC correction, per
  sample cell-barcode histograms (with whitelist split when the
  unfiltered-list method is used);
* per-sample cell filtering (unfiltered rescue / knee / force / expect
  / explicit) and per-sample permit artifacts under
  ``sample_<name>/``;
* writes sample_permit_map.bin, sample_info.json and the
  generate_permit_list.json gate with multi_barcode: true.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..ops import barcodes as bcops
from ..ops.knee import get_knee
from ..radz import bincodeio

from ..utils import read_strand_mask, strand_from_ori_arg, write_json
from .logging_ import get_logger

log = get_logger("gpl.multi")


def load_sample_barcode_list(path: Path, reverse: bool):
    """Returns (canonical_barcodes in file order, rotation_to_canonical
    dict, canonical_to_name dict, sample_bc_len)."""
    rot_to_canon: Dict[int, int] = {}
    canon_to_name: Dict[int, str] = {}
    canon_order: List[int] = []
    bc_len = None

    def rc(s: str) -> str:
        comp = {"A": "T", "T": "A", "C": "G", "G": "C",
                "a": "t", "t": "a", "c": "g", "g": "c"}
        return "".join(comp.get(ch, ch) for ch in reversed(s))

    with open(path) as fh:
        for line in fh:
            t = line.strip()
            if not t or t.startswith("#"):
                continue
            parts = t.split("\t")
            if len(parts) >= 3:
                obs, canon, name = parts[0], parts[1], parts[2]
            elif len(parts) == 2:
                obs, canon, name = parts[0], parts[0], parts[1]
            else:
                obs, canon, name = parts[0], parts[0], parts[0]
            if reverse:
                obs, canon = rc(obs), rc(canon)
            if bc_len is None:
                bc_len = len(obs)
            ob = bcops.pack_seq(obs)
            cb = bcops.pack_seq(canon)
            rot_to_canon[ob] = cb
            if cb not in canon_to_name:
                canon_order.append(cb)
            canon_to_name[cb] = name
    log.info(
        "Loaded %d rotation barcodes mapping to %d canonical samples from %s",
        len(rot_to_canon), len(canon_order), path,
    )
    return canon_order, rot_to_canon, canon_to_name, bc_len or 0


def build_sample_permit_map(
    canon_order, rot_to_canon, correction_mode: str, bc_len: int
) -> Tuple[Dict[int, int], Dict[int, int]]:
    permit = dict(rot_to_canon)
    bc_to_idx = {cb: i for i, cb in enumerate(canon_order)}
    if correction_mode == "1-edit":
        observed = np.asarray(list(rot_to_canon.keys()), np.uint64)
        keys, vals = bcops.generate_permitlist_map(observed, bc_len)
        for k, v in zip(keys.tolist(), vals.tolist()):
            if k not in permit:
                canon = rot_to_canon.get(v)
                if canon is not None:
                    permit[k] = canon
    return permit, bc_to_idx


def do_generate_permit_list_multi_bc(
    opts, prelude, ftm, block_iter, info: dict
) -> int:
    """``block_iter`` yields decoded ReadBatch blocks (streamed — the
    reference's first pass is a multithreaded chunk stream,
    cellfilter.rs:627-755); per-(sample, cell) histograms accumulate
    across blocks so memory is bounded by distinct pairs."""
    num_barcodes = info["num_barcodes"]
    cell_bc_len = info["cell_bc_len"]
    out_dir = Path(opts.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if opts.sample_bc_list is None:
        raise ValueError(
            f"Multi-barcode RAD file detected ({num_barcodes} barcode levels), "
            "but --sample-bc-list was not provided."
        )

    reverse = opts.sample_bc_ori == "reverse"
    canon_order, rot_to_canon, canon_to_name, sbc_len = load_sample_barcode_list(
        Path(opts.sample_bc_list), reverse
    )
    if opts.sample_names is not None:
        with open(opts.sample_names) as fh:
            for line in fh:
                parts = line.strip().split("\t")
                if len(parts) >= 2:
                    b = bcops.pack_seq(parts[0])
                    canon = rot_to_canon.get(b, b)
                    canon_to_name[canon] = parts[1]
    sample_names = [canon_to_name.get(cb, f"{cb:x}") for cb in canon_order]

    permit, bc_to_idx = build_sample_permit_map(
        canon_order, rot_to_canon, opts.sample_correction_mode, sbc_len
    )
    num_samples = len(canon_order)

    # --- first pass: strand filter, sample correction, per-sample hist
    strand = strand_from_ori_arg(opts.expected_ori)
    pk = np.asarray(sorted(permit.keys()), np.uint64)
    pv = np.asarray([permit[int(k)] for k in pk], np.uint64)
    canon_arr = np.asarray(canon_order, np.uint64)
    canon_perm = np.argsort(canon_arr, kind="stable")
    canon_sorted = canon_arr[canon_perm]

    cbits = np.uint64(2 * cell_bc_len)
    from .gpl import _histogram, _merge_histograms

    h_key = np.zeros(0, np.uint64)
    h_ct = np.zeros(0, np.uint64)
    total_reads = 0
    matched_reads = 0
    unmatched_reads = 0
    for batch in block_iter:
        compat = read_strand_mask(batch.dirs, batch.aln_offsets, strand)
        total_reads += batch.n_reads
        sbc = batch.barcode(0)[compat]
        cbc = batch.barcode(-1)[compat]

        idx = np.searchsorted(pk, sbc)
        idx_c = np.minimum(idx, max(len(pk) - 1, 0))
        hit = (len(pk) > 0) & (idx < len(pk)) & (pk[idx_c] == sbc)
        corrected_sample = pv[idx_c]
        ci = np.searchsorted(canon_sorted, corrected_sample)
        ci = np.minimum(ci, max(num_samples - 1, 0))
        known = hit & (num_samples > 0) & (canon_sorted[ci] == corrected_sample)
        matched_reads += int(known.sum())
        unmatched_reads += int((~known).sum())
        sidx = canon_perm[ci[known]].astype(np.uint64)
        comp = (sidx << cbits) | cbc[known]
        b_key, b_ct = _histogram(comp)
        h_key, h_ct = _merge_histograms(h_key, h_ct, b_key, b_ct)
    # multi-host: each host histogrammed its chunk range (the caller
    # scoped block_iter); merge the composite histograms and the read
    # counters over the DCN so every rank holds the global view
    # (cellfilter.rs:627-755 is single-host; this is its pod analog)
    from ..parallel import dist

    rank, world = dist.rank_world()
    if world > 1:
        key_parts = dist.allgather_ragged(h_key)
        ct_parts = dist.allgather_ragged(h_ct.astype(np.uint64))
        h_key = np.zeros(0, np.uint64)
        h_ct = np.zeros(0, np.uint64)
        for kp, cp in zip(key_parts, ct_parts):
            h_key, h_ct = _merge_histograms(h_key, h_ct, kp, cp)
        scal = dist.allgather_ragged(np.asarray(
            [total_reads, matched_reads, unmatched_reads], np.int64
        ))
        total_reads, matched_reads, unmatched_reads = (
            np.sum(np.stack(scal), axis=0).tolist()
        )
        log.info(
            "multi-host multi-BC gpl: merged %d per-host histograms "
            "(%d composite keys)", world, len(h_key),
        )
    write_files = rank == 0
    log.info(
        "First pass complete: %d total reads, %d matched to samples, %d unmatched",
        total_reads, matched_reads, unmatched_reads,
    )

    # optional cell whitelist
    wl_sorted = None
    min_reads = 0
    if opts.fmeth.kind == "unfiltered":
        from ..utils import read_barcode_file

        wl, _l = read_barcode_file(opts.fmeth.path)
        wl_sorted = np.sort(np.unique(wl))
        min_reads = int(opts.fmeth.min_reads)
        log.info("Loaded %d cell barcodes from whitelist", len(wl_sorted))

    # write sample_permit_map.bin (rank-0 only under multi-host; every
    # rank computed the identical merged state)
    if write_files:
        bincodeio.write_u64_map_file(
            out_dir / "sample_permit_map.bin",
            np.asarray(list(permit.keys()), np.uint64),
            np.asarray(list(permit.values()), np.uint64),
        )

    # per-sample filtering over the accumulated composite histogram
    total_cells = 0
    sample_entries = []
    h_sample = (h_key >> cbits).astype(np.int64)
    for si in range(num_samples):
        name = sample_names[si]
        sample_dir = out_dir / f"sample_{name}"
        sel = h_sample == si
        uniq = (h_key[sel] & ((np.uint64(1) << cbits) - np.uint64(1)))
        counts = h_ct[sel].astype(np.uint64)
        # histogram keys are sorted by composite key, hence by cell bc
        # within a sample — the order np.unique produced before
        if len(uniq) == 0:
            log.warning("Sample '%s' has no reads — skipping", name)
            sample_entries.append({
                "name": name, "barcode": f"0x{canon_order[si]:x}",
                "num_reads": 0, "num_cells": 0,
            })
            continue
        kept_bc, kept_ct, map_keys, map_vals = _filter_sample_cells(
            opts, uniq, counts, wl_sorted, min_reads, cell_bc_len, name
        )
        if write_files:
            sample_dir.mkdir(parents=True, exist_ok=True)
            bincodeio.write_u64_map_file(
                sample_dir / "permit_map.bin", map_keys, map_vals
            )
            bincodeio.write_permit_freq(
                sample_dir / "permit_freq.bin", cell_bc_len, kept_bc, kept_ct
            )
        total_cells += len(kept_bc)
        sample_entries.append({
            "name": name, "barcode": f"0x{canon_order[si]:x}",
            "num_reads": int(kept_ct.sum()), "num_cells": int(len(kept_bc)),
        })

    if write_files:
        write_json(out_dir / "sample_info.json", {
            "num_samples": num_samples,
            "num_barcodes": num_barcodes,
            "total_cells": total_cells,
            "total_reads": total_reads,
            "matched_reads": matched_reads,
            "unmatched_reads": unmatched_reads,
            "sample_correction_mode": (
                "OneEdit" if opts.sample_correction_mode == "1-edit" else "Exact"
            ),
            "sample_bc_ori": "Reverse" if reverse else "Forward",
            "samples": sample_entries,
        })

        write_json(out_dir / "generate_permit_list.json", {
            "velo_mode": opts.velo_mode,
            "expected_ori": strand,
            "version_str": opts.version,
            "cmd": opts.cmdline,
            "permit-list-type": opts.fmeth.describe(),
            "multi_barcode": True,
            "num_barcodes": num_barcodes,
        })
    # all ranks wait for the artifacts before the next stage reads them
    dist.barrier("gpl_multi_done")
    log.info(
        "Multi-barcode permit list generation complete: %d samples, %d total cells",
        num_samples, total_cells,
    )
    return total_cells


def _filter_sample_cells(
    opts, uniq, counts, wl_sorted, min_reads, cell_bc_len, name
):
    """Per-sample cell filtering (cellfilter.rs:843-1000).  Returns
    (kept_bc, kept_ct, map_keys, map_vals)."""
    meth = opts.fmeth
    if meth.kind == "unfiltered":
        idx = np.searchsorted(wl_sorted, uniq)
        idx_c = np.minimum(idx, max(len(wl_sorted) - 1, 0))
        in_wl = (
            (len(wl_sorted) > 0) & (idx < len(wl_sorted))
            & (wl_sorted[idx_c] == uniq)
        )
        pass_thresh = in_wl & (counts >= np.uint64(min_reads))
        kept_bc = uniq[pass_thresh]
        kept_ct = counts[pass_thresh].copy()
        rescue_bc = uniq[~pass_thresh]
        rescue_ct = counts[~pass_thresh]
        ncnt, reps = bcops.find_neighbors(rescue_bc, kept_bc, cell_bc_len)
        rescued = (ncnt == 1) & (reps != rescue_bc)
        if rescued.any():
            tgt = np.searchsorted(kept_bc, reps[rescued])
            np.add.at(kept_ct, tgt, rescue_ct[rescued])
        log.info(
            "  sample '%s': %d whitelist BCs pass min_reads=%d, %d rescued",
            name, len(kept_bc), min_reads, int(rescued.sum()),
        )
        map_keys = np.concatenate([kept_bc, rescue_bc[rescued]])
        map_vals = np.concatenate([kept_bc, reps[rescued]])
        return kept_bc, kept_ct, map_keys, map_vals

    freq = np.sort(counts)[::-1]
    if meth.kind == "knee":
        knee = get_knee(freq, 100)
        threshold = int(freq[max(knee - 1, 0)]) if knee > 0 else 0
    elif meth.kind == "force":
        num_cells = min(meth.count, len(freq))
        threshold = int(freq[max(num_cells - 1, 0)]) if num_cells > 0 else 0
    elif meth.kind == "expect":
        # cellfilter.rs:963-969 (multi-bc expect-cells heuristic)
        thr = int(freq[0]) // meth.count
        pos = np.flatnonzero(freq < thr)
        idx0 = int(pos[0]) if len(pos) else len(freq)
        num_cells = min(idx0 * 10, len(freq))
        threshold = int(freq[max(num_cells - 1, 0)]) if num_cells > 0 else 0
    else:  # explicit
        from ..utils import read_barcode_file

        vb, _l = read_barcode_file(meth.path, cell_bc_len)
        vset = np.sort(np.unique(vb))
        idx = np.searchsorted(vset, uniq)
        idx_c = np.minimum(idx, max(len(vset) - 1, 0))
        sel = (len(vset) > 0) & (idx < len(vset)) & (vset[idx_c] == uniq)
        kept_bc = uniq[sel]
        kept_ct = counts[sel]
        order = np.lexsort((kept_bc, -kept_ct.astype(np.int64)))
        mk, mv = bcops.generate_permitlist_map(kept_bc[order], cell_bc_len)
        return kept_bc, kept_ct, mk, mv

    sel = counts >= np.uint64(threshold)
    kept_bc = uniq[sel]
    kept_ct = counts[sel]
    log.info("  %d cells retained for sample '%s'", len(kept_bc), name)
    order = np.lexsort((kept_bc, -kept_ct.astype(np.int64)))
    mk, mv = bcops.generate_permitlist_map(kept_bc[order], cell_bc_len)
    return kept_bc, kept_ct, mk, mv
