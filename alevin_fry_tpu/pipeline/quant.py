"""quant — per-cell UMI resolution and gene-level quantification.

Re-implements src/quant.rs over columnar arrays:

* every cell with < 100 records takes the sparse winner-take-all fast
  path regardless of resolution strategy (quant.rs:433,760 — behavioral
  spec of the reference), producing USA-slot counts with no EM, no
  bootstraps and no eqclass-dump contribution;
* larger cells dispatch on the resolution strategy: cr-like /
  cr-like-em (winner-take-all or prefer-ambig tie handling), trivial,
  and the parsimony family (PUG-based, ops/pug.py);
* USA mode: 3-column tg-maps triple the output rows into
  spliced / unspliced / ambiguous blocks (num_rows = max_gid+2 plus
  half, quant.rs:1586-1604), column names suffixed ``-U`` / ``-A``.

Outputs the reference's artifact contract: alevin/quants_mat.mtx +
rows/cols, featureDump.txt (with sample_name column for multi-sample
inputs), quant.json, optional geqc_counts.mtx + gene_eqclass.txt.gz and
bootstrap mean/var matrices.
"""

from __future__ import annotations

import gzip
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .. import __version__
from ..constants import SMALL_CELL_FAST_THRESHOLD
from ..ops import crlike
from ..ops.em import em_cells_batched
from ..radz import read_prelude, record_type_from_prelude, KnownRecordType
from ..radz.chunkio import ReadBatch, iter_decoded_blocks
from ..radz.mtx import format_f32_list, rust_f32_str, write_matrix_market
from ..radz.records import RecordSchema
from ..radz.unmapped import UnmappedLookup
from ..ops.barcodes import unpack_seqs_to_strings
from ..utils import parse_tg_map, read_barcode_file, same_gene, write_json
from .logging_ import get_logger

log = get_logger("quant")

RESOLUTIONS = (
    "trivial", "cr-like", "cr-like-em", "parsimony", "parsimony-em",
    "parsimony-gene", "parsimony-gene-em",
)
EM_RESOLUTIONS = ("cr-like-em", "parsimony-em", "parsimony-gene-em")
PARSIMONY_RESOLUTIONS = (
    "parsimony", "parsimony-em", "parsimony-gene", "parsimony-gene-em",
)


@dataclass
class QuantOpts:
    input_dir: Path
    tg_map: Path
    output_dir: Path
    num_threads: int = 8
    num_bootstraps: int = 0
    init_uniform: bool = False
    summary_stat: bool = False
    dump_eq: bool = False
    resolution: str = "cr-like"
    pug_exact_umi: bool = False
    sa_model: str = "winner-take-all"
    small_thresh: int = 10
    large_graph_thresh: int = 1000
    filter_list: Optional[Path] = None
    cmdline: str = ""
    version: str = __version__


def quantify(opts: QuantOpts) -> None:
    parent = Path(opts.input_dir)
    with open(parent / "collate.json") as fh:
        collate_md = json.load(fh)
    compressed = bool(collate_md["compressed_output"])

    if compressed:
        from ..radz import snappyz

        # streaming frame reader: the collated file decompresses
        # frame-by-frame as quant's whole-cell blocks consume it
        br = snappyz.SnappyFrameReader(
            open(parent / "map.collated.rad.sz", "rb")
        )
    else:
        br = open(parent / "map.collated.rad", "rb")
    try:
        _do_quantify(br, opts, parent)
    finally:
        br.close()


def _do_quantify(br, opts: QuantOpts, parent: Path) -> None:
    prelude, ftm, _ = read_prelude(br)
    # prelude parsing may over-read and seek back; past it the input is
    # consumed strictly forward, so a streaming reader can drop history
    getattr(br, "drop_history", lambda: None)()
    rec_type, info = record_type_from_prelude(prelude, ftm)
    if rec_type == KnownRecordType.ATAC:
        raise ValueError(
            'To process atac-seq data, you should use the "atac" sub-command'
        )
    schema = RecordSchema.from_prelude(prelude)
    hdr = prelude.hdr
    log.info(
        "quantifying %d cells over %d references (record type %s)",
        hdr.num_chunks, hdr.ref_count, rec_type.value,
    )

    # multi-sample manifest (multi-barcode data)
    sample_names: Optional[List[str]] = None
    if (parent / "collation_manifest.bin").exists():
        from ..radz.collation import CollationManifest

        manifest = CollationManifest.read_from_file(parent / "collation_manifest.bin")
        sample_names = [
            g.name if g.name is not None else f"{g.key:x}"
            for g in manifest.sample_groups
        ]

    # tg-map
    tid_to_gid, gene_names, gene_name_to_id, usa_mode = parse_tg_map(
        Path(opts.tg_map), hdr.ref_names
    )
    num_genes = len(gene_name_to_id)
    if usa_mode:
        assert opts.num_bootstraps == 0, (
            "currently USA-mode analysis cannot be used with bootstrapping."
        )
    if usa_mode and opts.resolution == "trivial":
        # the reference documents trivial as unavailable in USA mode
        # (docs/source/quant.rst) and would panic on out-of-bounds gene
        # ids; fail with a clear message instead
        raise ValueError(
            "the trivial resolution strategy is not available in USA mode"
        )
    sa_model = opts.sa_model
    if not usa_mode and sa_model != "winner-take-all":
        log.info(
            "When not operating in USA-mode, the SplicedAmbiguityModel will "
            "be ignored."
        )
        sa_model = "winner-take-all"
    if usa_mode:
        mid = max(gene_name_to_id.values()) + 2
        num_rows = mid + mid // 2
        usa_offsets = (num_rows // 3, 2 * num_rows // 3)
    else:
        num_rows = num_genes
        usa_offsets = None
    log.info(
        "tg-map contained %d genes mapping to %d transcripts (usa_mode=%s)",
        num_genes, len(tid_to_gid), usa_mode,
    )

    barcode_len = int(
        ftm.get("cblen") or ftm.get("b1len") or ftm.get("b0len")
    )

    unmapped = UnmappedLookup.from_file(parent / "unmapped_bc_count_collated.bin")

    # optional quant-subset filter: keep cells whose (first-record)
    # barcode is in the list (quant.rs:1732-1743)
    fsorted = None
    if opts.filter_list is not None:
        fset, _len = read_barcode_file(Path(opts.filter_list), barcode_len)
        fsorted = np.sort(np.unique(fset))

    # stream the collated file (one chunk per cell) in blocks of whole
    # cells: cells are independent, so each block resolves on its own at
    # bounded memory (the reference streams per-cell chunks through
    # ParallelChunkReader, quant.rs:1532-1535).  The default block bound
    # keeps typical runs single-block; barcodes are only needed at each
    # cell's first record and orientation was already filtered at
    # collate time, so those columns stay undecoded
    import os

    block_records = int(os.environ.get("AFT_QUANT_BLOCK_RECORDS", 30_000_000))
    parts: List[tuple] = []
    from ..parallel import dist

    # multi-host ingest plan: each process owns a contiguous chunk
    # (cell) range; inputs (tg-map, permit artifacts) are replicated,
    # per-cell work stays process-local, and partial matrices merge at
    # the end (SURVEY §2.3/§5 prescription)
    dist.initialize()
    rank, world = dist.rank_world()
    chunk_range = None
    if world > 1:
        chunk_range = dist.host_chunk_plan(hdr.num_chunks, world, rank)
        log.info(
            "multi-host quant: process %d/%d owns cell chunks [%d, %d)",
            rank, world, chunk_range[0], chunk_range[1],
        )

    # file read of block k+1 overlaps resolution of block k (the
    # reference's reader-thread/worker pattern, quant.rs:1527-1743;
    # only the raw IO runs on the producer thread — see chunkio)
    from .progress import stage_timer

    # bounded-memory COO: per-block triplets hand off to a spill sink
    # that streams the MTX body to disk past AFT_QUANT_SPILL_NNZ
    # triplets (quant.rs holds all thread-local triplets in memory,
    # quant.rs:1770-1806; we bound it).  Multi-host runs spill to a
    # rank-local binary sidecar and stream-merge at rank 0 (bounded DCN
    # chunks) so memory stays flat at any world size.
    spill_nnz = int(os.environ.get("AFT_QUANT_SPILL_NNZ", 50_000_000))
    if world == 1:
        sink = _CooSpill(
            Path(opts.output_dir) / "alevin" / "quants_mat.mtx", spill_nnz
        )
    else:
        sink = _CooSpillBin(
            Path(opts.output_dir) / "alevin" / f".quants_coo_r{rank}",
            spill_nnz,
        )
    empty_coo = (
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32)
    )

    # device-path pipelining: blocks are submitted to the accelerator
    # asynchronously and fetched a bounded number of blocks later, so
    # transfer + on-chip sort of block k overlap host decode of block
    # k+1 (AFT_WTA_ASYNC=0 restores synchronous per-block resolution)
    async_device = (
        os.environ.get("AFT_WTA_ASYNC", "1") != "0"
        and crlike.device_backend_enabled(0)
    )
    async_depth = max(int(os.environ.get("AFT_WTA_QUEUE", 2)), 1)
    from collections import deque

    pending_q: deque = deque()

    def _flush(res) -> None:
        if res.pending is not None:
            res.pending()
        if sink is not None:
            sink.add(res.rows, res.cols, res.vals, len(res.cells))
            res.rows, res.cols, res.vals = empty_coo

    pb_ctx = stage_timer(log, "quant resolve", "reads")
    pb = pb_ctx.__enter__()
    try:
        for batch in iter_decoded_blocks(
            br, schema, hdr.num_chunks, block_records,
            skip_read_fields=set(schema.barcode_fields), want_dirs=False,
            chunk_range=chunk_range, prefetch=True,
        ):
            pb.update(batch.n_reads)
            first = batch.first_chunk
            batch.chunk_id = batch.chunk_id - first
            n_local = len(batch.chunk_offsets) - 1
            keep_local = np.ones(n_local, bool)
            if fsorted is not None:
                first_read = batch.chunk_offsets[:-1]
                cell_bc_all = batch.barcode_at(first_read)
                idx = np.searchsorted(fsorted, cell_bc_all)
                idx_c = np.minimum(idx, max(len(fsorted) - 1, 0))
                keep_local = (
                    (len(fsorted) > 0)
                    & (idx < len(fsorted))
                    & (fsorted[idx_c] == cell_bc_all)
                )
            res = _resolve_cells(
                batch, keep_local, tid_to_gid, opts, sa_model, usa_mode,
                usa_offsets, num_genes, num_rows, sample_names,
                cell_offset=first, async_device=async_device,
            )
            parts.append((first, res))
            # the sink streams row-ordered MTX bytes, so flushes must
            # stay in block order: a synchronous result forces any
            # queued async blocks ahead of it to flush first
            if res.pending is not None:
                pending_q.append(res)
                while len(pending_q) > async_depth:
                    _flush(pending_q.popleft())
            else:
                while pending_q:
                    _flush(pending_q.popleft())
                _flush(res)
        while pending_q:
            _flush(pending_q.popleft())
        pb_ctx.__exit__(None, None, None)

        result = _merge_results(parts)
        mtx_prewritten = False
        if world == 1:
            if sink.spilled:
                sink.finalize_spilled((len(result.cells), num_rows))
                mtx_prewritten = True
                log.info(
                    "quants_mat.mtx streamed to disk (%d triplets spilled "
                    "past the %d in-memory bound)", sink.nnz, spill_nnz,
                )
            else:
                result.rows, result.cols, result.vals = sink.concatenated()
    except BaseException:
        # don't leave a multi-GB body sidecar + open handle behind
        if world == 1:
            sink.abort()
        else:
            sink.cleanup()
        raise

    if world > 1:
        if sink.spilled:
            log.info(
                "process %d: %d triplets spilled to the rank-local binary "
                "sidecar (bound %d)", rank, sink.nnz, spill_nnz,
            )
        _stream_merge_mtx(
            sink, len(result.cells), num_rows,
            Path(opts.output_dir) / "alevin" / "quants_mat.mtx",
        )
        mtx_prewritten = True
        result = _merge_hosts(
            result, want_dump=opts.dump_eq,
            want_boot=opts.num_bootstraps > 0,
        )
        if rank != 0:
            log.info("process %d: partial results merged to host 0", rank)
            return

    _write_outputs(
        opts, parent, result, gene_names, usa_mode, num_rows, barcode_len,
        unmapped, sample_names, mtx_prewritten=mtx_prewritten,
    )


@dataclass
class CellResult:
    cells: np.ndarray           # processed cell indices (row order)
    cell_bcs: np.ndarray        # uint64 barcode per processed cell
    sample_idx: Optional[np.ndarray]  # per processed cell, or None
    nrec: np.ndarray            # mapped records per cell
    rows: np.ndarray            # MTX COO
    cols: np.ndarray
    vals: np.ndarray
    mmrate: Dict[int, float]
    alt_res_cells: List[int]
    dump_eq_data: Optional[list]  # list of CellEqClasses (global cell ids)
    boot_mean: Optional[tuple]
    boot_var: Optional[tuple]
    # per-cell QC stats (sum_umi, max_umi, num_expr, over_mean), computed
    # block-locally so the global COO need not be held in memory
    cell_stats: Optional[tuple] = None
    # device-path async handle: a no-arg callable that fills
    # rows/cols/vals/cell_stats once the device finishes this block
    # (lets device compute overlap host decode of the next block)
    pending: Optional[object] = None


def _coo_cell_stats(rows: np.ndarray, vals: np.ndarray, n_cells: int) -> tuple:
    """Per-cell featureDump stats from COO triplets (rows must be
    cell-row indices in [0, n_cells)).  Each cell's stats depend only on
    its own triplets, so per-block results concatenate to the global
    answer."""
    sum_umi = np.zeros(n_cells, np.float32)
    max_umi = np.zeros(n_cells, np.float32)
    num_expr = np.zeros(n_cells, np.int64)
    over_mean = np.zeros(n_cells, np.int64)
    if len(rows):
        rr = rows
        if len(rr) < 2 or bool((rr[1:] >= rr[:-1]).all()):
            # rows arrive sorted: segmented reductions (reduceat) are an
            # order of magnitude faster than ufunc.at scatter
            starts = np.flatnonzero(
                np.concatenate(([True], rr[1:] != rr[:-1]))
            )
            ridx = rr[starts]
            sum_umi[ridx] = np.add.reduceat(vals, starts)
            max_umi[ridx] = np.maximum.reduceat(vals, starts)
            num_expr[ridx] = np.add.reduceat(
                (vals > 0).astype(np.int64), starts
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                mean_expr_arr = sum_umi / num_expr.astype(np.float32)
            gt = vals > mean_expr_arr[rr]
            over_mean[ridx] = np.add.reduceat(gt.astype(np.int64), starts)
        else:
            np.add.at(sum_umi, rr, vals)
            np.maximum.at(max_umi, rr, vals)
            np.add.at(num_expr, rr, (vals > 0).astype(np.int64))
            with np.errstate(invalid="ignore", divide="ignore"):
                mean_expr_arr = sum_umi / num_expr.astype(np.float32)
            gt = vals > mean_expr_arr[rr]
            np.add.at(over_mean, rr, gt.astype(np.int64))
    return sum_umi, max_umi, num_expr, over_mean


class _CooSpill:
    """Owns the streamed quant COO at bounded memory: blocks are held
    in memory until ``spill_nnz`` triplets accumulate, then the MTX body
    starts streaming to disk (MtxStreamWriter) and memory stays flat.
    Rows arrive block-local and are shifted to global row indices here."""

    def __init__(self, path, spill_nnz: int):
        self.path = path
        self.spill_nnz = spill_nnz
        self.row_off = 0
        self.nnz = 0
        self._blocks: List[tuple] = []
        self._writer = None

    def add(self, rows, cols, vals, n_cells: int) -> None:
        rows = rows + self.row_off
        self.row_off += n_cells
        self.nnz += len(vals)
        if self._writer is not None:
            self._writer.add(rows, cols, vals)
            return
        self._blocks.append((rows, cols, vals))
        if self.nnz > self.spill_nnz:
            from ..radz.mtx import MtxStreamWriter

            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._writer = MtxStreamWriter(self.path)
            for blk in self._blocks:
                self._writer.add(*blk)
            self._blocks = []

    @property
    def spilled(self) -> bool:
        return self._writer is not None

    def concatenated(self) -> tuple:
        assert self._writer is None
        if not self._blocks:
            return (
                np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float32),
            )
        cat = np.concatenate
        return tuple(cat([b[i] for b in self._blocks]) for i in range(3))

    def finalize_spilled(self, shape) -> None:
        self._writer.finalize(shape)

    def abort(self) -> None:
        if self._writer is not None:
            self._writer.abort()


class _CooSpillBin:
    """Rank-local binary COO spill for multi-host runs: blocks stay in
    memory until ``spill_nnz`` triplets, then stream to rank-local
    binary sidecars (rows/cols/vals).  The final MTX body is stream-
    merged at rank 0 in rank order over bounded DCN chunks
    (``_stream_merge_mtx``), so bounded memory and multi-host compose
    instead of excluding each other (quant.rs:1770-1806 semantics;
    VERDICT r2 item 4).  Rows arrive block-local and shift to
    host-local row indices here; the global shift happens at merge."""

    _STREAMS = ("rows", "cols", "vals")
    _DTYPES = (np.int64, np.int64, np.float32)

    def __init__(self, base, spill_nnz: int):
        self.base = Path(base)
        self.spill_nnz = spill_nnz
        self.row_off = 0
        self.nnz = 0
        self._blocks: List[tuple] = []
        self._fh = None

    def _paths(self):
        return [Path(f"{self.base}.{s}") for s in self._STREAMS]

    def add(self, rows, cols, vals, n_cells: int) -> None:
        rows = np.asarray(rows, np.int64) + self.row_off
        self.row_off += n_cells
        self.nnz += len(vals)
        blk = (rows, np.asarray(cols, np.int64), np.asarray(vals, np.float32))
        if self._fh is not None:
            self._write(blk)
            return
        self._blocks.append(blk)
        if self.nnz > self.spill_nnz:
            self.base.parent.mkdir(parents=True, exist_ok=True)
            self._fh = [open(p, "wb") for p in self._paths()]
            for b in self._blocks:
                self._write(b)
            self._blocks = []

    def _write(self, blk) -> None:
        for fh, arr, dt in zip(self._fh, blk, self._DTYPES):
            fh.write(np.asarray(arr, dt).tobytes())

    @property
    def spilled(self) -> bool:
        return self._fh is not None

    def iter_chunks(self, chunk: int):
        """Yield the spilled triplets back in ``chunk``-bounded windows
        (exactly ``ceil(nnz / chunk)`` of them — the DCN merge protocol
        depends on that count)."""
        if self._fh is not None:
            for fh in self._fh:
                fh.close()
            self._fh = ()
            paths = self._paths()
            for off in range(0, self.nnz, chunk):
                cnt = min(chunk, self.nnz - off)
                yield tuple(
                    np.fromfile(
                        p, dt, count=cnt,
                        offset=off * np.dtype(dt).itemsize,
                    )
                    for p, dt in zip(paths, self._DTYPES)
                )
            return
        if not self._blocks:
            return
        cat = [
            np.concatenate([b[i] for b in self._blocks]) for i in range(3)
        ]
        self._blocks = []
        for off in range(0, self.nnz, chunk):
            yield tuple(c[off : off + chunk] for c in cat)

    def cleanup(self) -> None:
        if self._fh:
            for fh in self._fh:
                fh.close()
        self._fh = None
        self._blocks = []
        for p in self._paths():
            p.unlink(missing_ok=True)


def _stream_merge_mtx(sink: "_CooSpillBin", n_local_cells: int,
                      num_rows: int, out_path: Path) -> None:
    """Merge per-host COO spills into the final quants_mat.mtx at rank 0
    without materializing any full matrix: hosts own disjoint contiguous
    cell ranges, so the body is the rank-ordered concatenation of their
    streams; each bounded chunk crosses the DCN once.  Every rank runs
    the same collective sequence."""
    import os

    from ..parallel import dist
    from ..radz.mtx import MtxStreamWriter

    rank, world = dist.rank_world()
    chunk = int(os.environ.get("AFT_QUANT_MERGE_CHUNK", 4_000_000))
    counts = np.concatenate(
        dist.allgather_ragged(np.asarray([n_local_cells], np.int64))
    )
    bases = np.concatenate([[0], np.cumsum(counts)])
    n_chunks = np.concatenate(
        dist.allgather_ragged(np.asarray([-(-sink.nnz // chunk)], np.int64))
    )
    if rank == 0:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    writer = MtxStreamWriter(out_path) if rank == 0 else None
    gen = sink.iter_chunks(chunk)
    empty = (
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32)
    )
    try:
        for r in range(world):
            for _ in range(int(n_chunks[r])):
                mine = next(gen) if rank == r else empty
                rr = dist.allgather_ragged(mine[0])
                cc = dist.allgather_ragged(mine[1])
                vv = dist.allgather_ragged(mine[2])
                if writer is not None:
                    writer.add(rr[r] + int(bases[r]), cc[r], vv[r])
        if writer is not None:
            writer.finalize((int(counts.sum()), num_rows))
            writer = None
    finally:
        if writer is not None:
            writer.abort()
        sink.cleanup()


def _flatten_eqc_list(parts: list):
    """Concatenate per-block CellEqClasses into one (CSR offset fixups:
    classes shift by classes-so-far, labels by labels-so-far)."""
    import dataclasses

    parts = [p for p in parts if len(p.cell_ids)]
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    cat = np.concatenate
    ceo = [np.asarray(parts[0].cell_eq_offsets, np.int64)]
    lo = [np.asarray(parts[0].label_offsets, np.int64)]
    for p in parts[1:]:
        ceo.append(np.asarray(p.cell_eq_offsets[1:], np.int64) + ceo[-1][-1])
        lo.append(np.asarray(p.label_offsets[1:], np.int64) + lo[-1][-1])
    return dataclasses.replace(
        parts[0],
        cell_ids=cat([p.cell_ids for p in parts]),
        cell_eq_offsets=cat(ceo),
        label_offsets=cat(lo),
        labels=cat([p.labels for p in parts]),
        counts=cat([p.counts for p in parts]),
    )


def _merge_hosts(
    result: CellResult, want_dump: bool = False, want_boot: bool = False,
) -> CellResult:
    """Merge per-host partial CellResults across the DCN: hosts own
    disjoint contiguous cell-chunk ranges, so the merge is a ragged
    all-gather + concat in rank order (per SURVEY §2.3 — no reduction
    is needed); matrix rows shift by the cells of lower ranks.

    ``want_dump``/``want_boot`` come from the run options (NOT from the
    local result, which may be empty on a host whose cells all took the
    fast path) so every rank enters the same collectives."""
    from ..ops.crlike import CellEqClasses
    from ..parallel import dist

    rank, world = dist.rank_world()
    n_local = np.asarray([len(result.cells)], np.int64)
    row_counts = np.concatenate(dist.allgather_ragged(n_local))
    row_off = int(row_counts[:rank].sum())

    gather = lambda a, dt: np.concatenate(
        dist.allgather_ragged(np.asarray(a, dt))
    )
    rows, cols, vals = dist.merge_partial_coo(
        result.rows, result.cols, result.vals, row_off
    )
    mm_keys = gather(list(result.mmrate.keys()), np.int64)
    mm_vals = gather(list(result.mmrate.values()), np.float64)
    sample_idx = result.sample_idx
    if sample_idx is not None:
        sample_idx = gather(sample_idx, np.int64)
    cell_stats = None
    if result.cell_stats is not None:
        s, m, ne, om = result.cell_stats
        cell_stats = (
            gather(s, np.float32), gather(m, np.float32),
            gather(ne, np.int64), gather(om, np.int64),
        )

    # dump-eq: each host flattens its blocks to one CellEqClasses; the
    # five CSR components gather raggedly and rank order reconstructs
    # the per-host list (cell ids are already global, so interning in
    # list order preserves the single-process first-encounter order)
    dump = None
    if want_dump:
        local = _flatten_eqc_list(result.dump_eq_data or [])
        empty = CellEqClasses(
            cell_ids=np.zeros(0, np.int64),
            cell_eq_offsets=np.zeros(1, np.int64),
            label_offsets=np.zeros(1, np.int64),
            labels=np.zeros(0, np.uint32),
            counts=np.zeros(0, np.uint32),
        )
        local = local if local is not None else empty
        comps = {
            "cell_ids": (np.int64, dist.allgather_ragged(
                np.asarray(local.cell_ids, np.int64))),
            "ceo": (np.int64, dist.allgather_ragged(
                np.asarray(local.cell_eq_offsets, np.int64))),
            "lo": (np.int64, dist.allgather_ragged(
                np.asarray(local.label_offsets, np.int64))),
            "labels": (np.uint32, dist.allgather_ragged(
                np.asarray(local.labels, np.uint32))),
            "counts": (np.uint32, dist.allgather_ragged(
                np.asarray(local.counts, np.uint32))),
        }
        dump = []
        for r in range(world):
            ci = comps["cell_ids"][1][r]
            if not len(ci):
                continue
            dump.append(CellEqClasses(
                cell_ids=ci,
                cell_eq_offsets=comps["ceo"][1][r],
                label_offsets=comps["lo"][1][r],
                labels=comps["labels"][1][r].astype(np.uint32),
                counts=comps["counts"][1][r].astype(np.uint32),
            ))

    # bootstraps: rows are host-local row indices; shift by the host
    # row base and concatenate in rank order (like the main COO)
    boot_mean = boot_var = None
    if want_boot:
        z = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.float32))

        def _gather_boot(t):
            r_, c_, v_ = t if t is not None else z
            return dist.merge_partial_coo(
                np.asarray(r_, np.int64), np.asarray(c_, np.int64),
                np.asarray(v_, np.float32), row_off,
            )

        boot_mean = _gather_boot(result.boot_mean)
        boot_var = _gather_boot(result.boot_var)

    return CellResult(
        cells=gather(result.cells, np.int64),
        cell_bcs=gather(result.cell_bcs, np.uint64),
        sample_idx=sample_idx,
        nrec=gather(result.nrec, np.int64),
        rows=rows, cols=cols, vals=vals,
        mmrate={int(k): float(v) for k, v in zip(mm_keys, mm_vals)},
        alt_res_cells=[int(c) for c in gather(result.alt_res_cells, np.int64)],
        dump_eq_data=dump,
        boot_mean=boot_mean,
        boot_var=boot_var,
        cell_stats=cell_stats,
    )


def _merge_results(parts: List[tuple]) -> CellResult:
    """Merge per-block CellResults (streamed quant).  ``parts`` holds
    (first_chunk, CellResult) in file order; block-local cell indices
    shift by first_chunk and matrix rows by the cells emitted so far."""
    import dataclasses

    if not parts:
        z64 = np.zeros(0, np.int64)
        return CellResult(
            cells=z64, cell_bcs=np.zeros(0, np.uint64), sample_idx=None,
            nrec=z64, rows=z64, cols=z64, vals=np.zeros(0, np.float32),
            mmrate={}, alt_res_cells=[], dump_eq_data=None,
            boot_mean=None, boot_var=None,
        )
    if len(parts) == 1 and parts[0][0] == 0:
        r = parts[0][1]
        if r.dump_eq_data is not None:
            r.dump_eq_data = [r.dump_eq_data]
        return r
    cells_l, bcs_l, sidx_l, nrec_l = [], [], [], []
    rows_l, cols_l, vals_l = [], [], []
    stats_l: List[tuple] = []
    mmrate: Dict[int, float] = {}
    alt: List[int] = []
    dump: List = []
    bm = ([], [], [])
    bv = ([], [], [])
    have_boot = have_dump = False
    rows_off = 0
    for first, r in parts:
        if r.cell_stats is not None:
            stats_l.append(r.cell_stats)
        cells_l.append(r.cells + first)
        bcs_l.append(r.cell_bcs)
        if r.sample_idx is not None:
            sidx_l.append(r.sample_idx)
        nrec_l.append(r.nrec)
        rows_l.append(r.rows + rows_off)
        cols_l.append(r.cols)
        vals_l.append(r.vals)
        mmrate.update({k + first: v for k, v in r.mmrate.items()})
        alt.extend(c + first for c in r.alt_res_cells)
        if r.dump_eq_data is not None:
            have_dump = True
            eqc = r.dump_eq_data
            dump.append(dataclasses.replace(
                eqc, cell_ids=eqc.cell_ids + first
            ))
        if r.boot_mean is not None:
            have_boot = True
            for dst, src in ((bm, r.boot_mean), (bv, r.boot_var)):
                dst[0].append(src[0] + rows_off)
                dst[1].append(src[1])
                dst[2].append(src[2])
        rows_off += len(r.cells)
    cat = np.concatenate
    return CellResult(
        cells=cat(cells_l),
        cell_bcs=cat(bcs_l),
        sample_idx=cat(sidx_l) if sidx_l else None,
        nrec=cat(nrec_l),
        rows=cat(rows_l), cols=cat(cols_l), vals=cat(vals_l),
        mmrate=mmrate,
        alt_res_cells=alt,
        dump_eq_data=dump if have_dump else None,
        boot_mean=tuple(cat(x) for x in bm) if have_boot else None,
        boot_var=tuple(cat(x) for x in bv) if have_boot else None,
        cell_stats=(
            tuple(cat([s[i] for s in stats_l]) for i in range(4))
            if len(stats_l) == len(parts) else None
        ),
    )


def _resolve_cells(
    batch: ReadBatch,
    keep_cells: np.ndarray,
    tid_to_gid: np.ndarray,
    opts: QuantOpts,
    sa_model: str,
    usa_mode: bool,
    usa_offsets,
    num_genes: int,
    num_rows: int,
    sample_names,
    cell_offset: int = 0,
    async_device: bool = False,
) -> CellResult:
    n_cells_all = len(batch.chunk_offsets) - 1
    nrec_all = np.diff(batch.chunk_offsets)
    processed = np.flatnonzero(keep_cells & (nrec_all > 0))
    # row order = file (cell) order
    cell_row = np.full(n_cells_all, -1, np.int64)
    cell_row[processed] = np.arange(len(processed))

    first_read = batch.chunk_offsets[:-1]
    cell_bcs = batch.barcode_at(first_read[processed])
    sample_idx = None
    if sample_names is not None and len(batch.schema.barcode_fields) > 1:
        # the scatter phase stored the sample ordinal in barcodes[0]
        # (quant.rs:1955-1956)
        sample_idx = batch.barcode_at(first_read[processed], 0).astype(np.int64)

    # read-level views restricted to processed cells
    cell_of_read = batch.chunk_id
    read_keep = keep_cells[cell_of_read]
    # small/large split by record count
    small_cell = nrec_all < SMALL_CELL_FAST_THRESHOLD

    rows_l: List[np.ndarray] = []
    cols_l: List[np.ndarray] = []
    vals_l: List[np.ndarray] = []
    mmrate: Dict[int, float] = {}
    alt_res_cells: List[int] = []
    dump_eq_data = None
    boot_mean = boot_var = None
    pending_handle = None

    def add_coo(cells_idx, cols, vals):
        rows_l.append(cell_row[cells_idx])
        cols_l.append(np.asarray(cols, np.int64))
        vals_l.append(np.asarray(vals, np.float32))

    # --- combined fast path: pure cr-like counting ------------------------
    # small cells always resolve WTA, and large cells resolve WTA too
    # when -r cr-like (non-USA always; USA when the sa-model is
    # winner-take-all), so with no eqclass dump the whole batch goes
    # through ONE fused resolve+count pass (native threaded kernel;
    # quant.rs small cells at :453 and large cr-like at :822 compute the
    # same counts)
    if (
        opts.resolution == "cr-like"
        and not opts.dump_eq
        and (not usa_mode or sa_model == "winner-take-all")
        and read_keep.any()
    ):
        if bool(read_keep.all()):
            sub = {
                "cell": cell_of_read,
                "umi": batch.umi,
                "refs": batch.refs,
                "offs": batch.aln_offsets,
            }
        else:
            sub = _subset_reads(batch, read_keep)
        rcv = None
        if crlike.device_backend_enabled(len(sub["umi"])):
            if async_device:
                # submit and return a pending handle: the device sorts
                # this block while the host decodes the next one, and
                # the compacted result is fetched later in block order
                pend = crlike.wta_counts_device(
                    sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                    tid_to_gid, num_rows, usa=usa_mode, async_=True,
                )
                if pend is not None:
                    pending_handle = pend
                    read_keep = np.zeros_like(read_keep)
            if pending_handle is None:
                rcv = crlike.wta_counts_device(
                    sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                    tid_to_gid, num_rows, usa=usa_mode,
                )
        if pending_handle is None:
            if rcv is None:
                rcv = crlike.wta_counts_native(
                    sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                    tid_to_gid, num_rows,
                    usa_offsets=usa_offsets if usa_mode else None,
                )
            if rcv is None:
                groups = crlike.resolve_crlike(
                    sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                    tid_to_gid, prefer_ambig=False,
                )
                if usa_mode:
                    slot, valid = crlike.usa_slots_for_groups(groups, num_rows)
                else:
                    slot, valid = crlike.nonusa_unique_slots(groups)
                rcv = crlike.counts_from_slots(
                    groups.cell, slot, valid, n_cells_all, num_rows
                )
            add_coo(*rcv)
            read_keep = np.zeros_like(read_keep)  # handled; skip both branches

    # --- small cells: always the sparse cr-like WTA fast path ------------
    sel_small = read_keep & small_cell[cell_of_read]
    if sel_small.any():
        sub = _subset_reads(batch, sel_small)
        rcv = None
        if crlike.device_backend_enabled(len(sub["umi"])):
            rcv = crlike.wta_counts_device(
                sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                tid_to_gid, num_rows, usa=usa_mode,
            )
        if rcv is None:
            rcv = crlike.wta_counts_native(
                sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                tid_to_gid, num_rows,
                usa_offsets=usa_offsets if usa_mode else None,
            )
        if rcv is None:
            groups = crlike.resolve_crlike(
                sub["cell"], sub["umi"], sub["refs"], sub["offs"], tid_to_gid,
                prefer_ambig=False,
            )
            if usa_mode:
                slot, valid = crlike.usa_slots_for_groups(groups, num_rows)
            else:
                slot, valid = crlike.nonusa_unique_slots(groups)
            rcv = crlike.counts_from_slots(
                groups.cell, slot, valid, n_cells_all, num_rows
            )
        add_coo(*rcv)

    # --- large cells ------------------------------------------------------
    sel_large = read_keep & ~small_cell[cell_of_read]
    if sel_large.any():
        sub = _subset_reads(batch, sel_large)
        res = opts.resolution
        if res in ("cr-like", "cr-like-em"):
            if res == "cr-like" and not opts.dump_eq:
                # pure gene-unique counting: no eqclass grouping needed
                rcv = None
                if crlike.device_backend_enabled(len(sub["umi"])):
                    rcv = crlike.wta_counts_device(
                        sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                        tid_to_gid, num_rows, usa=usa_mode,
                        prefer_ambig=(
                            usa_mode and sa_model == "prefer-ambig"
                        ),
                    )
                if rcv is None:
                    groups = crlike.resolve_crlike(
                        sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                        tid_to_gid,
                        prefer_ambig=(usa_mode and sa_model == "prefer-ambig"),
                    )
                    if usa_mode:
                        slot, valid = crlike.usa_slots_for_groups(
                            groups, num_rows
                        )
                    else:
                        slot, valid = crlike.nonusa_unique_slots(groups)
                    rcv = crlike.counts_from_slots(
                        groups.cell, slot, valid, n_cells_all, num_rows
                    )
                add_coo(*rcv)
                bm = bv = None
            else:
                groups = crlike.resolve_crlike(
                    sub["cell"], sub["umi"], sub["refs"], sub["offs"],
                    tid_to_gid,
                    prefer_ambig=(usa_mode and sa_model == "prefer-ambig"),
                )
                dump_eq_data, bm, bv = _counts_from_groups(
                    groups, res, usa_mode, usa_offsets, num_genes, num_rows,
                    n_cells_all, opts, add_coo, cell_offset=cell_offset,
                )
            boot_mean, boot_var = bm, bv
        elif res == "trivial":
            r, c, v, mm = crlike.resolve_trivial(
                sub["cell"], sub["umi"], sub["refs"], sub["offs"], tid_to_gid,
                n_cells_all, num_genes,
            )
            add_coo(r, c, v)
            for ci in np.unique(sub["cell"]):
                mmrate[int(ci)] = float(mm[ci])
        elif res in PARSIMONY_RESOLUTIONS:
            from ..ops import pug

            gene_level = res in ("parsimony-gene", "parsimony-gene-em")
            aln_probs = (
                _longread_aln_probs(sub) if _is_long_read(batch.schema) else None
            )
            groups_eqc, alt_cells, eq_probs = pug.resolve_parsimony_cells(
                sub, tid_to_gid, num_genes,
                pug_exact_umi=opts.pug_exact_umi,
                large_graph_thresh=opts.large_graph_thresh,
                gene_level=gene_level,
                aln_probs=aln_probs,
            )
            alt_res_cells.extend(int(c) for c in alt_cells)
            dump_eq_data, bm, bv = _counts_from_eqclasses(
                groups_eqc, res, usa_mode, usa_offsets, num_genes, num_rows,
                n_cells_all, opts, add_coo, eq_probs=eq_probs,
                cell_offset=cell_offset,
            )
            boot_mean, boot_var = bm, bv
        else:
            raise ValueError(f"unknown resolution strategy {res}")

    # bootstrap triplets carry global cell indices; remap to row indices
    if boot_mean is not None:
        boot_mean = (cell_row[boot_mean[0]], boot_mean[1], boot_mean[2])
        boot_var = (cell_row[boot_var[0]], boot_var[1], boot_var[2])

    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0, np.float32)
    # each contributing block arrives sorted by (row, col) (resolvers
    # emit cell-ascending, slot-sorted triplets); merging two sorted
    # blocks via searchsorted avoids a full lexsort of the whole matrix
    keys_l = [r * np.int64(num_rows) + cv for r, cv in zip(rows_l, cols_l)]
    blocks_sorted = all(
        len(k) < 2 or bool((k[1:] >= k[:-1]).all()) for k in keys_l
    )
    if blocks_sorted and len(keys_l) == 2:
        k1, k2 = keys_l
        pos1 = np.arange(len(k1), dtype=np.int64) + np.searchsorted(k2, k1)
        pos2 = np.arange(len(k2), dtype=np.int64) + np.searchsorted(
            k1, k2, side="right"
        )
        order = np.empty(len(k1) + len(k2), np.int64)
        order[pos1] = np.arange(len(k1), dtype=np.int64)
        order[pos2] = len(k1) + np.arange(len(k2), dtype=np.int64)
    elif blocks_sorted and len(keys_l) <= 1:
        order = slice(None)
    else:
        order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    result = CellResult(
        cells=processed,
        cell_bcs=cell_bcs,
        sample_idx=sample_idx,
        nrec=nrec_all[processed],
        rows=rows, cols=cols, vals=vals,
        mmrate=mmrate,
        alt_res_cells=alt_res_cells,
        dump_eq_data=dump_eq_data,
        boot_mean=boot_mean,
        boot_var=boot_var,
        cell_stats=(
            None if pending_handle is not None
            else _coo_cell_stats(rows, vals, len(processed))
        ),
    )
    if pending_handle is not None:
        n_proc = len(processed)

        def _finish(res=result, pend=pending_handle, cr=cell_row, n=n_proc):
            r, c, v = pend.get()
            rr = cr[r]
            # device output arrives sorted by (cell, gene); cell_row is
            # monotone over processed cells, so row order is preserved
            res.rows, res.cols, res.vals = rr, c, v
            res.cell_stats = _coo_cell_stats(rr, v, n)
            res.pending = None

        result.pending = _finish
    return result


def _subset_reads(batch: ReadBatch, read_mask: np.ndarray) -> dict:
    idx = np.flatnonzero(read_mask)
    nal = batch.num_aln_per_read[idx]
    offs = np.zeros(len(idx) + 1, np.int64)
    np.cumsum(nal, out=offs[1:])
    gather = np.repeat(batch.aln_offsets[:-1][idx], nal) + (
        np.arange(int(offs[-1])) - np.repeat(offs[:-1], nal)
    )
    # extra alignment columns are only consumed by the long-read
    # probability models; skip the gathers otherwise
    need_cols = _is_long_read(batch.schema)
    return {
        "cell": batch.chunk_id[idx],
        "umi": batch.umi[idx],
        "refs": batch.refs[gather],
        "offs": offs,
        "aln_cols": (
            {k: v[gather] for k, v in batch.aln_cols.items()} if need_cols else {}
        ),
    }


def _is_long_read(schema) -> bool:
    names = {n for n, _ in schema.aln_fields}
    return {"as", "start", "end"} <= names


def _longread_aln_probs(sub: dict) -> np.ndarray:
    """Per-alignment probabilities for long-read records: the product of
    the alignment-score model exp((AS - max_AS)/5) (eq_class.rs:20-38)
    and the 3'-end distance model (eq_class.rs:40-85), normalized to sum
    1 within each read."""
    offs = sub["offs"]
    n = len(offs) - 1
    nal = np.diff(offs)
    read_of_aln = np.repeat(np.arange(n), nal)
    as_raw = np.ascontiguousarray(
        sub["aln_cols"]["as"].astype(np.uint32)
    ).view(np.int32).astype(np.float64)
    max_as = np.full(n, -np.inf)
    np.maximum.at(max_as, read_of_aln, as_raw)
    score_p = np.exp((as_raw - max_as[read_of_aln]) / 5.0)

    ends = sub["aln_cols"]["end"].astype(np.float64)
    tlens = sub["aln_cols"].get("tlen")
    if tlens is None:
        # without a tlen tag the 3' model degenerates to distance 0
        tlens = ends
    else:
        tlens = tlens.astype(np.float64)
    dist = tlens - ends
    extra = np.maximum(dist - 100.0, 0.0)
    ln_w = -(extra * extra) * (0.5 / (100.0 * 100.0))
    ln_floor = -3.0 * np.log(10.0)
    end_p = np.exp(np.maximum(ln_w, ln_floor))

    final = score_p * end_p
    sums = np.zeros(n)
    np.add.at(sums, read_of_aln, final)
    ok = sums[read_of_aln] > 0
    final[ok] = final[ok] / sums[read_of_aln][ok]
    return final


def _counts_from_groups(
    groups, res, usa_mode, usa_offsets, num_genes, num_rows, n_cells_all,
    opts, add_coo, cell_offset=0,
):
    """cr-like family: extract counts or run EM from per-UMI tie sets."""
    eqc = crlike.group_eqclasses(groups)
    return _counts_from_eqclasses(
        eqc, res, usa_mode, usa_offsets, num_genes, num_rows, n_cells_all,
        opts, add_coo, cell_offset=cell_offset,
    )


def _counts_from_eqclasses(
    eqc: crlike.CellEqClasses, res, usa_mode, usa_offsets, num_genes,
    num_rows, n_cells_all, opts, add_coo, eq_probs=None, cell_offset=0,
):
    only_unique = res in ("cr-like", "parsimony", "parsimony-gene")
    dump_eq_data = eqc if opts.dump_eq else None
    boot_mean = boot_var = None

    if usa_mode and only_unique:
        # integer extract_counts path
        g = crlike.UmiGroups(
            cell=np.repeat(eqc.cell_ids, np.diff(eqc.cell_eq_offsets)),
            umi=np.zeros(len(eqc.counts), np.uint64),
            label_offsets=eqc.label_offsets,
            labels=eqc.labels,
        )
        slot, valid = crlike.usa_slots_for_groups(g, num_rows)
        # each class contributes its count
        c = g.cell[valid]
        s = slot[valid]
        w = eqc.counts[valid].astype(np.float32)
        key = c * np.int64(num_rows) + s
        uk, inv = np.unique(key, return_inverse=True)
        agg = np.zeros(len(uk), np.float32)
        np.add.at(agg, inv, w)
        add_coo((uk // num_rows), uk % num_rows, agg)
        return dump_eq_data, boot_mean, boot_var

    if only_unique:
        # non-USA: count only singleton classes per gene
        lens = np.diff(eqc.label_offsets)
        sgl = lens == 1
        c = np.repeat(eqc.cell_ids, np.diff(eqc.cell_eq_offsets))[sgl]
        gidx = eqc.labels[eqc.label_offsets[:-1][sgl]].astype(np.int64)
        w = eqc.counts[sgl].astype(np.float32)
        key = c * np.int64(num_rows) + gidx
        uk, inv = np.unique(key, return_inverse=True)
        agg = np.zeros(len(uk), np.float32)
        np.add.at(agg, inv, w)
        add_coo((uk // num_rows), uk % num_rows, agg)
        return dump_eq_data, boot_mean, boot_var

    # EM path
    if usa_mode:
        lab_offs, labels = crlike.usa_transform_labels(eqc, num_rows)
        em_rows = num_rows
        em_usa = usa_offsets
        with_last_round = True
    else:
        lab_offs, labels = eqc.label_offsets, eqc.labels
        em_rows = num_genes
        em_usa = None
        with_last_round = False
    class_weights = None
    if eq_probs is not None and not usa_mode:
        # long-read probability-weighted EM (em.rs:716-844): reduce the
        # per-molecule probability rows to flat per-label weights once,
        # then run the same batched kernel with a weighted E-step
        from ..ops.em import class_weights_from_prob_rows

        class_weights = class_weights_from_prob_rows(lab_offs, eq_probs)
        with_last_round = False
    from ..parallel.mesh import mesh_from_env

    results = em_cells_batched(
        eqc.cell_eq_offsets, lab_offs, labels, eqc.counts,
        em_rows, em_usa, opts.init_uniform, with_last_round,
        mesh=mesh_from_env(), class_weights=class_weights,
    )
    for ci, (nz, vv) in zip(eqc.cell_ids, results):
        add_coo(np.full(len(nz), ci), nz, vv)

    if opts.num_bootstraps > 0:
        from ..ops.bootstrap import run_bootstraps

        boot_mean, boot_var = run_bootstraps(
            eqc, lab_offs, labels, em_rows, opts.num_bootstraps,
            opts.init_uniform, opts.summary_stat, cell_offset=cell_offset,
        )
    return dump_eq_data, boot_mean, boot_var


# --- output writing ----------------------------------------------------------

def _write_outputs(
    opts: QuantOpts,
    parent: Path,
    result: CellResult,
    gene_names: List[str],
    usa_mode: bool,
    num_rows: int,
    barcode_len: int,
    unmapped: UnmappedLookup,
    sample_names,
    mtx_prewritten: bool = False,
) -> None:
    out_path = Path(opts.output_dir)
    out_path.mkdir(parents=True, exist_ok=True)
    mat_path = out_path / "alevin"
    mat_path.mkdir(parents=True, exist_ok=True)

    n_rows_out = len(result.cells)

    # quants_mat_cols.txt (quant.rs:1745-1768)
    with open(mat_path / "quants_mat_cols.txt", "w") as fh:
        fh.write("".join(f"{g}\n" for g in gene_names))
        if usa_mode:
            fh.write("".join(f"{g}-U\n" for g in gene_names))
            fh.write("".join(f"{g}-A\n" for g in gene_names))

    # quants_mat_rows.txt + featureDump.txt (barcode strings unpacked
    # vectorized: 2-bit matrix -> fixed-width byte view -> unicode)
    from ..ops.barcodes import unpack_seqs

    bc_strs = (
        unpack_seqs(result.cell_bcs, barcode_len)
        .view(f"S{barcode_len}")
        .ravel()
        .astype(f"U{barcode_len}")
        if n_rows_out
        else np.zeros(0, dtype="U1")
    )
    unmapped_cts = unmapped.get(result.cell_bcs)

    # per-cell stats: computed block-locally during resolution (so the
    # spilled-COO path never needs the global triplets); fall back to
    # recomputing from the COO when absent
    if result.cell_stats is not None:
        sum_umi, max_umi, num_expr, over_mean = result.cell_stats
    else:
        sum_umi, max_umi, num_expr, over_mean = _coo_cell_stats(
            result.rows, result.vals, n_rows_out
        )
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_expr = (sum_umi / num_expr.astype(np.float32)).astype(np.float32)
        mean_by_max = (mean_expr / max_umi).astype(np.float32)

    empty_cells = [int(c) for c in result.cells[num_expr == 0]]

    # vectorized row assembly: per-cell stats formatted natively in bulk,
    # both files written in one call each
    nm_v = result.nrec.astype(np.int64)
    nu_v = unmapped_cts.astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mapping_rate_v = nm_v.astype(np.float32) / (nm_v + nu_v).astype(np.float32)
        dedup_rate_v = sum_umi / nm_v.astype(np.float32)
    s_sum = format_f32_list(sum_umi)
    s_map = format_f32_list(mapping_rate_v)
    s_dedup = format_f32_list(dedup_rate_v)
    s_mbm = format_f32_list(mean_by_max)

    # vectorized line assembly (no per-cell Python loop)
    bc_u = np.asarray(bc_strs, dtype="U")
    tab = np.full(n_rows_out, "\t", dtype="U1")
    if sample_names is not None and result.sample_idx is not None:
        si = np.asarray(result.sample_idx, np.int64)
        valid = si < len(sample_names)
        names_u = np.asarray(list(sample_names) + ["NA"], dtype="U")
        sn_u = names_u[np.where(valid, si, len(sample_names))]
        # rows file: "<sample>_<bc>" when the sample resolves, bare bc
        # otherwise (should not happen post simpleaf#195 fix)
        bc_rows = np.where(
            valid,
            np.char.add(np.char.add(sn_u, "_"), bc_u),
            bc_u,
        )
        head = np.char.add(np.char.add(np.char.add(bc_u, tab), sn_u), tab)
    else:
        bc_rows = bc_u
        head = np.char.add(bc_u, tab)
    line = head
    for piece in (
        (nm_v + nu_v).astype("U20"), tab, nm_v.astype("U20"), tab,
        np.asarray(s_sum, dtype="U"), tab, np.asarray(s_map, dtype="U"), tab,
        np.asarray(s_dedup, dtype="U"), tab, np.asarray(s_mbm, dtype="U"), tab,
        num_expr.astype("U20"), tab, over_mean.astype("U20"),
        np.full(n_rows_out, "\n", dtype="U1"),
    ):
        line = np.char.add(line, piece)
    fd_lines = line.tolist()
    with open(mat_path / "quants_mat_rows.txt", "w") as fbc:
        fbc.write("\n".join(bc_rows.tolist()) + ("\n" if n_rows_out else ""))
    with open(out_path / "featureDump.txt", "w") as ffd:
        if sample_names is not None:
            ffd.write(
                "CB\tsample_name\tCorrectedReads\tMappedReads\tDeduplicatedReads\t"
                "MappingRate\tDedupRate\tMeanByMax\tNumGenesExpressed\t"
                "NumGenesOverMean\n"
            )
        else:
            ffd.write(
                "CB\tCorrectedReads\tMappedReads\tDeduplicatedReads\tMappingRate\t"
                "DedupRate\tMeanByMax\tNumGenesExpressed\tNumGenesOverMean\n"
            )
        ffd.write("".join(fd_lines))

    if not mtx_prewritten:
        write_matrix_market(
            mat_path / "quants_mat.mtx",
            result.rows, result.cols, result.vals,
            (n_rows_out, num_rows),
        )

    if result.boot_mean is not None:
        bm_r, bm_c, bm_v = result.boot_mean
        write_matrix_market(
            mat_path / "bootstraps_mean.mtx", bm_r, bm_c, bm_v,
            (n_rows_out, num_rows),
        )
        bv_r, bv_c, bv_v = result.boot_var
        write_matrix_market(
            mat_path / "bootstraps_var.mtx", bv_r, bv_c, bv_v,
            (n_rows_out, num_rows),
        )

    if opts.dump_eq:
        # fast-path (small) cells contribute no classes (the reference's
        # gene_eqc map is never touched below the threshold,
        # quant.rs:1269-1272), but the dump artifacts are still written
        _write_eqc_counts(result, num_rows, usa_mode, mat_path)

    meta_info = {
        "cmd": opts.cmdline,
        "version_str": opts.version,
        "resolution_strategy": _resolution_display(opts.resolution),
        "num_quantified_cells": n_rows_out,
        "num_genes": num_rows,
        "dump_eq": opts.dump_eq,
        "usa_mode": usa_mode,
        "alt_resolved_cell_numbers": result.alt_res_cells,
        "empty_resolved_cell_numbers": empty_cells,
        "quant_options": {
            "input_dir": str(opts.input_dir),
            "tg_map": str(opts.tg_map),
            "output_dir": str(opts.output_dir),
            "num_threads": opts.num_threads,
            "num_bootstraps": opts.num_bootstraps,
            "init_uniform": opts.init_uniform,
            "summary_stat": opts.summary_stat,
            "dump_eq": opts.dump_eq,
            "resolution": _resolution_display(opts.resolution),
            "pug_exact_umi": opts.pug_exact_umi,
            "sa_model": opts.sa_model,
            "small_thresh": opts.small_thresh,
            "large_graph_thresh": opts.large_graph_thresh,
            "filter_list": str(opts.filter_list) if opts.filter_list else None,
            "cmdline": opts.cmdline,
            "version": opts.version,
        },
    }
    write_json(out_path / "quant.json", meta_info)
    log.info("finished quantifying %d cells", n_rows_out)


def _resolution_display(res: str) -> str:
    """The reference serializes the enum Debug name (quant.rs:92-96)."""
    return {
        "trivial": "Trivial",
        "cr-like": "CellRangerLike",
        "cr-like-em": "CellRangerLikeEm",
        "parsimony": "Parsimony",
        "parsimony-em": "ParsimonyEm",
        "parsimony-gene": "ParsimonyGene",
        "parsimony-gene-em": "ParsimonyGeneEm",
    }[res]


def _write_eqc_counts(result: CellResult, num_rows: int, usa_mode: bool, mat_path: Path):
    """geqc_counts.mtx + gene_eqclass.txt.gz (quant.rs:228-354).

    Global eqclass ids are assigned in first-encounter order over cells
    (deterministic here since cell order is deterministic); labels are
    written with USA relabeling when usa_mode.  Fully vectorized: label
    sets are flattened across the streamed blocks, interned natively
    (radc_intern_label_sets; first-encounter order preserved), and the
    text file is rendered in bulk."""
    from ..radz import _native

    cells = np.asarray(result.cells, np.uint64)
    cell_order = np.argsort(cells, kind="stable")
    sorted_cells = cells[cell_order]

    rows_parts, counts_parts, labels_parts, lens_parts = [], [], [], []
    for eqc in result.dump_eq_data or []:
        cid = np.asarray(eqc.cell_ids, np.uint64)
        if len(cid) == 0:
            continue
        # map block cell ids -> output rows; drop unlisted cells
        idx = np.searchsorted(sorted_cells, cid)
        idx_c = np.minimum(idx, max(len(sorted_cells) - 1, 0))
        ok = (
            (len(sorted_cells) > 0)
            & (idx < len(sorted_cells))
            & (sorted_cells[idx_c] == cid)
        )
        row_of_cell = np.where(ok, cell_order[idx_c], -1)
        class_rows = np.repeat(row_of_cell, np.diff(eqc.cell_eq_offsets))
        keep = class_rows >= 0
        lens = np.diff(eqc.label_offsets)
        if keep.all():
            labels_parts.append(eqc.labels)
            lens_parts.append(lens)
            rows_parts.append(class_rows)
            counts_parts.append(eqc.counts)
        else:
            kidx = np.flatnonzero(keep)
            klens = lens[kidx]
            gather = np.repeat(
                np.asarray(eqc.label_offsets)[kidx], klens
            ) + (
                np.arange(int(klens.sum()))
                - np.repeat(np.cumsum(klens) - klens, klens)
            )
            labels_parts.append(np.asarray(eqc.labels)[gather])
            lens_parts.append(klens)
            rows_parts.append(class_rows[kidx])
            counts_parts.append(np.asarray(eqc.counts)[kidx])

    if rows_parts:
        trip_r = np.concatenate(rows_parts).astype(np.int64)
        trip_v = np.concatenate(counts_parts).astype(np.float32)
        labels_flat = np.concatenate(labels_parts).astype(np.uint64)
        set_lens = np.concatenate(lens_parts).astype(np.int64)
    else:
        trip_r = np.zeros(0, np.int64)
        trip_v = np.zeros(0, np.float32)
        labels_flat = np.zeros(0, np.uint64)
        set_lens = np.zeros(0, np.int64)
    offs = np.zeros(len(set_lens) + 1, np.int64)
    np.cumsum(set_lens, out=offs[1:])

    if _native.available():
        ids, rep = _native.intern_label_sets(labels_flat, offs)
    else:
        key_to_id: Dict[bytes, int] = {}
        ids = np.empty(len(set_lens), np.int64)
        rep_l: List[int] = []
        for i in range(len(set_lens)):
            kb = labels_flat[offs[i] : offs[i + 1]].tobytes()
            gid = key_to_id.get(kb)
            if gid is None:
                gid = len(key_to_id)
                key_to_id[kb] = gid
                rep_l.append(i)
            ids[i] = gid
        rep = np.asarray(rep_l, np.int64)

    write_matrix_market(
        mat_path / "geqc_counts.mtx",
        trip_r, ids, trip_v,
        (len(result.cells), len(rep)),
    )

    # representative label slices, flattened in global-id order
    rep_lens = offs[rep + 1] - offs[rep] if len(rep) else np.zeros(0, np.int64)
    rep_off = np.zeros(len(rep) + 1, np.int64)
    np.cumsum(rep_lens, out=rep_off[1:])
    gidx = np.repeat(offs[rep], rep_lens) + (
        np.arange(int(rep_off[-1])) - np.repeat(rep_off[:-1], rep_lens)
    )
    rl = labels_flat[gidx]

    unspliced_off = num_rows // 3
    ambig_off = 2 * unspliced_off
    if usa_mode and len(rl):
        # USA relabel (quant.rs:286-338): a (spliced 2k, unspliced 2k+1)
        # adjacent pair inside one class collapses to one ambiguous
        # token.  Labels are sorted+unique per class, so pairs are
        # exactly {2k, 2k+1} and can never overlap — greedy == mask.
        cls = np.repeat(np.arange(len(rep), dtype=np.int64), rep_lens)
        nxt = np.zeros(len(rl), bool)
        nxt[:-1] = (cls[1:] == cls[:-1]) & (rl[1:] == rl[:-1] + 1)
        pair = nxt & (rl % 2 == 0)
        consumed = np.zeros(len(rl), bool)
        consumed[1:] = pair[:-1]
        tok = np.where(
            pair,
            (rl >> np.uint64(1)) + np.uint64(ambig_off),
            np.where(
                rl % 2 == 0,
                rl >> np.uint64(1),
                (rl >> np.uint64(1)) + np.uint64(unspliced_off),
            ),
        )
        keepm = ~consumed
        tok = tok[keepm]
        new_lens = np.add.reduceat(keepm.astype(np.int64), rep_off[:-1])
        new_off = np.zeros(len(rep) + 1, np.int64)
        np.cumsum(new_lens, out=new_off[1:])
    else:
        tok = rl
        new_off = rep_off

    if _native.available():
        body = _native.format_eqc_rows(tok, new_off)
    else:
        parts = []
        for eqid in range(len(rep)):
            vals = tok[new_off[eqid] : new_off[eqid + 1]]
            parts.append(
                "\t".join(str(int(t)) for t in vals) + f"\t{eqid}\n"
            )
        body = "".join(parts).encode()
    # mtime=0 keeps the artifact deterministic (byte-comparable across
    # runs and across the single-/multi-host paths)
    with open(mat_path / "gene_eqclass.txt.gz", "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as fh:
            fh.write(f"{num_rows}\n{len(rep)}\n".encode())
            fh.write(body)
