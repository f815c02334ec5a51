"""infer — gene-level inference from a dumped eqc count matrix.

Re-implements src/infer.rs:31-400: read the cell x eqclass MTX and the
gzipped gene_eqclass label file, re-run the per-cell subset EM (USA
offsets honored with ``--usa``), and write the cell x gene matrix with
rows/cols sidecars (cols copied from the input directory).
"""

from __future__ import annotations

import gzip
import shutil
from pathlib import Path
from typing import Optional

import numpy as np

from ..ops.em import em_cells_batched
from ..radz.mtx import read_matrix_market, write_matrix_market
from ..utils import read_barcode_file
from .logging_ import get_logger

log = get_logger("infer")


def read_eqc_label_file(path: Path):
    """Parse gene_eqclass.txt.gz: num_genes, num_eqc, then per line
    ``g1 g2 ... gk eqid`` (eq_class.rs:249-298)."""
    with gzip.open(path, "rt") as fh:
        num_genes = int(fh.readline())
        num_eqc = int(fh.readline())
        labels_by_id = [None] * num_eqc
        for line in fh:
            toks = line.split()
            if not toks:
                continue
            eqid = int(toks[-1])
            labels_by_id[eqid] = np.asarray([int(t) for t in toks[:-1]], np.uint32)
    lens = np.asarray([0 if l is None else len(l) for l in labels_by_id], np.int64)
    offsets = np.zeros(num_eqc + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (
        np.concatenate([l for l in labels_by_id if l is not None])
        if num_eqc else np.zeros(0, np.uint32)
    )
    return num_genes, offsets, flat


def infer(
    count_mat: Path,
    eq_label_file: Path,
    usa_mode: bool,
    num_threads: int,
    filter_list: Optional[Path],
    output_dir: Path,
) -> None:
    count_mat = Path(count_mat)
    parent = count_mat.parent
    rows, cols, vals, (n_cells, n_eqc_mat) = read_matrix_market(count_mat)
    log.info("read %d x %d equivalence class count matrix.", n_cells, n_eqc_mat)

    num_genes, eq_offsets, eq_labels = read_eqc_label_file(Path(eq_label_file))
    log.info("read %d equivalence classes from file.", len(eq_offsets) - 1)

    usa_offsets = (num_genes // 3, 2 * num_genes // 3) if usa_mode else None

    bc_path = parent / "quants_mat_rows.txt"
    with open(bc_path) as fh:
        bc_lines = [l.strip() for l in fh if l.strip()]
    bc_len = len(bc_lines[0])

    keep = np.ones(n_cells, bool)
    if filter_list is not None:
        fset, _l = read_barcode_file(Path(filter_list), bc_len)
        fstr = set(fset.tolist())
        from ..ops.barcodes import pack_seq

        keep = np.asarray([pack_seq(b) in fstr for b in bc_lines], bool)

    # assemble per-cell (eq_id, count) data; build a *cell-local*
    # eqclass list indexing into the global labels
    order = np.lexsort((cols, rows))
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    m = keep[rows_s]
    rows_s, cols_s, vals_s = rows_s[m], cols_s[m], vals_s[m]

    kept_cells = np.flatnonzero(keep)
    cell_rank = np.full(n_cells, -1, np.int64)
    cell_rank[kept_cells] = np.arange(len(kept_cells))

    # per processed cell: contiguous runs in rows_s
    cell_counts = np.zeros(len(kept_cells), np.int64)
    np.add.at(cell_counts, cell_rank[rows_s], 1)
    cell_eq_offsets = np.zeros(len(kept_cells) + 1, np.int64)
    np.cumsum(cell_counts, out=cell_eq_offsets[1:])

    # flatten labels per (cell, class) occurrence
    occ_lens = (eq_offsets[cols_s + 1] - eq_offsets[cols_s])
    lab_offsets = np.zeros(len(cols_s) + 1, np.int64)
    np.cumsum(occ_lens, out=lab_offsets[1:])
    gather = np.repeat(eq_offsets[cols_s], occ_lens) + (
        np.arange(int(lab_offsets[-1])) - np.repeat(lab_offsets[:-1], occ_lens)
    )
    labels = eq_labels[gather]
    counts = vals_s.astype(np.uint32)

    from ..parallel.mesh import mesh_from_env

    results = em_cells_batched(
        cell_eq_offsets, lab_offsets, labels, counts,
        num_genes, usa_offsets, False, True,
        mesh=mesh_from_env(),
    )

    out_path = Path(output_dir)
    out_path.mkdir(parents=True, exist_ok=True)
    shutil.copy(parent / "quants_mat_cols.txt", out_path / "quants_mat_cols.txt")
    with open(out_path / "quants_mat_rows.txt", "w") as fh:
        fh.write("".join(bc_lines[ci] + "\n" for ci in kept_cells))

    o_rows, o_cols, o_vals = [], [], []
    for ri, (nz, vv) in enumerate(results):
        o_rows.extend([ri] * len(nz))
        o_cols.extend(nz.tolist())
        o_vals.extend(vv.tolist())
    write_matrix_market(
        out_path / "quants_mat.mtx",
        np.asarray(o_rows, np.int64), np.asarray(o_cols, np.int64),
        np.asarray(o_vals, np.float32), (len(kept_cells), num_genes),
    )
    log.info("finished quantifying %d cells.", len(kept_cells))
