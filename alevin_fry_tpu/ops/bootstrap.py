"""Bootstrap replicates over per-cell equivalence-class counts.

Mirrors run_bootstrap / run_bootstrap_subset (em.rs:427-568): per cell,
resample the class counts from a multinomial with the observed counts
as weights (total draws = total observed fragments), re-run the EM with
Random init, and report either the full replicates' mean/variance or
the summary statistics.  The reference only ever writes the mean and
variance matrices (quant.rs:115-208), which is what we produce.

Resampling uses a seeded NumPy generator (the reference uses an
unseeded thread RNG; bootstrap draws are stochastic by nature, so we
choose determinism).  The generator is seeded PER CELL from the global
cell index so replicates are invariant to how quant blocks the cell
stream (AFT_QUANT_BLOCK_RECORDS) — mirroring the reference's per-cell
barcode-seeded hasher philosophy (quant.rs:921).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .crlike import CellEqClasses
from .em import em_optimize_cell_np


def run_bootstraps(
    eqc: CellEqClasses,
    label_offsets: np.ndarray,
    labels: np.ndarray,
    num_rows: int,
    num_bootstraps: int,
    init_uniform: bool,
    summary_stat: bool,
    seed: int = 271828,
    cell_offset: int = 0,
) -> Tuple[tuple, tuple]:
    """Returns ((rows, cols, mean_vals), (rows, cols, var_vals)) COO
    triplets over (cell_row=block-local cell index, gene).
    ``cell_offset`` globalizes the per-cell RNG seed under streaming."""
    rows_m, cols_m, vals_m = [], [], []
    rows_v, cols_v, vals_v = [], [], []
    C = len(eqc.cell_ids)
    for k in range(C):
        ci = int(eqc.cell_ids[k])
        # splitmix-style per-cell stream: independent of block layout
        rng = np.random.RandomState(
            (seed + 0x9E3779B9 * (ci + cell_offset + 1)) & 0xFFFFFFFF
        )
        s, e = eqc.cell_eq_offsets[k], eqc.cell_eq_offsets[k + 1]
        if s == e:
            continue
        cts = eqc.counts[s:e].astype(np.int64)
        total = int(cts.sum())
        assert total > 0, "Cannot bootstrap from a sample with 0 counts."
        p = cts / total
        offs = label_offsets[s : e + 1] - label_offsets[s]
        labs = labels[label_offsets[s] : label_offsets[e]]

        asum = np.zeros(num_rows, np.float64)
        asq = np.zeros(num_rows, np.float64)
        for _ in range(num_bootstraps):
            resampled = rng.multinomial(total, p).astype(np.uint32)
            # Random init matching EmInitType::Random (em.rs:225-228)
            init = (rng.random_sample(num_rows) + 1e-5).astype(np.float32)
            alphas = em_optimize_cell_np(
                offs, labs, resampled, num_rows, None, False,
                with_last_round=True, init_alphas=init,
            )
            est = float(alphas.sum())
            assert est > 0.0, "Alpha sum is too small"
            asum += alphas
            asq += alphas.astype(np.float64) ** 2
        mean = (asum / num_bootstraps).astype(np.float32)
        var = (asq / num_bootstraps - (asum / num_bootstraps) ** 2).astype(np.float32)
        nzm = np.flatnonzero(mean != 0)
        rows_m.extend([ci] * len(nzm))
        cols_m.extend(nzm.tolist())
        vals_m.extend(mean[nzm].tolist())
        nzv = np.flatnonzero(var != 0)
        rows_v.extend([ci] * len(nzv))
        cols_v.extend(nzv.tolist())
        vals_v.extend(var[nzv].tolist())
    return (
        (np.asarray(rows_m, np.int64), np.asarray(cols_m, np.int64),
         np.asarray(vals_m, np.float32)),
        (np.asarray(rows_v, np.int64), np.asarray(cols_v, np.int64),
         np.asarray(vals_v, np.float32)),
    )
