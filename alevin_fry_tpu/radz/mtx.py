"""MatrixMarket I/O matching the reference's sprs-based writer.

The reference writes cell x gene counts via ``sprs::io::write_matrix_market``
(src/quant.rs:1805-1806) with f32 values; Rust's float Display prints the
shortest round-trip decimal (so integral values print without a decimal
point).  We mirror that formatting so diffs against the reference are
byte-clean on integer-valued matrices.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def rust_f32_str(x: float) -> str:
    """Format an f32 the way Rust's ``Display`` does (shortest decimal
    that round-trips, positional notation, NaN/inf spelled Rust-style)."""
    v = np.float32(x)
    if np.isnan(v):
        return "NaN"
    if np.isinf(v):
        return "inf" if v > 0 else "-inf"
    return np.format_float_positional(v, unique=True, trim="-")


def format_f32_list(vals: np.ndarray) -> list:
    """Bulk Rust-Display f32 formatting (native when available)."""
    from . import _native

    if _native.available():
        return _native.format_f32(np.asarray(vals, np.float32))
    return [rust_f32_str(v) for v in np.asarray(vals, np.float32)]


def write_matrix_market(
    path: Path, rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
    shape: Tuple[int, int],
) -> None:
    """Write a coordinate-format MatrixMarket file (1-based indices)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, np.float32)
    # binary sink: the body is pure ASCII and the native formatter
    # already produces bytes — avoid a decode + re-encode round trip
    with open(path, "wb") as fh:
        fh.write(b"%%MatrixMarket matrix coordinate real general\n")
        fh.write(b"% written by alevin-fry-tpu\n")
        fh.write(f"{shape[0]} {shape[1]} {len(vals)}\n".encode())
        # bulk formatting: integral values (the common case for count
        # matrices) go through a fast vectorized integer path
        ivals = vals.astype(np.int64)
        is_int = (vals == ivals) & np.isfinite(vals)
        if is_int.all():
            # pure-integer matrix: native C formatting
            from . import _native

            if _native.available():
                fh.write(_native.format_triplets(rows + 1, cols + 1, ivals))
            else:
                import pandas as pd

                buf = pd.DataFrame(
                    {"r": rows + 1, "c": cols + 1, "v": ivals}
                ).to_csv(sep=" ", header=False, index=False,
                         lineterminator="\n")
                fh.write(buf.encode())
        else:
            vstr = np.char.mod("%d", ivals).astype(object)
            ni = np.flatnonzero(~is_int)
            vstr[ni] = format_f32_list(vals[ni])
            body = np.char.add(
                np.char.add(
                    np.char.mod("%d ", rows + 1), np.char.mod("%d ", cols + 1)
                ),
                np.char.add(np.asarray(vstr, dtype=np.str_), "\n"),
            )
            fh.write("".join(body.tolist()).encode())


def read_matrix_market(path: Path):
    """Read a coordinate MatrixMarket file; returns (rows, cols, vals,
    (nrows, ncols)) with 0-based indices."""
    with open(path) as fh:
        header = fh.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError(f"{path} is not a MatrixMarket file")
        line = fh.readline()
        while line.startswith("%"):
            line = fh.readline()
        nrows, ncols, nnz = (int(t) for t in line.split())
        data = np.loadtxt(fh, dtype=np.float64, ndmin=2) if nnz else np.zeros((0, 3))
    if data.size == 0:
        data = data.reshape(0, 3)
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = data[:, 2]
    return rows, cols, vals, (nrows, ncols)
