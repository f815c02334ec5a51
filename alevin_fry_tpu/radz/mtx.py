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


MTX_HEADER = (
    b"%%MatrixMarket matrix coordinate real general\n"
    b"% written by alevin-fry-tpu\n"
)


def format_mtx_body(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray) -> bytes:
    """Format coordinate triplets (0-based in, 1-based out) as MTX body
    bytes.  A value formats identically whether or not the batch around
    it is all-integral, so bodies can be produced block-by-block and
    concatenated byte-identically to a single call."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, np.float32)
    # bulk formatting: integral values (the common case for count
    # matrices) go through a fast vectorized integer path
    ivals = vals.astype(np.int64)
    is_int = (vals == ivals) & np.isfinite(vals)
    if is_int.all():
        # pure-integer matrix: native C formatting
        from . import _native

        if _native.available():
            return _native.format_triplets(rows + 1, cols + 1, ivals)
        import pandas as pd

        buf = pd.DataFrame(
            {"r": rows + 1, "c": cols + 1, "v": ivals}
        ).to_csv(sep=" ", header=False, index=False, lineterminator="\n")
        return buf.encode()
    # mixed int/float values (EM outputs): one native pass formats the
    # whole body — the numpy char.mod/char.add chain below measured 8 s
    # per 10M-read cr-like-em quant (r5 profile), ~25% of the stage
    from . import _native

    if _native.available():
        return _native.format_triplets_f32(rows + 1, cols + 1, vals)
    vstr = np.char.mod("%d", ivals).astype(object)
    ni = np.flatnonzero(~is_int)
    vstr[ni] = format_f32_list(vals[ni])
    body = np.char.add(
        np.char.add(
            np.char.mod("%d ", rows + 1), np.char.mod("%d ", cols + 1)
        ),
        np.char.add(np.asarray(vstr, dtype=np.str_), "\n"),
    )
    return "".join(body.tolist()).encode()


def write_matrix_market(
    path: Path, rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
    shape: Tuple[int, int],
) -> None:
    """Write a coordinate-format MatrixMarket file (1-based indices)."""
    # binary sink: the body is pure ASCII and the native formatter
    # already produces bytes — avoid a decode + re-encode round trip
    with open(path, "wb") as fh:
        fh.write(MTX_HEADER)
        fh.write(f"{shape[0]} {shape[1]} {len(np.asarray(vals))}\n".encode())
        fh.write(format_mtx_body(rows, cols, vals))


class MtxStreamWriter:
    """Bounded-memory MatrixMarket writer: body blocks stream to a
    sidecar temp file as they arrive (nnz is only known at the end, so
    the final file is header + one sequential copy of the body).  The
    bytes are identical to a single ``write_matrix_market`` call over
    the concatenated triplets."""

    def __init__(self, path: Path):
        self.path = Path(path)
        self._tmp = self.path.with_suffix(self.path.suffix + ".body.tmp")
        self._fh = open(self._tmp, "wb")
        self.nnz = 0

    def add(self, rows: np.ndarray, cols: np.ndarray, vals: np.ndarray) -> None:
        self._fh.write(format_mtx_body(rows, cols, vals))
        self.nnz += int(len(np.asarray(vals)))

    def finalize(self, shape: Tuple[int, int]) -> None:
        import shutil

        self._fh.close()
        with open(self.path, "wb") as out, open(self._tmp, "rb") as body:
            out.write(MTX_HEADER)
            out.write(f"{shape[0]} {shape[1]} {self.nnz}\n".encode())
            shutil.copyfileobj(body, out, 1 << 22)
        self._tmp.unlink()

    def abort(self) -> None:
        try:
            self._fh.close()
        finally:
            if self._tmp.exists():
                self._tmp.unlink()


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
