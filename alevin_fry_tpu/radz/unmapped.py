"""Unmapped-read barcode counts sidecar.

The upstream mapper writes ``unmapped_bc_count.bin`` next to the RAD
file; collate corrects its barcodes and writes
``unmapped_bc_count_collated.bin``, which quant reads to compute the
per-cell mapping rate (reference: src/collate.rs:344-393 via
libradicl's unmapped module; quant.rs:1444-1454).

Input side we support the legacy raw format (repeated little-endian
``bc:u64 | count:u32`` pairs, cf. the legacy fallback at
src/collate.rs:372-384).  For the collated output we use a
self-describing container: magic ``AFUC``, version byte, number of key
fields, per-field int-type ids, then records (key fields + u32 count).
A missing or unreadable file degrades to empty counts, matching the
reference's unwrap_or_else fallback at quant.rs:1448-1453.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Tuple

import numpy as np

from .types import _INT_SIZES, U64

_MAGIC = b"AFUC"
_VERSION = 1


def read_raw_unmapped(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a legacy (u64 barcode, u32 count) pair file; returns
    (bcs, counts).  Missing/odd-sized files yield empty arrays."""
    p = Path(path)
    if not p.exists():
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    raw = p.read_bytes()
    if raw[:4] == _MAGIC:
        return read_collated(p)[:2]
    if len(raw) % 12 != 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    n = len(raw) // 12
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 12)
    bcs = arr[:, :8].copy().view(np.uint64).ravel()
    cts = arr[:, 8:].copy().view(np.uint32).ravel()
    return bcs, cts


def write_collated_single(path: Path, bcs: np.ndarray, counts: np.ndarray) -> None:
    bcs = np.asarray(bcs, np.uint64)
    counts = np.asarray(counts, np.uint32)
    order = np.argsort(bcs, kind="stable")
    bcs, counts = bcs[order], counts[order]
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<BB", _VERSION, 1))
        fh.write(struct.pack("<B", U64))
        fh.write(struct.pack("<Q", len(bcs)))
        rec = np.zeros((len(bcs), 12), np.uint8)
        rec[:, :8] = bcs.view(np.uint8).reshape(-1, 8)
        rec[:, 8:] = counts.view(np.uint8).reshape(-1, 4)
        fh.write(rec.tobytes())


def write_collated_multi(
    path: Path, sample_bcs: np.ndarray, cell_bcs: np.ndarray, counts: np.ndarray
) -> None:
    sample_bcs = np.asarray(sample_bcs, np.uint64)
    cell_bcs = np.asarray(cell_bcs, np.uint64)
    counts = np.asarray(counts, np.uint32)
    order = np.lexsort((cell_bcs, sample_bcs))
    sample_bcs, cell_bcs, counts = sample_bcs[order], cell_bcs[order], counts[order]
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<BB", _VERSION, 2))
        fh.write(struct.pack("<BB", U64, U64))
        fh.write(struct.pack("<Q", len(counts)))
        rec = np.zeros((len(counts), 20), np.uint8)
        rec[:, :8] = sample_bcs.view(np.uint8).reshape(-1, 8)
        rec[:, 8:16] = cell_bcs.view(np.uint8).reshape(-1, 8)
        rec[:, 16:] = counts.view(np.uint8).reshape(-1, 4)
        fh.write(rec.tobytes())


def read_collated(path: Path):
    """Read a collated unmapped-counts file; returns (key_bcs, counts,
    num_fields) where key_bcs is the *last* (cell) key field."""
    p = Path(path)
    if not p.exists():
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32), 1
    raw = p.read_bytes()
    if raw[:4] != _MAGIC:
        bcs, cts = read_raw_unmapped(p)
        return bcs, cts, 1
    ver, nf = struct.unpack("<BB", raw[4:6])
    del ver
    field_ids = struct.unpack(f"<{nf}B", raw[6 : 6 + nf])
    off = 6 + nf
    (n,) = struct.unpack("<Q", raw[off : off + 8])
    off += 8
    key_bytes = sum(_INT_SIZES[f] for f in field_ids)
    recsz = key_bytes + 4
    arr = np.frombuffer(raw[off : off + n * recsz], np.uint8).reshape(n, recsz)
    # last key field is the cell barcode
    last_w = _INT_SIZES[field_ids[-1]]
    last_off = key_bytes - last_w
    key = np.zeros(n, np.uint64)
    for k in range(last_w):
        key |= arr[:, last_off + k].astype(np.uint64) << np.uint64(8 * k)
    cts = arr[:, key_bytes:].copy().view(np.uint32).ravel()
    return key, cts, nf


class UnmappedLookup:
    """Binary-search lookup of unmapped counts by (cell) barcode."""

    def __init__(self, bcs: np.ndarray, counts: np.ndarray):
        order = np.argsort(bcs, kind="stable")
        self.bcs = np.asarray(bcs, np.uint64)[order]
        # aggregate duplicates (multi-sample keys share cell bcs)
        if len(self.bcs):
            uniq, inv = np.unique(self.bcs, return_inverse=True)
            agg = np.zeros(len(uniq), np.uint64)
            np.add.at(agg, inv, np.asarray(counts, np.uint64)[order])
            self.bcs, self.counts = uniq, agg
        else:
            self.counts = np.zeros(0, np.uint64)

    @classmethod
    def from_file(cls, path: Path) -> "UnmappedLookup":
        bcs, cts, _ = read_collated(path)
        return cls(bcs, cts)

    def get(self, bcs: np.ndarray) -> np.ndarray:
        """Vectorized count lookup (0 where missing)."""
        bcs = np.asarray(bcs, np.uint64)
        if len(self.bcs) == 0:
            return np.zeros(len(bcs), np.uint64)
        idx = np.searchsorted(self.bcs, bcs)
        idx_c = np.minimum(idx, len(self.bcs) - 1)
        hit = (idx < len(self.bcs)) & (self.bcs[idx_c] == bcs)
        return np.where(hit, self.counts[idx_c], np.uint64(0))
