"""RAD file writer with num_chunks backpatching.

Mirrors the behavior of libradicl's ``RadFileWriter`` as exercised by the
reference's synthetic-RAD integration tests
(tests/multi_barcode_integration.rs:157-201) and convert.rs's manual
writing (header backpatch at src/convert.rs:584-590).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Dict

import numpy as np

from .chunkio import ChunkWriter, encode_records
from .header import RadPrelude
from .records import RecordSchema
from .types import TagValue


class RadWriter:
    def __init__(self, fh: BinaryIO, prelude: RadPrelude, file_tag_vals: Dict[str, TagValue]):
        self.fh = fh
        self.prelude = prelude
        self.schema = RecordSchema.from_prelude(prelude)
        self.num_chunks_pos = prelude.write(fh)
        prelude.write_file_tag_values(fh, file_tag_vals)
        self.chunks = ChunkWriter(fh)

    def write_chunk(
        self,
        read_cols: Dict[str, np.ndarray],
        aln_offsets: np.ndarray,
        refs: np.ndarray | None = None,
        dirs: np.ndarray | None = None,
        aln_cols: Dict[str, np.ndarray] | None = None,
    ) -> None:
        body = encode_records(
            self.schema, read_cols, aln_offsets, refs, dirs, aln_cols or {}
        )
        self.chunks.write_chunk_bytes(body, len(aln_offsets) - 1)

    def finalize(self) -> int:
        """Backpatch num_chunks into the header; returns the chunk count."""
        n = self.chunks.num_chunks
        self.fh.flush()
        pos = self.fh.tell()
        self.fh.seek(self.num_chunks_pos)
        self.fh.write(struct.pack("<Q", n))
        self.fh.seek(pos)
        self.fh.flush()
        return n
