"""Collation manifest sidecar for hierarchically-collated (multi-sample)
RAD files.

Mirrors libradicl's ``collation::{CollationManifest, SampleGroup}`` API
as used by the reference (written at collate.rs:1896-1931, read at
quant.rs:1314-1330; roundtrip test multi_barcode_integration.rs:1017):
ordered sample groups with (key, optional name, chunk_start, num_chunks,
num_records) and a list of level names.  Self-describing binary layout:
magic ``AFCM`` | version u8 | num_levels u8 | levels (u16-len strings) |
num_groups u64 | per group: key u64, name flag + u16-len string,
chunk_start u64, num_chunks u64, num_records u64.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

_MAGIC = b"AFCM"
_VERSION = 1


@dataclass
class SampleGroup:
    key: int
    name: Optional[str]
    chunk_start: int
    num_chunks: int
    num_records: int


@dataclass
class CollationManifest:
    levels: List[str]
    sample_groups: List[SampleGroup] = field(default_factory=list)

    def add_sample_group(self, g: SampleGroup) -> None:
        self.sample_groups.append(g)

    def total_chunks(self) -> int:
        return sum(g.num_chunks for g in self.sample_groups)

    def total_records(self) -> int:
        return sum(g.num_records for g in self.sample_groups)

    def write_to_file(self, path: Path) -> None:
        with open(path, "wb") as fh:
            fh.write(_MAGIC)
            fh.write(struct.pack("<BB", _VERSION, len(self.levels)))
            for lv in self.levels:
                b = lv.encode()
                fh.write(struct.pack("<H", len(b)))
                fh.write(b)
            fh.write(struct.pack("<Q", len(self.sample_groups)))
            for g in self.sample_groups:
                fh.write(struct.pack("<Q", g.key))
                if g.name is None:
                    fh.write(struct.pack("<B", 0))
                else:
                    nb = g.name.encode()
                    fh.write(struct.pack("<BH", 1, len(nb)))
                    fh.write(nb)
                fh.write(struct.pack("<QQQ", g.chunk_start, g.num_chunks, g.num_records))

    @classmethod
    def read_from_file(cls, path: Path) -> "CollationManifest":
        with open(path, "rb") as fh:
            if fh.read(4) != _MAGIC:
                raise ValueError(f"{path} is not a collation manifest")
            _ver, nlv = struct.unpack("<BB", fh.read(2))
            levels = []
            for _ in range(nlv):
                (n,) = struct.unpack("<H", fh.read(2))
                levels.append(fh.read(n).decode())
            (ng,) = struct.unpack("<Q", fh.read(8))
            m = cls(levels)
            for _ in range(ng):
                (key,) = struct.unpack("<Q", fh.read(8))
                (has_name,) = struct.unpack("<B", fh.read(1))
                name = None
                if has_name:
                    (n,) = struct.unpack("<H", fh.read(2))
                    name = fh.read(n).decode()
                cs, nc, nr = struct.unpack("<QQQ", fh.read(24))
                m.add_sample_group(SampleGroup(key, name, cs, nc, nr))
        return m
