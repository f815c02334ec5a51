"""view — dump a RAD file as text.

Matches the output of src/convert.rs:596-709: optional header lines
``{ref_id}:{ref_name}``, then one line per alignment:
``ID:{rec}\tHI:{i+1}\tNH:{n}\tCB:{bc}\tUMI:{umi}\tDIR:{bool}\t{ref_name}``
(DIR prints Rust bool Debug, i.e. ``true``/``false``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..ops.barcodes import unpack_seq
from ..radz import read_prelude
from ..radz.chunkio import iter_decoded_blocks
from ..radz.records import RecordSchema

_VIEW_BLOCK_RECORDS = 2_000_000


def view(rad_file: Path, print_header: bool = False, out=None) -> int:
    out = out or sys.stdout
    num = 0
    with open(rad_file, "rb") as fh:
        prelude, ftm, _ = read_prelude(fh)
        bclen = int(ftm["cblen"])
        umilen = int(ftm["ulen"])
        schema = RecordSchema.from_prelude(prelude)
        names = prelude.hdr.ref_names
        if print_header:
            for i, n in enumerate(names):
                out.write(f"{i}:{n}\n")
        rid_base = 0
        for batch in iter_decoded_blocks(
            fh, schema, prelude.hdr.num_chunks, _VIEW_BLOCK_RECORDS,
            prefetch=True,
        ):
            offs = batch.aln_offsets
            bcs = batch.barcode()
            umis = batch.umi
            for rid in range(batch.n_reads):
                s, e = int(offs[rid]), int(offs[rid + 1])
                nh = e - s
                bc_str = unpack_seq(int(bcs[rid]), bclen)
                umi_str = unpack_seq(int(umis[rid]), umilen)
                for i in range(s, e):
                    d = "true" if batch.dirs[i] else "false"
                    out.write(
                        f"ID:{rid_base + rid}\tHI:{i - s + 1}\tNH:{nh}\t"
                        f"CB:{bc_str}\tUMI:{umi_str}\tDIR:{d}\t"
                        f"{names[int(batch.refs[i])]}\n"
                    )
                    num += 1
            rid_base += batch.n_reads
    return num
