"""Record schemas and record-type sniffing.

The RAD record layout is dynamic and driven by the tag sections: a record
is ``num_aln:u32`` followed by the read-level tag values in declaration
order (e.g. ``b``/``u``, or ``b0``/``b1``/``u`` for multi-barcode, or
``barcode`` for ATAC), followed by ``num_aln`` repetitions of the
alignment-level tag values in declaration order.  The alignment tag
``compressed_ori_refid`` is a u32 whose high bit encodes orientation
(set = forward) and whose low 31 bits are the reference id
(reference: src/convert.rs:438-444 writing; view at src/convert.rs:670-705).

Record-type sniffing mirrors utils.rs:296-360:

* ``num_barcodes`` file tag > 1      -> multi-barcode RNA
* aln tags {as, start, end}          -> long-read RNA
* aln tag {pos}                      -> RNA with positions
* aln tags {type, start_pos, frag_len} -> ATAC
* otherwise                          -> classic RNA
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Tuple

from . import types as rt
from .header import RadPrelude

# alignment tags that carry the (orientation, reference-id) pair
REF_TAG_NAMES = ("compressed_ori_refid", "compressed_ori_ref", "ref")


class KnownRecordType(Enum):
    RNA_SHORT = "rna_short"
    RNA_SHORT_POS = "rna_short_pos"
    RNA_LONG = "rna_long"
    RNA_MULTI_BC = "rna_multi_bc"
    ATAC = "atac"


def record_type_from_prelude(
    prelude: RadPrelude, file_tag_map: Dict[str, rt.TagValue]
) -> Tuple[KnownRecordType, dict]:
    """Sniff the record type; returns (type, info) where info carries the
    barcode length(s) etc."""
    at = prelude.aln_tags
    if "num_barcodes" in file_tag_map:
        num_bc = int(file_tag_map["num_barcodes"])
        if num_bc > 1:
            cell_bc_len = int(file_tag_map[f"b{num_bc - 1}len"])
            return KnownRecordType.RNA_MULTI_BC, {
                "num_barcodes": num_bc,
                "cell_bc_len": cell_bc_len,
            }
    if at.has_tag("as") and at.has_tag("start") and at.has_tag("end"):
        return KnownRecordType.RNA_LONG, {"bc_len": int(file_tag_map["cblen"])}
    if at.has_tag("pos"):
        return KnownRecordType.RNA_SHORT_POS, {"bc_len": int(file_tag_map["cblen"])}
    if at.has_tag("type") and at.has_tag("start_pos") and at.has_tag("frag_len"):
        return KnownRecordType.ATAC, {"bc_len": int(file_tag_map["cblen"])}
    return KnownRecordType.RNA_SHORT, {"bc_len": int(file_tag_map["cblen"])}


@dataclass
class RecordSchema:
    """Fixed-width byte layout of one record, derived from tag sections.

    ``read_fields`` / ``aln_fields`` are (name, byte_width) in declaration
    order; every supported field is an unsigned little-endian int.
    ``ref_field`` names the alignment field that carries ori+ref-id.
    """

    read_fields: List[Tuple[str, int]] = field(default_factory=list)
    aln_fields: List[Tuple[str, int]] = field(default_factory=list)
    ref_field: str | None = None
    barcode_fields: List[str] = field(default_factory=list)
    umi_field: str | None = None

    @property
    def read_bytes(self) -> int:
        return sum(w for _, w in self.read_fields)

    @property
    def aln_bytes(self) -> int:
        return sum(w for _, w in self.aln_fields)

    @classmethod
    def from_prelude(cls, prelude: RadPrelude) -> "RecordSchema":
        sch = cls()
        for t in prelude.read_tags.tags:
            if not t.typeid.is_int:
                raise ValueError(
                    f"read tag {t.name!r} has non-int type; only RAD types 1-4 "
                    "are supported for read-level tags"
                )
            sch.read_fields.append((t.name, rt.int_size(t.typeid.type_id)))
            if t.name in ("b", "barcode") or (
                t.name.startswith("b") and t.name[1:].isdigit()
            ):
                sch.barcode_fields.append(t.name)
            elif t.name == "u":
                sch.umi_field = t.name
        for t in prelude.aln_tags.tags:
            if not t.typeid.is_int:
                raise ValueError(f"alignment tag {t.name!r} has non-int type")
            sch.aln_fields.append((t.name, rt.int_size(t.typeid.type_id)))
            if t.name in REF_TAG_NAMES:
                sch.ref_field = t.name
        return sch
