"""radz: the RAD container format layer (our libradicl equivalent).

Implements parsing and writing of the RAD container format consumed by
alevin-fry (header + three tag sections + file-tag values + chunked,
tag-schema-driven records), the binary sidecar formats used between
pipeline stages (permit_freq.bin / permit_map.bin / bincode maps /
unmapped counts / collation manifest), and MatrixMarket output matching
the reference's sprs-based writer.

Decoding produces *columnar* NumPy arrays (one array per field, with a
CSR alignment offset array) rather than per-record objects, so that all
downstream computation can run as JAX/XLA array programs.  The hot
byte-level decode runs in native C++ (csrc/radc.cpp) when built, with a
pure-NumPy fallback.

Reference behavior captured from /root/reference usage of libradicl
0.14.3 (e.g. src/convert.rs:232-370 for writing, src/collate.rs:969-1001
for prelude parsing, tests/multi_barcode_integration.rs:43-202 for
programmatic construction).
"""

from .types import (  # noqa: F401
    RadType,
    TagDesc,
    TagSection,
    SECTION_FILE,
    SECTION_READ,
    SECTION_ALN,
)
from .header import RadHeader, RadPrelude, read_prelude, read_file_tag_values  # noqa: F401
from .records import KnownRecordType, record_type_from_prelude  # noqa: F401
from .chunkio import ReadBatch, decode_all_chunks, ChunkWriter  # noqa: F401
from .writers import RadWriter  # noqa: F401
