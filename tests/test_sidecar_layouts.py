"""Byte-layout pinning for the bincode sidecar files.

These tests hand-encode the expected bytes FIELD BY FIELD from the
documented bincode-1.x-fixint layouts (little-endian, u64 collection
lengths) — independently of the writers in radz/ — and assert that the
writers produce exactly those bytes and the readers decode them.  A
writer/reader-symmetric layout bug (e.g. swapped field order that
roundtrips through our own code) fails here, where a roundtrip golden
test would not.

Layout sources in the reference:
  * collation_manifest.bin   struct literal at collate.rs:1908-1914,
                             reads at quant.rs:1314-1330
  * unmapped_bc_count_collated.bin  HashMap<u64,u32> /
                             HashMap<(u64,u64),u32> (collate.rs:261-392,
                             quant.rs:1445-1453, atac/collate.rs:255-260)
  * permit_freq.bin          version + bclen + HashMap<u64,u64>
                             (utils.rs:414-459)
  * permit_map.bin           HashMap<u64,u64> (cellfilter.rs:301-305)

The env-gated hook at the bottom (AFT_TEST_REF_ARTIFACTS=<dir>) reads
REAL reference-produced sidecars the moment any environment can provide
them (mirroring the reference's own env-gated real-data test,
tests/multi_barcode_integration.rs:821-830): drop Rust-written
collation_manifest.bin / unmapped_bc_count_collated.bin /
permit_freq.bin into <dir> and the decoders are run against them.
"""

import os
import struct
from pathlib import Path

import numpy as np
import pytest

from alevin_fry_tpu.radz import bincodeio
from alevin_fry_tpu.radz.collation import CollationManifest, SampleGroup
from alevin_fry_tpu.radz import unmapped


def u64(x):
    return struct.pack("<Q", x)


def u32(x):
    return struct.pack("<I", x)


def bstr(s):
    b = s.encode()
    return u64(len(b)) + b


def test_collation_manifest_bytes(tmp_path):
    # hand-encoded: 2 levels, 2 groups (one named, one anonymous)
    expected = b"".join(
        [
            u64(2),                      # levels: Vec<String> len
            bstr("sample"),
            bstr("barcode"),
            u64(2),                      # sample_groups: Vec<..> len
            # group 0
            u64(7),                      # key: u64
            b"\x01",                     # Option<String>: Some
            bstr("sampleA"),
            u64(0),                      # chunk_start
            u64(5),                      # num_chunks
            u64(123),                    # num_records
            # group 1
            u64(9),
            b"\x00",                     # Option<String>: None
            u64(5),
            u64(3),
            u64(77),
        ]
    )
    m = CollationManifest(["sample", "barcode"])
    m.add_sample_group(SampleGroup(7, "sampleA", 0, 5, 123))
    m.add_sample_group(SampleGroup(9, None, 5, 3, 77))
    p = tmp_path / "collation_manifest.bin"
    m.write_to_file(p)
    assert p.read_bytes() == expected

    # decode the hand bytes (not the writer output) with the reader
    p2 = tmp_path / "hand.bin"
    p2.write_bytes(expected)
    r = CollationManifest.read_from_file(p2)
    assert r.levels == ["sample", "barcode"]
    assert [(g.key, g.name, g.chunk_start, g.num_chunks, g.num_records)
            for g in r.sample_groups] == [
        (7, "sampleA", 0, 5, 123), (9, None, 5, 3, 77)]
    assert r.total_chunks() == 8 and r.total_records() == 200


def test_unmapped_single_bytes(tmp_path):
    # HashMap<u64, u32>: n, then (key u64, val u32) entries
    expected = b"".join(
        [u64(3), u64(5), u32(10), u64(17), u32(2), u64(900), u32(1)]
    )
    p = tmp_path / "unmapped_bc_count_collated.bin"
    # writer sorts by key; feed unsorted to prove canonicalization
    unmapped.write_collated_single(
        p, np.array([900, 5, 17], np.uint64), np.array([1, 10, 2], np.uint32)
    )
    assert p.read_bytes() == expected

    p2 = tmp_path / "hand.bin"
    p2.write_bytes(expected)
    bcs, cts, nf = unmapped.read_collated(p2)
    assert nf == 1
    assert bcs.tolist() == [5, 17, 900]
    assert cts.tolist() == [10, 2, 1]


def test_unmapped_multi_bytes(tmp_path):
    # HashMap<(u64, u64), u32>: n, then (sample u64, cell u64, val u32)
    expected = b"".join(
        [
            u64(2),
            u64(1), u64(40), u32(6),
            u64(2), u64(30), u32(9),
        ]
    )
    p = tmp_path / "unmapped_multi.bin"
    unmapped.write_collated_multi(
        p,
        np.array([2, 1], np.uint64),
        np.array([30, 40], np.uint64),
        np.array([9, 6], np.uint32),
    )
    assert p.read_bytes() == expected

    p2 = tmp_path / "hand.bin"
    p2.write_bytes(expected)
    cell, cts, nf = unmapped.read_collated(p2)
    assert nf == 2
    assert cell.tolist() == [40, 30]
    assert cts.tolist() == [6, 9]


def test_permit_freq_bytes(tmp_path):
    # version u64 (=1), bclen u64, HashMap<u64,u64>
    expected = b"".join(
        [u64(1), u64(16), u64(2), u64(3), u64(100), u64(8), u64(50)]
    )
    p = tmp_path / "permit_freq.bin"
    bincodeio.write_permit_freq(
        p, 16, np.array([8, 3], np.uint64), np.array([50, 100], np.uint64)
    )
    assert p.read_bytes() == expected

    p2 = tmp_path / "hand.bin"
    p2.write_bytes(expected)
    bclen, keys, vals = bincodeio.read_permit_freq(p2)
    assert bclen == 16
    assert keys.tolist() == [3, 8] and vals.tolist() == [100, 50]


def test_permit_map_bytes(tmp_path):
    # plain HashMap<u64,u64>
    expected = b"".join([u64(2), u64(4), u64(4), u64(6), u64(4)])
    p = tmp_path / "permit_map.bin"
    bincodeio.write_u64_map_file(
        p, np.array([6, 4], np.uint64), np.array([4, 4], np.uint64)
    )
    assert p.read_bytes() == expected
    keys, vals = bincodeio.read_u64_map_file(p)
    assert keys.tolist() == [4, 6] and vals.tolist() == [4, 4]


# --- env-gated hook for REAL reference-produced artifacts -------------------

REF_DIR = os.environ.get("AFT_TEST_REF_ARTIFACTS")


@pytest.mark.skipif(
    not REF_DIR, reason="set AFT_TEST_REF_ARTIFACTS=<dir with Rust sidecars>"
)
def test_reference_artifacts_decode():
    """Decode sidecars produced by the actual Rust tool (dropped into
    AFT_TEST_REF_ARTIFACTS) and sanity-check the parsed content; this is
    the interop verification that cannot run in a Rust-less image."""
    d = Path(REF_DIR)
    found = 0
    mp = d / "collation_manifest.bin"
    if mp.exists():
        m = CollationManifest.read_from_file(mp)
        assert m.levels and m.sample_groups
        assert m.total_chunks() > 0
        # chunk ranges must tile [chunk_start, +num_chunks) disjointly
        spans = sorted((g.chunk_start, g.num_chunks) for g in m.sample_groups)
        for (s0, n0), (s1, _n1) in zip(spans, spans[1:]):
            assert s0 + n0 <= s1
        found += 1
    up = d / "unmapped_bc_count_collated.bin"
    if up.exists():
        bcs, cts, nf = unmapped.read_collated(up)
        assert nf in (1, 2) and len(bcs) == len(cts)
        found += 1
    pf = d / "permit_freq.bin"
    if pf.exists():
        bclen, keys, vals = bincodeio.read_permit_freq(pf)
        assert 0 < bclen <= 32 and len(keys) == len(vals) > 0
        found += 1
    assert found, f"no known sidecar files found under {d}"
