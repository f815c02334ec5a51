"""Barcode kernel tests — expected values match the reference's unit
tests at src/utils.rs:1144-1249."""

import numpy as np

from alevin_fry_tpu.ops import barcodes as bc


def test_pack_unpack():
    assert bc.pack_seq("ACGT") == 0b00011011
    assert bc.unpack_seq(0b00011011, 4) == "ACGT"
    arr = bc.pack_seqs(["ACGT", "TTTT", "AANA"])
    np.testing.assert_array_equal(arr, [0b00011011, 0xFF, 0])
    assert bc.unpack_seqs_to_strings(arr, 4) == ["ACGT", "TTTT", "AAAA"]


def test_revcomp():
    a = bc.pack_seqs(["ACGT", "AACC"])
    rc = bc.revcomp_packed(a, 4)
    assert bc.unpack_seqs_to_strings(rc, 4) == ["ACGT", "GGTT"]


def test_hamming():
    a = bc.pack_seqs(["ACGT"])
    b = bc.pack_seqs(["ACGA"])
    c = bc.pack_seqs(["TCGA"])
    assert bc.hamming_2bit(a, a)[0] == 0
    assert bc.hamming_2bit(a, b)[0] == 1
    assert bc.hamming_2bit(a, c)[0] == 2


def test_get_all_snps():
    # reference: test_get_all_snps (src/utils.rs:1180-1185)
    out = sorted(set(int(x) for x in bc.get_all_snps(7, 3)))
    assert out == [3, 4, 5, 6, 11, 15, 23, 39, 55]


def test_get_all_indels():
    # reference: test_get_all_indels (src/utils.rs:1188-1194)
    out = sorted(set(int(x) for x in bc.get_all_indels(7, 3)))
    assert out == [1, 4, 5, 6, 9, 12, 13, 14, 15, 28, 29, 30, 31]


def test_one_edit_neighborhood():
    # reference: test_get_all_one_edit_neighbors (src/utils.rs:1197-1212)
    snps = set(int(x) for x in bc.get_all_snps(7, 3))
    indels = set(int(x) for x in bc.get_all_indels(7, 3))
    out = sorted(snps | indels)
    assert out == [1, 3, 4, 5, 6, 9, 11, 12, 13, 14, 15, 23, 28, 29, 30, 31, 39, 55]


def test_generate_permitlist_map():
    keys, vals = bc.generate_permitlist_map(np.asarray([7], np.uint64), 3)
    m = dict(zip(keys.tolist(), vals.tolist()))
    # every 1-edit neighbor maps back to 7, and 7 maps to itself
    assert m[7] == 7
    for n in [1, 3, 4, 5, 6, 9, 11, 12, 13, 14, 15, 23, 28, 29, 30, 31, 39, 55]:
        assert m[n] == 7
    assert len(m) == 19

    # priority: earlier barcode wins contested neighbors
    keys, vals = bc.generate_permitlist_map(np.asarray([7, 5], np.uint64), 3)
    m = dict(zip(keys.tolist(), vals.tolist()))
    assert m[7] == 7 and m[5] == 5  # exact entries always map to themselves
    # 4 is a SNP neighbor of both 7 (111->100? no: of 5 and 7); both
    # claim some shared neighbors; first in priority order (7) wins
    snps7 = set(int(x) for x in bc.get_all_snps(7, 3)) | {
        int(x) for x in bc.get_all_indels(7, 3)
    }
    snps5 = set(int(x) for x in bc.get_all_snps(5, 3)) | {
        int(x) for x in bc.get_all_indels(5, 3)
    }
    for shared in (snps7 & snps5) - {5, 7}:
        assert m[shared] == 7


def test_find_neighbors_batch():
    length = 8
    kept = np.sort(bc.pack_seqs(["AAAAAAAA", "CCCCCCCC", "GGGGGGGG"], length))
    queries = bc.pack_seqs(
        ["AAAAAAAT", "CCCCCCCC", "ACGTACGT", "ACCCCCCC"], length
    )
    counts, rep = bc.find_neighbors_batch(queries, kept, length)
    # one substitution from AAAAAAAA
    assert counts[0] == 1 and rep[0] == bc.pack_seq("AAAAAAAA")
    # exact match counts as a neighbor hit
    assert counts[1] == 1 and rep[1] == bc.pack_seq("CCCCCCCC")
    # far from everything
    assert counts[2] == 0
    # one sub from CCCCCCCC
    assert counts[3] == 1 and rep[3] == bc.pack_seq("CCCCCCCC")


def test_find_neighbors_ambiguous():
    length = 4
    kept = np.sort(bc.pack_seqs(["AAAA", "AAAC"], length))
    # AAAG is within 1 substitution of both
    counts, _ = bc.find_neighbors_batch(bc.pack_seqs(["AAAG"], length), kept, length)
    assert counts[0] == 2
