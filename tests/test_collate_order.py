"""Regression: collated cell chunk order must be descending read count
with correctly permuted barcodes — catches sorted-position vs
original-index permutation mixups (needs >= 3 cells so the permutation
is not an involution)."""

import numpy as np

from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.radz import read_prelude
from alevin_fry_tpu.radz.chunkio import decode_all_chunks
from alevin_fry_tpu.radz.records import RecordSchema
from synth import write_rna_rad


def test_collate_cell_order_many_cells(tmp_path):
    refs = ["t0"]
    # barcodes chosen so that sorting by value is a non-trivial,
    # non-involutive permutation of the count order
    cells = [
        ("GGGGGGGG", 7), ("AAAAAAAA", 5), ("TTTTTTTT", 4),
        ("CCCCCCCC", 3), ("AGAGAGAG", 2),
    ]
    reads = []
    for bc, n in cells:
        for i in range(n):
            reads.append((pack_seq(bc), 100 + 16 * i, [(0, True)]))
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, [reads], bc_len=8, umi_len=6)
    (tmp_path / "wl.txt").write_text("".join(bc + "\n" for bc, _ in cells))
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt", min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    with open(gpl / "map.collated.rad", "rb") as fh:
        prelude, _ftm, _ = read_prelude(fh)
        batch = decode_all_chunks(
            fh, RecordSchema.from_prelude(prelude), prelude.hdr.num_chunks
        )
    assert prelude.hdr.num_chunks == 5
    sizes = np.diff(batch.chunk_offsets)
    np.testing.assert_array_equal(sizes, [7, 5, 4, 3, 2])
    # each chunk's reads must carry that chunk's own barcode
    expect = [pack_seq(bc) for bc, _ in cells]
    for ci in range(5):
        s, e = batch.chunk_offsets[ci], batch.chunk_offsets[ci + 1]
        got = set(batch.barcode()[s:e].tolist())
        assert got == {expect[ci]}, f"chunk {ci}: {got} != {{{expect[ci]}}}"


def test_collate_device_shuffle_matches_host(tmp_path, monkeypatch):
    """AFT_COLLATE_BACKEND=jax routes the collation ordering through the
    mesh all-to-all shuffle (8-device virtual mesh here); the collated
    file must be byte-identical to the host counting sort."""
    rng = np.random.RandomState(9)
    refs = [f"t{i}" for i in range(4)]
    cells = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT", "ACACACAC"]
    reads = []
    for ci, bc in enumerate(cells):
        for i in range(20 + 11 * ci):
            reads.append((
                pack_seq(bc), int(rng.randint(1 << 10)) * 4,
                [(int(rng.randint(4)), True)],
            ))
    rng.shuffle(reads)
    chunks = [reads[i : i + 33] for i in range(0, len(reads), 33)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, chunks, bc_len=8, umi_len=6)
    (tmp_path / "wl.txt").write_text("".join(bc + "\n" for bc in cells))
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt", min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    monkeypatch.setenv("AFT_COLLATE_BACKEND", "host")
    collate(gpl, rad_dir, cmdline="t")
    host_bytes = (gpl / "map.collated.rad").read_bytes()

    monkeypatch.setenv("AFT_COLLATE_BACKEND", "jax")
    collate(gpl, rad_dir, cmdline="t")
    assert (gpl / "map.collated.rad").read_bytes() == host_bytes

    # the device order itself matches the stable host sort (direct
    # kernel check, including the columnar fallback path's usage)
    from alevin_fry_tpu.pipeline.collate import collation_order_device

    ranks = rng.randint(0, 7, size=1000).astype(np.int64)
    dev = collation_order_device(ranks, 7)
    assert dev is not None
    order, per_cell = dev
    np.testing.assert_array_equal(order, np.argsort(ranks, kind="stable"))
    np.testing.assert_array_equal(per_cell, np.bincount(ranks, minlength=7))
