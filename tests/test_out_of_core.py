"""Out-of-core collation must produce byte-identical results to the
in-memory path (forced by a tiny --max-records)."""

import numpy as np

from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from alevin_fry_tpu.ops.barcodes import pack_seq
from alevin_fry_tpu.radz.mtx import read_matrix_market
from synth import write_rna_rad


def _build(tmp_path):
    rng = np.random.RandomState(5)
    refs = [f"t{i}" for i in range(8)]
    bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT", "ACGTACGT"]
    reads = []
    for ci, bc in enumerate(bcs):
        for i in range(30 + 10 * ci):
            na = 1 + int(rng.rand() < 0.3)
            alns = [(int(rng.randint(8)), True) for _ in range(na)]
            reads.append((pack_seq(bc), int(rng.randint(1 << 12)) * 4, alns))
    rng.shuffle(reads)
    chunks = [reads[i : i + 17] for i in range(0, len(reads), 17)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, chunks, bc_len=8, umi_len=6)
    (tmp_path / "wl.txt").write_text("".join(b + "\n" for b in bcs))
    (tmp_path / "t2g.tsv").write_text(
        "".join(f"t{i}\tg{i // 2}\n" for i in range(8))
    )
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    return rad_dir, gpl


def test_out_of_core_matches_in_memory(tmp_path):
    rad_dir, gpl = _build(tmp_path)
    collate(gpl, rad_dir, cmdline="t")  # in-memory (default max_records)
    in_mem = (gpl / "map.collated.rad").read_bytes()

    collate(gpl, rad_dir, max_records=40, cmdline="t")  # forced spill
    spilled = (gpl / "map.collated.rad").read_bytes()
    assert spilled == in_mem
    assert not (gpl / "_collate_tmp").exists()

    quantify(QuantOpts(
        input_dir=gpl, tg_map=tmp_path / "t2g.tsv",
        output_dir=tmp_path / "q", resolution="cr-like", cmdline="t",
    ))
    r, c, v, shape = read_matrix_market(tmp_path / "q" / "alevin" / "quants_mat.mtx")
    assert shape[0] == 5
    assert v.sum() > 0


def test_atac_out_of_core_matches_in_memory(tmp_path):
    """ATAC collation honors --max-records via the shared spill-bucket
    path and produces byte-identical output to the in-memory path."""
    from alevin_fry_tpu.cli import main
    from synth import write_atac_rad
    from alevin_fry_tpu.ops.barcodes import revcomp_packed, unpack_seq

    rng = np.random.RandomState(9)
    refs = ["chr1", "chr2"]
    ref_lens = [250_000, 150_000]
    bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG"]
    reads = []
    for ci, bc in enumerate(bcs):
        for _ in range(20 + 7 * ci):
            reads.append((
                pack_seq(bc),
                [(int(rng.randint(2)), 4, int(rng.randint(200_000)), 100)],
            ))
    rng.shuffle(reads)
    chunks = [reads[i : i + 11] for i in range(0, len(reads), 11)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=8)
    wl = tmp_path / "wl.txt"
    wl.write_text("".join(
        unpack_seq(int(revcomp_packed(
            np.asarray([pack_seq(b)], np.uint64), 8)[0]), 8) + "\n"
        for b in bcs
    ))
    gpl = tmp_path / "gpl"
    assert main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "rc",
    ]) == 0

    assert main([
        "atac", "collate", "-i", str(gpl), "-r", str(rad_dir), "-t", "2",
    ]) == 0
    in_mem = (gpl / "map.collated.rad").read_bytes()

    assert main([
        "atac", "collate", "-i", str(gpl), "-r", str(rad_dir), "-t", "2",
        "--max-records", "13",
    ]) == 0
    spilled = (gpl / "map.collated.rad").read_bytes()
    assert spilled == in_mem
    assert not (gpl / "_collate_tmp").exists()

    # the spilled collated file drives dedup identically
    assert main(["atac", "deduplicate", "-i", str(gpl), "-d", "rc"]) == 0
    assert (gpl / "map.bed").exists()


def test_quant_streamed_blocks_match_single_block(tmp_path, monkeypatch):
    """Quant streams whole-cell blocks; a tiny block bound must produce
    identical outputs (matrix, rows, featureDump, geqc dump) to the
    default single-block run."""
    # cells must exceed SMALL_CELL_FAST_THRESHOLD (100 reads) so the
    # EM / dump-eq / bootstrap branches are actually exercised
    rng = np.random.RandomState(11)
    refs = [f"t{i}" for i in range(8)]
    bcs = ["AAAAAAAA", "CCCCCCCC", "GGGGGGGG", "TTTTTTTT"]
    reads = []
    for ci, bc in enumerate(bcs):
        for _ in range(120 + 15 * ci):
            na = 1 + int(rng.rand() < 0.4)
            alns = [(int(rng.randint(8)), True) for _ in range(na)]
            reads.append((pack_seq(bc), int(rng.randint(1 << 10)) * 4, alns))
    rng.shuffle(reads)
    chunks = [reads[i : i + 37] for i in range(0, len(reads), 37)]
    rad_dir = tmp_path / "rad"
    rad_dir.mkdir()
    write_rna_rad(rad_dir / "map.rad", refs, chunks, bc_len=8, umi_len=6)
    (tmp_path / "wl.txt").write_text("".join(b + "\n" for b in bcs))
    (tmp_path / "t2g.tsv").write_text(
        "".join(f"t{i}\tg{i // 2}\n" for i in range(8))
    )
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=tmp_path / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")

    def run(out, res, **kw):
        quantify(QuantOpts(
            input_dir=gpl, tg_map=tmp_path / "t2g.tsv",
            output_dir=out, resolution=res, cmdline="t", **kw,
        ))

    for res, kw in [
        ("cr-like", {}),
        ("cr-like-em", {"dump_eq": True}),
        ("parsimony", {}),
        ("cr-like-em", {"num_bootstraps": 3, "summary_stat": True}),
    ]:
        tag = res + ("_d" if kw.get("dump_eq") else "") + (
            "_b" if kw.get("num_bootstraps") else "")
        run(tmp_path / f"one_{tag}", res, **kw)
        monkeypatch.setenv("AFT_QUANT_BLOCK_RECORDS", "130")
        run(tmp_path / f"blk_{tag}", res, **kw)
        monkeypatch.delenv("AFT_QUANT_BLOCK_RECORDS")
        # spilled-COO run: a tiny AFT_QUANT_SPILL_NNZ forces the MTX
        # body to stream to disk mid-run (bounded output memory)
        monkeypatch.setenv("AFT_QUANT_BLOCK_RECORDS", "130")
        monkeypatch.setenv("AFT_QUANT_SPILL_NNZ", "5")
        run(tmp_path / f"sp_{tag}", res, **kw)
        monkeypatch.delenv("AFT_QUANT_BLOCK_RECORDS")
        monkeypatch.delenv("AFT_QUANT_SPILL_NNZ")
        assert not (
            tmp_path / f"sp_{tag}" / "alevin" / "quants_mat.mtx.body.tmp"
        ).exists()
        for f in [
            "alevin/quants_mat.mtx", "alevin/quants_mat_rows.txt",
            "featureDump.txt", "alevin/geqc_counts.mtx",
            "alevin/gene_eqclass.txt.gz", "alevin/bootstraps_mean.mtx",
            "alevin/bootstraps_var.mtx",
        ]:
            a = tmp_path / f"one_{tag}" / f
            b = tmp_path / f"blk_{tag}" / f
            c = tmp_path / f"sp_{tag}" / f
            assert a.exists() == b.exists() == c.exists(), f
            if a.exists():
                assert a.read_bytes() == b.read_bytes(), (tag, f)
                assert a.read_bytes() == c.read_bytes(), (tag, f, "spill")
