"""Pipeline validation on the distribution-hardened generator
(tests/synth_hard.py, VERDICT r4 Next #2).

The uniform bench generator never exercised: 2-substitution barcodes
that the Hamming<=1 rescue must REJECT, a real knee between log-normal
cells and ambient droplets, recurring cross-gene ambiguity, the
>10-label discard rule, or Hamming-1 UMI satellites that PUG collapses
but cr-like double-counts.  These tests run the full pipeline on hard
data and pin each of those paths.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod,
    GenPermitListOpts,
    generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
from synth_hard import make_hard_dataset


@pytest.fixture(scope="module")
def hard(tmp_path_factory):
    d = tmp_path_factory.mktemp("hard")
    rng = np.random.RandomState(71)
    stats = make_hard_dataset(
        d, rng, n_cells=250, n_reads=120_000, n_genes=400,
    )
    return d, stats


def _run(d, out_tag, resolution="cr-like", usa=False, knee=False):
    gpl = d / f"gpl_{out_tag}"
    if not gpl.exists():
        fmeth = (
            CellFilterMethod("knee") if knee else
            CellFilterMethod("unfiltered", path=d / "permit.txt",
                             min_reads=10)
        )
        generate_permit_list(GenPermitListOpts(
            input_dir=d / "rad", output_dir=gpl, fmeth=fmeth,
            expected_ori="fw", cmdline="hard-test",
        ))
        collate(gpl, d / "rad", cmdline="hard-test")
    qdir = d / f"quant_{out_tag}_{resolution}"
    quantify(QuantOpts(
        input_dir=gpl, output_dir=qdir,
        tg_map=d / ("t2g_3col.tsv" if usa else "t2g.tsv"),
        resolution=resolution, cmdline="hard-test",
    ))
    return gpl, qdir


def test_hard_generator_path_coverage(hard):
    """The generator's own stats must cover the paths the uniform
    generator missed — this is the contract the bench relies on."""
    _d, stats = hard
    assert stats["reads_with_2_bc_errors"] > 50        # rescue rejects
    assert stats["reads_with_1_bc_error"] > 1000       # rescue accepts
    assert stats["reads_with_umi_error"] > 1000        # PUG satellites
    assert stats["wrong_orientation_reads"] > 500      # strand filter
    assert stats["ambiguity_class_counts"]["wide_discard_12label"] > 50
    assert stats["ambiguity_class_counts"]["cross_gene_pair"] > 1000


def test_hard_pipeline_host_device_usa_parity(hard, monkeypatch):
    """USA-mode quant through the host resolver and the device WTA
    kernel must agree byte-for-byte on hard data (the north-star
    output contract at realistic distributions)."""
    d, _stats = hard
    monkeypatch.setenv("AFT_CRLIKE_BACKEND", "host")
    _gpl, q_host = _run(d, "p", usa=True)
    monkeypatch.setenv("AFT_CRLIKE_BACKEND", "jax")
    monkeypatch.setenv("AFT_WTA_COMPACT", "1")
    qdir2 = d / "quant_dev"
    quantify(QuantOpts(
        input_dir=d / "gpl_p", output_dir=qdir2,
        tg_map=d / "t2g_3col.tsv", resolution="cr-like",
        cmdline="hard-test",
    ))
    a = (q_host / "alevin" / "quants_mat.mtx").read_bytes()
    b = (qdir2 / "alevin" / "quants_mat.mtx").read_bytes()
    assert a == b
    # and through the fused two-sort tail
    monkeypatch.setenv("AFT_WTA_COMPACT", "fuse")
    qdir3 = d / "quant_dev_fuse"
    quantify(QuantOpts(
        input_dir=d / "gpl_p", output_dir=qdir3,
        tg_map=d / "t2g_3col.tsv", resolution="cr-like",
        cmdline="hard-test",
    ))
    c = (qdir3 / "alevin" / "quants_mat.mtx").read_bytes()
    assert a == c


def test_hard_knee_finds_the_cell_population(hard):
    """Knee-mode filtering on the bimodal (log-normal cells + ambient)
    frequency curve must land near the real cell count — the knee the
    Zipf generator never had (knee_finding.rs:99)."""
    d, stats = hard
    gpl, _q = _run(d, "knee", knee=True)
    meta = json.loads(
        (gpl / "generate_permit_list.json").read_text()
    )
    # permit_freq.bin holds the selected cells; count rows via the
    # sidecar (u64 bc + u64 count after the 2-u64 header)
    import struct

    raw = (gpl / "permit_freq.bin").read_bytes()
    # layout: u64 version, u64 bclen, u64 n, then n * (u64, u64)
    n_sel = struct.unpack("<Q", raw[16:24])[0]
    n_real = stats["n_real_cells"]
    assert 0.4 * n_real <= n_sel <= 3.0 * n_real, (n_sel, n_real)
    assert meta["permit-list-type"] == "filtered"


def test_hard_parsimony_collapses_umi_satellites(hard):
    """Hamming-1 UMI satellites: parsimony (PUG) collapses a parent
    UMI and its 1-sub error reads into one molecule; cr-like counts
    the satellite as a separate molecule.  On hard data (5% UMI error
    rate) the two resolutions must therefore disagree, with parsimony
    strictly smaller — the uniform generator's independent UMIs never
    made them differ this way."""
    from alevin_fry_tpu.radz.mtx import read_matrix_market

    d, stats = hard
    _gpl, q_cr = _run(d, "p", resolution="cr-like")
    _gpl, q_pg = _run(d, "p", resolution="parsimony")
    _r, _c, v_cr, _shape = read_matrix_market(
        q_cr / "alevin" / "quants_mat.mtx"
    )
    _r, _c, v_pg, _shape = read_matrix_market(
        q_pg / "alevin" / "quants_mat.mtx"
    )
    tot_cr = float(v_cr.sum())
    tot_pg = float(v_pg.sum())
    assert tot_pg < tot_cr, (tot_pg, tot_cr)
    # the collapse magnitude should be comparable to the satellite
    # rate: >1% of molecules, not a rounding artifact
    assert (tot_cr - tot_pg) / tot_cr > 0.01


def test_hard_rescue_accepts_and_rejects(hard):
    """The unfiltered-pl 1-edit rescue must both rescue (1-sub reads)
    and reject (2-sub reads do not map to a unique permit barcode).
    num_corrected > 0 proves rescues; matched+rescued < total proves
    rejects leave mass behind."""
    d, stats = hard
    gpl, qdir = _run(d, "p")
    q = json.loads((qdir / "quant.json").read_text())
    n_quant = q["num_quantified_cells"]
    # rescued barcodes exist (1-sub errors dominate)
    assert n_quant > 0
    dump = (qdir / "featureDump.txt").read_text().splitlines()
    # CorrectedReads summed over cells < total generated reads:
    # 2-sub errors, wrong-orientation reads and the sub-min_reads
    # ambient tail all drop
    corrected = sum(
        float(line.split("\t")[1]) for line in dump[1:]
    )
    assert corrected < stats["n_reads"]
    assert corrected > 0.5 * stats["n_reads"]


def test_hard_atac_chain_and_counters(tmp_path, monkeypatch):
    """Hardened ATAC data must light up every dedup counter (PCR
    duplicates, >2kb fragments, non-proper pairs, multimapping — all
    structurally absent from the uniform bench generator) and the
    device sort backend must produce a byte-identical BED."""
    import json

    from synth_hard import make_hard_atac_dataset

    from alevin_fry_tpu.atac.collate import collate as atac_collate
    from alevin_fry_tpu.atac.dedup import deduplicate
    from alevin_fry_tpu.atac.gpl import AtacGplOpts
    from alevin_fry_tpu.atac.gpl import generate_permit_list as atac_gpl
    from alevin_fry_tpu.atac.sort import sort as atac_sort

    d = tmp_path
    stats = make_hard_atac_dataset(
        d, np.random.RandomState(7), n_cells=300, n_frags=60_000,
        n_chrs=4, chr_len=5_000_000,
    )
    assert stats["pcr_duplicate_fragments"] > 5000
    assert stats["frag_len_over_2000"] > 100
    assert stats["non_proper_pairs"] > 500
    assert stats["multimapped"] > 300

    monkeypatch.setenv("AFT_ATAC_SORT_BACKEND", "host")
    gpl = d / "gpl"
    atac_gpl(AtacGplOpts(
        input_dir=d / "rad", output_dir=gpl,
        unfiltered_pl=d / "wl.txt", min_reads=1, rc=True,
        cmdline="hard-atac",
    ))
    atac_collate(gpl, d / "rad", cmdline="hard-atac")
    atac_sort(gpl, d / "rad", cmdline="hard-atac")
    host_sort_bed = (gpl / "map.bed").read_bytes()
    import shutil

    shutil.copy(gpl / "map.bed", gpl / "map.sorted.bed")
    deduplicate(gpl, cmdline="hard-atac")
    host_bed = (gpl / "map.bed").read_bytes()
    assert len(host_bed) > 0

    # device (jax-on-CPU) segmented sort backend: byte-identical BED
    monkeypatch.setenv("AFT_ATAC_SORT_BACKEND", "jax")
    atac_sort(gpl, d / "rad", cmdline="hard-atac")
    assert (gpl / "map.bed").read_bytes() == host_sort_bed
    deduplicate(gpl, cmdline="hard-atac")
    assert (gpl / "map.bed").read_bytes() == host_bed


def test_hard_flex_chain(tmp_path, monkeypatch):
    """Hardened Flex (multi-barcode) chain: rotation sample barcodes
    with per-cycle errors must flow through the tiered sample
    correction (exact + 1-edit, cellfilter.rs:1202/1486-1535), shared
    cell barcodes must stay sample-separated through the composite
    key, and the device WTA must match the host byte-for-byte."""
    import json

    from synth_hard import make_hard_flex_dataset

    d = tmp_path
    stats = make_hard_flex_dataset(d, np.random.RandomState(13))
    assert stats["sample_bc_1sub"] > 2000   # 1-edit tier exercised
    assert stats["sample_bc_2sub"] > 30     # drop tier exercised

    monkeypatch.setenv("AFT_CRLIKE_BACKEND", "host")
    gpl = d / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=d / "rad", output_dir=gpl,
        fmeth=CellFilterMethod("knee"),
        expected_ori="both", cmdline="hard-flex",
        sample_bc_list=d / "samples.tsv",
    ))
    info = json.loads((gpl / "sample_info.json").read_text())
    assert info["num_samples"] == stats["n_samples"]
    # most reads correct to a sample (rotations + 1-sub recovered);
    # 2-sub and unlucky 1-subs drop
    assert info["matched_reads"] > 0.9 * stats["n_reads"]
    assert info["unmatched_reads"] > stats["sample_bc_2sub"] * 0.5

    collate(gpl, d / "rad", cmdline="hard-flex")
    quantify(QuantOpts(
        input_dir=gpl, output_dir=d / "q_host", tg_map=d / "t2g.tsv",
        resolution="cr-like", cmdline="hard-flex",
    ))
    rows = (d / "q_host" / "alevin" / "quants_mat_rows.txt").read_text()
    prefixes = {ln.split("_")[0] for ln in rows.splitlines() if ln}
    assert len(prefixes) == stats["n_samples"], prefixes
    # sparse well names survive into the row labels
    assert prefixes == {f"well{w}" for w in stats["wells"]}

    monkeypatch.setenv("AFT_CRLIKE_BACKEND", "jax")
    quantify(QuantOpts(
        input_dir=gpl, output_dir=d / "q_dev", tg_map=d / "t2g.tsv",
        resolution="cr-like", cmdline="hard-flex",
    ))
    assert (
        (d / "q_dev" / "alevin" / "quants_mat.mtx").read_bytes()
        == (d / "q_host" / "alevin" / "quants_mat.mtx").read_bytes()
    )
