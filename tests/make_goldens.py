"""Regenerate the committed golden fixtures under tests/goldens/.

The environment cannot build the Rust reference binary (BASELINE.md),
so golden-output parity is anchored two ways instead:

* every behavioral rule is unit-tested against hand-computed
  expectations derived from the reference source (the main suite);
* these goldens pin the COMPLETE artifact bytes of one deterministic
  dataset across every resolution strategy + the view dump, so any
  future refactor that changes output bytes fails loudly and must
  justify itself.

Run ``python tests/make_goldens.py`` from the repo root to regenerate
(after an intentional behavior change), then review the diff.
"""

import gzip
import os
import shutil
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

# goldens must be platform-independent: pin the host backends
os.environ.setdefault("AFT_CRLIKE_BACKEND", "host")
os.environ.setdefault("AFT_RESCUE_BACKEND", "host")
os.environ.setdefault("AFT_PUG_CC_BACKEND", "host")
os.environ.setdefault("AFT_COLLATE_BACKEND", "host")
os.environ.setdefault("AFT_EM_MESH", "0")
os.environ.setdefault("AFT_EM_BACKEND", "host")
os.environ.setdefault("AFT_GPL_MESH", "0")
os.environ.setdefault("AFT_PROGRESS", "0")

GOLDEN = HERE / "goldens"

RESOLUTIONS = (
    "cr-like", "cr-like-em", "trivial", "parsimony", "parsimony-em",
    "parsimony-gene", "parsimony-gene-em",
)


def build_dataset(root: Path):
    from synth import write_rna_rad
    from alevin_fry_tpu.ops.barcodes import pack_seq

    rng = np.random.RandomState(1234)
    bcs = ["AAAACCCC", "CCCCGGGG", "GGGGTTTT", "TTTTAAAA"]
    refs = [f"t{i}" for i in range(12)]
    reads = []
    for bc in bcs:
        for _ in range(160):
            tids = sorted(set(rng.randint(0, 12, rng.randint(1, 4)).tolist()))
            reads.append((pack_seq(bc), int(rng.randint(1 << 12)),
                          [(int(t), bool(rng.rand() < 0.9)) for t in tids]))
    # a 1-edit noisy barcode for the rescue path
    reads.append((pack_seq("AAAACCCG"), 7, [(0, True)]))
    rad_dir = root / "rad"
    rad_dir.mkdir(parents=True)
    chunks = [reads[i : i + 200] for i in range(0, len(reads), 200)]
    write_rna_rad(rad_dir / "map.rad", refs, chunks, bc_len=8, umi_len=10)
    (root / "wl.txt").write_text("".join(b + "\n" for b in bcs))
    # 3-column t2g -> USA mode for cr-like; also a 2-column variant
    (root / "t2g_usa.tsv").write_text(
        "".join(
            f"t{i}\tg{i // 3}\t{'S' if i % 3 else 'U'}\n" for i in range(12)
        )
    )
    (root / "t2g.tsv").write_text(
        "".join(f"t{i}\tg{i // 3}\n" for i in range(12))
    )
    return rad_dir


def run_pipeline(root: Path, rad_dir: Path):
    from alevin_fry_tpu.pipeline.collate import collate
    from alevin_fry_tpu.pipeline.gpl import (
        CellFilterMethod, GenPermitListOpts, generate_permit_list,
    )
    from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify
    from alevin_fry_tpu.pipeline.view import view

    gpl = root / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=root / "wl.txt",
                               min_reads=1),
        expected_ori="fw", cmdline="goldens",
    ))
    collate(gpl, rad_dir, cmdline="goldens")

    outputs = {}
    # view dump of the raw RAD (byte-parity anchor for the codec)
    import io

    vout = io.StringIO()
    view(rad_dir / "map.rad", print_header=True, out=vout)
    outputs["view.txt"] = vout.getvalue().encode()
    for art in ("permit_freq.bin", "permit_map.bin", "map.collated.rad",
                "unmapped_bc_count_collated.bin"):
        outputs[art] = (gpl / art).read_bytes()

    for res in RESOLUTIONS:
        qdir = root / f"q_{res}"
        quantify(QuantOpts(
            input_dir=gpl, tg_map=root / "t2g.tsv", output_dir=qdir,
            resolution=res, cmdline="goldens",
        ))
        outputs[f"{res}.mtx"] = (
            qdir / "alevin" / "quants_mat.mtx"
        ).read_bytes()
    # USA-mode cr-like (the bit-identity north-star config)
    qdir = root / "q_usa"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=root / "t2g_usa.tsv", output_dir=qdir,
        resolution="cr-like", cmdline="goldens",
    ))
    outputs["cr-like-usa.mtx"] = (qdir / "alevin" / "quants_mat.mtx").read_bytes()
    outputs["cr-like-usa.rows.txt"] = (
        qdir / "alevin" / "quants_mat_rows.txt"
    ).read_bytes()
    outputs["cr-like-usa.cols.txt"] = (
        qdir / "alevin" / "quants_mat_cols.txt"
    ).read_bytes()
    # dump-eq artifacts
    qdir = root / "q_dump"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=root / "t2g.tsv", output_dir=qdir,
        resolution="cr-like-em", dump_eq=True, cmdline="goldens",
    ))
    outputs["geqc_counts.mtx"] = (qdir / "alevin" / "geqc_counts.mtx").read_bytes()
    outputs["gene_eqclass.txt"] = gzip.open(
        qdir / "alevin" / "gene_eqclass.txt.gz", "rb"
    ).read()
    return outputs


def run_atac(root: Path):
    """ATAC goldens: gpl bin histogram sidecars, the coordinate-sorted
    BED, and the collate->dedup BED."""
    from synth import write_atac_rad
    from alevin_fry_tpu.ops.barcodes import pack_seq, revcomp_packed, unpack_seq
    from alevin_fry_tpu.cli import main as cli_main

    rng = np.random.RandomState(77)
    refs = ["chr1", "chr2"]
    ref_lens = [400_000, 250_000]
    bcs = ["AAAACCCC", "GGGGTTTT", "ACGTACGT"]
    reads = []
    for _ in range(600):
        bc = bcs[rng.randint(3)]
        ref = int(rng.randint(2))
        pos = int(rng.randint(ref_lens[ref] - 3000))
        flen = int(rng.randint(30, 2400))
        mt = 4 if rng.rand() < 0.9 else 2  # some non-proper pairs
        if rng.rand() < 0.05:
            alns = [(ref, mt, pos, flen), ((ref + 1) % 2, mt, pos + 3, flen)]
        else:
            alns = [(ref, mt, pos, flen)]
        reads.append((pack_seq(bc), alns))
    for i in rng.choice(600, 60, replace=False):  # duplicates
        reads.append(reads[int(i)])
    rad_dir = root / "arad"
    rad_dir.mkdir()
    chunks = [reads[i : i + 120] for i in range(0, len(reads), 120)]
    write_atac_rad(rad_dir / "map.rad", refs, ref_lens, chunks, bc_len=8)
    wl = root / "awl.txt"
    wl.write_text("".join(
        unpack_seq(int(revcomp_packed(
            np.asarray([pack_seq(b)], np.uint64), 8)[0]), 8) + "\n"
        for b in bcs
    ))

    gpl = root / "agpl"
    assert cli_main([
        "atac", "generate-permit-list", "-i", str(rad_dir), "-o", str(gpl),
        "-u", str(wl), "-m", "1", "-d", "rc",
    ]) == 0
    outputs = {}
    for art in ("bin_recs.bin", "bin_lens.bin", "permit_freq.bin"):
        outputs[f"atac.{art}"] = (gpl / art).read_bytes()
    assert cli_main(["atac", "sort", "-i", str(gpl), "-r", str(rad_dir),
                     "-t", "2"]) == 0
    outputs["atac.sorted.bed"] = (gpl / "map.bed").read_bytes()
    assert cli_main(["atac", "collate", "-i", str(gpl), "-r", str(rad_dir),
                     "-t", "2"]) == 0
    assert cli_main(["atac", "deduplicate", "-i", str(gpl), "-d", "rc"]) == 0
    outputs["atac.dedup.bed"] = (gpl / "map.bed").read_bytes()
    return outputs


def run_multibc(root: Path):
    """Multi-barcode (10x Flex) goldens: gpl_multi -> collate_multi ->
    quant with sample-prefixed rows and the collation manifest."""
    from synth import make_packed_bc, write_multi_bc_rad
    from alevin_fry_tpu.ops.barcodes import unpack_seq
    from alevin_fry_tpu.pipeline.collate import collate
    from alevin_fry_tpu.pipeline.gpl import (
        CellFilterMethod, GenPermitListOpts, generate_permit_list,
    )
    from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify

    refs = [f"gene_{i}" for i in range(8)]
    sample_bcs = [make_packed_bc(100, 8), make_packed_bc(200, 8)]
    rad_dir = root / "mrad"
    rad_dir.mkdir()
    write_multi_bc_rad(
        rad_dir / "map.rad", refs, 2, 4, 8, sample_bcs,
        share_cell_barcodes=True, sample_bc_len=8,
    )
    slist = root / "samples.tsv"
    slist.write_text(
        f"{unpack_seq(sample_bcs[0], 8)}\twellA\n"
        f"{unpack_seq(sample_bcs[1], 8)}\twellB\n"
    )
    t2g = root / "mt2g.tsv"
    t2g.write_text("".join(f"gene_{i}\tg{i // 2}\n" for i in range(8)))

    gpl = root / "mgpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("force", count=4),
        expected_ori="both", cmdline="goldens", sample_bc_list=slist,
    ))
    collate(gpl, rad_dir, num_threads=2, cmdline="goldens")
    qdir = root / "mq"
    quantify(QuantOpts(
        input_dir=gpl, tg_map=t2g, output_dir=qdir,
        resolution="cr-like", cmdline="goldens",
    ))
    return {
        "multibc.collation_manifest.bin":
            (gpl / "collation_manifest.bin").read_bytes(),
        "multibc.quants_mat.mtx":
            (qdir / "alevin" / "quants_mat.mtx").read_bytes(),
        "multibc.rows.txt":
            (qdir / "alevin" / "quants_mat_rows.txt").read_bytes(),
    }


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        rad_dir = build_dataset(root)
        outputs = run_pipeline(root, rad_dir)
        outputs.update(run_atac(root))
        outputs.update(run_multibc(root))
        # also keep the input RAD itself (the codec contract)
        outputs["map.rad"] = (rad_dir / "map.rad").read_bytes()
    if GOLDEN.exists():
        shutil.rmtree(GOLDEN)
    GOLDEN.mkdir()
    for name, data in outputs.items():
        (GOLDEN / name).write_bytes(data)
        print(f"wrote goldens/{name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
