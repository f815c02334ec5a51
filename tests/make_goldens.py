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


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        rad_dir = build_dataset(root)
        outputs = run_pipeline(root, rad_dir)
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
