"""The comparison harness reports zero diff for identical quant runs
and catches differences."""

import json
import subprocess
import sys

from test_pipeline_rna import make_dataset
from alevin_fry_tpu.pipeline.collate import collate
from alevin_fry_tpu.pipeline.gpl import (
    CellFilterMethod, GenPermitListOpts, generate_permit_list,
)
from alevin_fry_tpu.pipeline.quant import QuantOpts, quantify


def test_compare_counts_self_zero(tmp_path):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    for q in ("q1", "q2"):
        quantify(QuantOpts(
            input_dir=gpl, tg_map=t2g, output_dir=tmp_path / q,
            resolution="cr-like", cmdline="t",
        ))
    out = tmp_path / "cmp.json"
    rc = subprocess.run(
        [sys.executable, "scripts/compare_counts.py",
         str(tmp_path / "q1"), str(tmp_path / "q2"), str(out)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    d = json.loads(out.read_text())
    assert d["diff_X"] == 0.0
    assert d["obs_ref-obs_test"] == [] and d["obs_test-obs_ref"] == []


def test_compare_counts_usa(tmp_path):
    rad_dir, wl, _t2g = make_dataset(tmp_path)
    t2g3 = tmp_path / "t2g3.tsv"
    with open(t2g3, "w") as fh:
        for i in range(6):
            status = "S" if i % 2 == 0 else "U"
            fh.write(f"tx_{i}\tg_{i // 2}\t{status}\n")
    gpl = tmp_path / "gpl"
    generate_permit_list(GenPermitListOpts(
        input_dir=rad_dir, output_dir=gpl,
        fmeth=CellFilterMethod("unfiltered", path=wl, min_reads=2),
        expected_ori="fw", cmdline="t",
    ))
    collate(gpl, rad_dir, cmdline="t")
    for q in ("q1", "q2"):
        quantify(QuantOpts(
            input_dir=gpl, tg_map=t2g3, output_dir=tmp_path / q,
            resolution="cr-like", cmdline="t",
        ))
    out = tmp_path / "cmp.json"
    rc = subprocess.run(
        [sys.executable, "scripts/compare_counts.py",
         str(tmp_path / "q1"), str(tmp_path / "q2"), str(out)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    d = json.loads(out.read_text())
    assert d["diff_S"] == 0.0 and d["diff_U"] == 0.0 and d["diff_A"] == 0.0
