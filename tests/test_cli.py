"""Drive the full pipeline through the CLI entry point (the reference's
CI smoke path: generate-permit-list -u ... -d fw -> collate -> quant
cr-like, rust.yml:51-81)."""

import numpy as np

from alevin_fry_tpu.cli import main
from alevin_fry_tpu.radz.mtx import read_matrix_market
from test_pipeline_rna import make_dataset


def test_cli_end_to_end(tmp_path):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    quant = tmp_path / "quant"

    assert main([
        "generate-permit-list", "-i", str(rad_dir), "-d", "fw",
        "-o", str(gpl), "-u", str(wl), "-m", "2",
    ]) == 0
    assert main([
        "collate", "-i", str(gpl), "-r", str(rad_dir), "-t", "2",
    ]) == 0
    assert main([
        "quant", "-i", str(gpl), "-m", str(t2g), "-o", str(quant),
        "-r", "cr-like", "--use-mtx", "-t", "2",
    ]) == 0

    r, c, v, shape = read_matrix_market(quant / "alevin" / "quants_mat.mtx")
    mat = np.zeros(shape)
    mat[r, c] = v
    np.testing.assert_array_equal(mat, [[1, 1, 1], [0, 1, 1]])


def test_cli_incompatible_flags(tmp_path, capsys):
    rad_dir, wl, t2g = make_dataset(tmp_path)
    gpl = tmp_path / "gpl"
    main(["generate-permit-list", "-i", str(rad_dir), "-d", "fw",
          "-o", str(gpl), "-u", str(wl)])
    main(["collate", "-i", str(gpl), "-r", str(rad_dir)])
    # cr-like with umi-edit-dist 1 is rejected (main.rs:500-520)
    rc = main([
        "quant", "-i", str(gpl), "-m", str(t2g), "-o", str(tmp_path / "q"),
        "-r", "cr-like", "--umi-edit-dist", "1",
    ])
    assert rc == 1
    # bootstraps require an -em resolution (main.rs:541-556)
    rc = main([
        "quant", "-i", str(gpl), "-m", str(t2g), "-o", str(tmp_path / "q"),
        "-r", "cr-like", "-b", "5",
    ])
    assert rc == 1
