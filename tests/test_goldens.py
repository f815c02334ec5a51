"""Golden-fixture regression tests: the committed artifact bytes under
tests/goldens/ (one deterministic dataset, every resolution strategy,
the view dump, and the collated RAD) must be reproduced exactly.

These pin the full output contract across refactors; regenerate with
``python tests/make_goldens.py`` only after an intentional behavior
change, and justify the diff in the commit."""

from pathlib import Path

import pytest

GOLDEN = Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def produced(tmp_path_factory, monkeypatch_module=None):
    import make_goldens as mg

    root = tmp_path_factory.mktemp("goldens")
    rad_dir = mg.build_dataset(root)
    outputs = mg.run_pipeline(root, rad_dir)
    outputs.update(mg.run_atac(root))
    outputs.update(mg.run_multibc(root))
    outputs["map.rad"] = (rad_dir / "map.rad").read_bytes()
    return outputs


def test_goldens_exist():
    assert (GOLDEN / "cr-like.mtx").exists(), "run tests/make_goldens.py"


@pytest.mark.parametrize(
    "name",
    sorted(p.name for p in GOLDEN.iterdir()) if GOLDEN.exists() else [],
)
def test_golden_bytes(name, produced):
    assert name in produced, f"pipeline no longer produces {name}"
    got = produced[name]
    want = (GOLDEN / name).read_bytes()
    assert got == want, (
        f"{name} diverged from the committed golden "
        f"({len(got)} vs {len(want)} bytes)"
    )
