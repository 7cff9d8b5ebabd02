"""Stamp the AUTHORITATIVE golden-corpus count into README.md.

The count comes from the same loader the test suite runs
(`hopspark.golden.parse_test_file`), so the number in the docs can never
drift from what the suite executes (round-9 verdict nit: README said 1071
while the loader counted 1047 — hand-maintained in three places).

Usage: PYTHONPATH=. python tools/gen_golden_count.py
"""

from __future__ import annotations

import glob
import pathlib
import re

from hopspark.golden import parse_test_file

BEGIN = "<!-- golden-count:begin -->"
END = "<!-- golden-count:end -->"


def counts() -> tuple[int, int]:
    files = sorted(glob.glob(str(
        pathlib.Path(__file__).resolve().parent.parent
        / "tests" / "golden" / "*.test"
    )))
    return len(files), sum(len(parse_test_file(f)) for f in files)


def main() -> None:
    n_files, n_cases = counts()
    line = (
        f"{BEGIN}Golden corpus: **{n_cases} cases across {n_files} files** "
        f"(loader-counted; regenerate with "
        f"`PYTHONPATH=. python tools/gen_golden_count.py`).{END}"
    )
    readme = pathlib.Path(__file__).resolve().parent.parent / "README.md"
    text = readme.read_text()
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            line, text, flags=re.S,
        )
    else:
        anchor = "and `FIXTURES.md` for test schemas.\n"
        assert anchor in text, "README anchor moved"
        text = text.replace(anchor, anchor + "\n" + line + "\n", 1)
    readme.write_text(text)
    print(f"{n_cases} cases / {n_files} files -> README.md")


if __name__ == "__main__":
    main()
