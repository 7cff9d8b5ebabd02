"""Regenerate INVENTORY.md from the live operator registry.

Usage: python tools/gen_inventory.py
"""

from __future__ import annotations

import inspect
import pathlib

from hopspark.operators import all_queries


def main() -> None:
    rows = []
    for name, (fn, sql) in sorted(all_queries().items()):
        mod = inspect.getmodule(fn).__name__.replace("hopspark.", "").replace(".", "/") + ".py"
        check = "DuckDB oracle" if sql else "rows-only + unit tests"
        doc = (inspect.getdoc(fn) or "").splitlines()
        summary = doc[0].strip() if doc else ""
        rows.append(f"| `{name}` | {mod} | {check} | {summary} |")
    out = pathlib.Path(__file__).resolve().parent.parent / "INVENTORY.md"
    out.write_text(
        "# INVENTORY — every driver-gate query (auto-generated from hopspark.operators)\n\n"
        f"{len(rows)} queries; each row links a SURVEY.md §2 capability to its implementation\n"
        "and its correctness check. Regenerate with `python tools/gen_inventory.py`.\n\n"
        "| query | module | check | summary |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
