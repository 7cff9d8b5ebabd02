"""The expr-test.cc triage artifact is a committed, verifiable claim
(round-8 verdict item 1): the harness re-runs, the per-case report parses,
and every surviving non-pass carries an explicit class tag."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(REPO, "tools", "expr_triage_report.json")
CLASSES = os.path.join(REPO, "tools", "expr_triage_classes.json")

sys.path.insert(0, os.path.join(REPO, "tools"))


def _report():
    with open(REPORT) as f:
        return json.load(f)


def test_report_exists_and_parses():
    d = _report()
    assert d["summary"]["total_cases"] > 2500
    assert d["summary"]["pass"] > 2500
    assert set(d["cases"]) and all(
        "status" in r for r in d["cases"].values()
    )


def test_every_non_pass_is_classified():
    d = _report()
    unclassified = [
        cid
        for cid, r in d["cases"].items()
        if r["status"] in ("diff", "err") and "class" not in r
    ]
    assert unclassified == [], unclassified
    assert d["summary"]["unclassified"] == 0


def test_diff_budget():
    """Round-8 verdict item 1 asked <= 60; the round-9 ns constant folder
    burned the survivors to the 7 genuinely µs-storage-bound cases (bare
    timestamp-typed literals whose VALUE carries real ns digits — no Spark
    representation). Lock the tighter bound."""
    s = _report()["summary"]
    assert s["diff"] <= 10, s["diff_classes"]
    assert s["err"] == 0, s["diff_classes"]
    assert set(s["diff_classes"]) <= {"ns-rendering"}


def test_manual_class_tags_are_not_stale():
    """Every hand-tagged case id must still exist in the report (ids are
    stable hashes of kind|expr|want — a vanished id means the tag is
    dead weight or the case changed)."""
    d = _report()
    manual = json.load(open(CLASSES))
    missing = [cid for cid in manual if cid not in d["cases"]]
    assert missing == [], missing


def test_miner_parses_the_reference():
    """The harness itself stays runnable: the parser finds the full case
    population without executing anything."""
    from expr_triage import parse_cases

    cases = parse_cases()
    assert len(cases) > 2900
    kinds = {c["kind"].split(":")[0] for c in cases}
    assert {"str", "null", "val", "date", "ts"} <= kinds
