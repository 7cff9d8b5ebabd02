"""Executes every probe in the audited function matrix
(tools/gen_function_matrix.py) through the Impala-dialect SQL surface —
the evidence behind FUNCTIONS.md."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_every_supported_name_probes_green(spark, sf_dir):
    from gen_function_matrix import MATRIX, run_probes

    from hopspark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    errors = run_probes(eng)
    assert not errors, f"{len(errors)} probe failures: {errors}"
    n_probed = sum(1 for _, p, _ in MATRIX.values() if p is not None)
    assert n_probed >= 250


def test_value_pin_coverage():
    """Every deterministic supported probe must carry a value pin — the
    round-2 verdict's parity-not-just-execution requirement.  The exemption
    list is closed: only non-deterministic / environment-dependent names."""
    from gen_function_matrix import EXPECTED, MATRIX

    exempt = {
        "rand", "random", "uuid", "current_date", "current_timestamp", "now",
        "utc_timestamp", "timeofday", "coordinator", "current_session",
        "current_sid", "pid", "current_user", "effective_user",
        "logged_in_user", "session_user", "user", "version",
        "current_catalog", "current_database",
    }
    supported = {
        n for n, (s, p, _) in MATRIX.items()
        if p is not None and s in ("native", "renamed", "rewritten", "registered")
    }
    unpinned = supported - set(EXPECTED) - exempt
    assert not unpinned, f"supported probes without value pins: {sorted(unpinned)}"
    assert len(EXPECTED) >= 240


def test_matrix_covers_reference_registry():
    from gen_function_matrix import _AGG_POSITION, MATRIX, reference_names

    ref = reference_names()
    missing = ref - set(MATRIX) - _AGG_POSITION
    assert not missing, f"unclassified reference names: {sorted(missing)}"
