"""Gate-stability harness (round-4 verdict item 1c): run the driver's
first-50 correctness gate in FRESH subprocesses N times, plus one round with
two CONCURRENT gate processes sharing /tmp, and assert zero flakes.

The round-3 driver run had two `hash_match: false` rows that never reproduced
in-process; the suspects were /tmp fixture sharing and lazy localCheckpoint.
This harness is the proof that those fixes hold under the driver's own
conditions (fresh JVM per run, concurrent tenants of /tmp).

Usage: PYTHONPATH=. python tools/gate_stability.py [N] [sf_dir] [--arrow]

``--arrow`` runs every gate subprocess with driver_sim's Arrow oracle fetch
(the pandas/Arrow rendering a real driver uses, which turns DuckDB HUGEINT
into float64) — proving the gate stable under BOTH fetch disciplines
(round-4 verdict item 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


ARROW = "--arrow" in sys.argv
if ARROW:
    sys.argv.remove("--arrow")


def run_gate(tag: str, sf_dir: str) -> tuple[int, list[str]]:
    out = f"/tmp/gate_stab_{tag}_{os.getpid()}.json"
    proc = subprocess.run(
        [sys.executable, "tools/driver_sim.py", sf_dir, "--first", "50",
         "--out", out] + (["--arrow"] if ARROW else []),
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
    )
    fails: list[str] = []
    try:
        with open(out) as f:
            results = json.load(f)
        fails = [
            n for n, r in results.items()
            if r.get("err") not in (None, "no_oracle")
            or not (r.get("rows_match", True) and r.get("schema_match", True)
                    and r.get("hash_match", True)
                    and r.get("type_match", True))
        ]
    except FileNotFoundError:
        fails = ["<gate crashed before writing results>"]
    finally:
        if os.path.exists(out):
            os.unlink(out)
    return proc.returncode, fails


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    flakes: dict[str, list[str]] = {}

    for i in range(n):
        t0 = time.time()
        rc, fails = run_gate(f"seq{i}", sf_dir)
        print(f"run {i + 1}/{n}: rc={rc} fails={fails} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if fails:
            flakes[f"seq{i}"] = fails

    # Concurrent round: two gate processes sharing /tmp at once — the exact
    # hazard the old stable-path nested fixture was vulnerable to.
    print("concurrent round: 2 gate processes sharing /tmp", flush=True)
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/driver_sim.py", sf_dir, "--first", "50",
             "--out", f"/tmp/gate_stab_conc{j}.json"]
            + (["--arrow"] if ARROW else []),
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for j in range(2)
    ]
    for j, p in enumerate(procs):
        p.wait()
        with open(f"/tmp/gate_stab_conc{j}.json") as f:
            results = json.load(f)
        fails = [
            name for name, r in results.items()
            if r.get("err") not in (None, "no_oracle")
            or not (r.get("rows_match", True) and r.get("schema_match", True)
                    and r.get("hash_match", True)
                    and r.get("type_match", True))
        ]
        os.unlink(f"/tmp/gate_stab_conc{j}.json")
        print(f"concurrent[{j}]: rc={p.returncode} fails={fails}", flush=True)
        if fails:
            flakes[f"conc{j}"] = fails

    if flakes:
        print(f"\nFLAKES DETECTED: {flakes}")
        sys.exit(1)
    print(f"\nSTABLE: {n} sequential + 2 concurrent gate runs, zero flakes")


if __name__ == "__main__":
    main()
