#!/usr/bin/env python
"""Round-end gate: never snapshot with a red test (round-5 VERDICT #2).

Runs, in order:

1. ``pytest tests/ -q`` — the full suite;
2. the in-window oracle check (``tools/check_correctness.py`` at
   sf0.01, all queries — a superset of the driver's 50-query window);
3. the engine-side invariant harness (``tools/invariants_x100.py`` at
   sf0.01 — fixed points, twin bit-identity, Python micro-oracles;
   round 8).

Prints a one-line machine-readable record (commit, dirty flag, pass and
fail counts) to stdout and appends it to GATE.log so the snapshot commit
demonstrably follows a green run.

Usage: python tools/round_gate.py [--skip-oracle] [--config harness.yml]
(--config pins the oracle's testdata root and is recorded in the
GATE.log line, so the round-end ritual is reproducible from one file —
round-6 VERDICT item #6.)
"""

from __future__ import annotations

import datetime as dt
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ska_src_maltopuft_etl_spark.config import load_harness_config  # noqa: E402


def run(cmd: list[str]) -> tuple[int, str]:
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    return p.returncode, p.stdout + p.stderr


def main() -> int:
    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True, text=True, check=True,
    ).stdout.strip())

    rc_t, out_t = run([sys.executable, "-m", "pytest", "tests/", "-q"])
    m = re.search(r"(\d+) passed", out_t)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", out_t)
    failed = int(m.group(1)) if m else 0

    cfg_path = None
    if "--config" in sys.argv:
        cfg_path = sys.argv[sys.argv.index("--config") + 1]
    cfg = load_harness_config(cfg_path)

    oracle = "skipped"
    if "--skip-oracle" not in sys.argv:
        rc_o, out_o = run(
            [sys.executable, "tools/check_correctness.py",
             os.path.join(cfg.testdata_root, "sf0.01")]
        )
        oracle = "green" if rc_o == 0 and "all queries match" in out_o else "RED"
    else:
        rc_o = 0

    # Round 8: the engine-side invariant harness (fixed points, twin
    # bit-identity, Python micro-oracles) also runs at sf0.01 — ~30 s,
    # and it checks properties the value-hash oracle can't (e.g. LSH
    # completeness on recomputed bands, CC over-merge).
    invariants = "skipped"
    if "--skip-oracle" not in sys.argv:
        rc_i, out_i = run(
            [sys.executable, "tools/invariants_x100.py",
             os.path.join(cfg.testdata_root, "sf0.01"), "--sample", "200"]
        )
        invariants = "green" if rc_i == 0 and "ALL GREEN" in out_i else "RED"
    else:
        rc_i = 0

    status = "GREEN" if rc_t == 0 and rc_o == 0 and rc_i == 0 else "RED"
    line = (
        f"{dt.datetime.now(dt.timezone.utc).isoformat(timespec='seconds')} "
        f"gate={status} commit={commit}{'+dirty' if dirty else ''} "
        f"pytest={passed}p/{failed}f oracle={oracle} invariants={invariants}"
        f" config={cfg_path or 'defaults'}"
    )
    print(line)
    with open(os.path.join(REPO, "GATE.log"), "a") as f:
        f.write(line + "\n")
    return 0 if status == "GREEN" else 1


if __name__ == "__main__":
    sys.exit(main())
