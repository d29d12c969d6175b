#!/usr/bin/env python
"""Live-PostgreSQL contract probe for the relational sink's native
ON CONFLICT branch (round-14 VERDICT item #6).

`tests/test_postgres_live.py` is the full-fidelity module (Spark JDBC
end-to-end), but this container ships no PostgreSQL JDBC driver jar and
no network to fetch one, so the Spark transport cannot reach a server
here. What CAN run live is the part the reference actually depends on —
the SQL semantics (reference core/insert.py:76-119): this probe boots a
throwaway local PostgreSQL (initdb + pg_ctl on a private socket dir),
creates the same table shapes the contract tests use
(pg_schedule_block: PK id + UNIQUE(start_at, est_end_at)), and executes
the LITERAL staged-merge statement `load_targets_on_conflict` renders on
its Postgres branch (sinks/relational.py:471-475):

    INSERT INTO "t" (cols) SELECT cols FROM "t_stage" s
    ON CONFLICT DO NOTHING

against live scenarios mirroring the gated test module:

1. replaying an identical batch is a database-side no-op;
2. a PK collision skips the ROW, not the batch (sibling novel rows
   insert);
3. NULLS DISTINCT — a NULL-keyed row never conflicts, inserting on
   every run (the semantic the Derby twin emulates);
4. intra-statement duplicates: ON CONFLICT DO NOTHING also suppresses
   the second copy WITHIN one INSERT..SELECT (why the Spark-side
   pre-dedup exists only for the vanilla NOT EXISTS backend);
5. natural-key conflict via the secondary unique constraint (novel PK,
   clashing (start_at, est_end_at)) is skipped the same way.

Run: python tools/pg_live_probe.py   (exit 0 = every scenario green)
Writes PG_LIVE_PROBE.json at the repo root with the transcript.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MERGE = (
    'INSERT INTO "pg_schedule_block" (id, start_at, est_end_at) '
    'SELECT s.id, s.start_at, s.est_end_at FROM "pg_schedule_block_stage" s '
    "ON CONFLICT DO NOTHING"
)


class Pg:
    def __init__(self) -> None:
        self.dir = tempfile.mkdtemp(prefix="pg_probe_")
        self.data = os.path.join(self.dir, "data")
        self.sock = os.path.join(self.dir, "sock")
        os.makedirs(self.sock)

    def start(self) -> None:
        # postgres refuses to run as root: drop to an unprivileged user
        # via a dedicated runtime dir it owns
        self.user = None
        if os.geteuid() == 0:
            self.user = "nobody"
            subprocess.run(
                ["chown", "-R", "nobody", self.dir], check=True
            )
        self._run(["initdb", "-D", self.data, "-A", "trust", "-U", "probe"])
        self._run(
            [
                "pg_ctl", "-D", self.data, "-w", "-o",
                f"-k {self.sock} -h '' -p 5499", "start",
                "-l", os.path.join(self.dir, "pg.log"),
            ]
        )

    def _run(self, cmd, **kw):
        if self.user:
            cmd = ["runuser", "-u", self.user, "--"] + cmd
        return subprocess.run(
            cmd, check=True, capture_output=True, text=True, **kw
        )

    def sql(self, stmt: str) -> str:
        out = self._run(
            [
                "psql", "-h", self.sock, "-p", "5499", "-U", "probe",
                "-d", "postgres", "-v", "ON_ERROR_STOP=1",
                "-At", "-c", stmt,
            ]
        )
        return out.stdout.strip()

    def stop(self) -> None:
        try:
            self._run(["pg_ctl", "-D", self.data, "-m", "fast", "stop"])
        except Exception:
            pass
        shutil.rmtree(self.dir, ignore_errors=True)


def main() -> int:
    pg = Pg()
    results: list[dict] = []

    def check(name: str, ok: bool, detail: str) -> None:
        results.append({"scenario": name, "ok": bool(ok), "detail": detail})
        print(("OK   " if ok else "FAIL ") + f"{name}: {detail}")

    try:
        pg.start()
        ver = pg.sql("SELECT version()")
        pg.sql(
            """CREATE TABLE pg_schedule_block (
                 id BIGINT PRIMARY KEY,
                 start_at TIMESTAMP,
                 est_end_at TIMESTAMP,
                 UNIQUE (start_at, est_end_at))"""
        )
        pg.sql(
            """CREATE TABLE pg_schedule_block_stage (
                 id BIGINT, start_at TIMESTAMP, est_end_at TIMESTAMP)"""
        )

        def stage(rows: str) -> None:
            pg.sql("TRUNCATE pg_schedule_block_stage")
            pg.sql(f"INSERT INTO pg_schedule_block_stage VALUES {rows}")

        def count() -> int:
            return int(pg.sql("SELECT count(*) FROM pg_schedule_block"))

        batch = (
            "(1, '2023-11-20 21:00', '2023-11-20 22:00'),"
            "(2, '2023-11-20 22:00', '2023-11-20 23:00')"
        )
        stage(batch)
        pg.sql(MERGE)
        first = count()
        stage(batch)
        pg.sql(MERGE)
        check(
            "idempotent_replay",
            first == 2 and count() == 2,
            f"2 rows after load, {count()} after identical replay",
        )

        # PK collision (id 1, novel natural key) skips the row; the
        # sibling novel row 3 inserts — row-wise, not batch-wise
        stage(
            "(1, '2023-11-21 05:00', '2023-11-21 06:00'),"
            "(3, '2023-11-21 07:00', '2023-11-21 08:00')"
        )
        pg.sql(MERGE)
        ids = pg.sql("SELECT string_agg(id::text, ',' ORDER BY id) "
                     "FROM pg_schedule_block")
        check(
            "pk_collision_skips_row_not_batch",
            ids == "1,2,3",
            f"ids after clashing batch: {ids}",
        )

        # NULLS DISTINCT: NULL-keyed rows insert on EVERY run
        for run in (1, 2):
            stage(f"({100 + run}, NULL, '2023-11-22 00:00')")
            pg.sql(MERGE)
        n_null = int(
            pg.sql("SELECT count(*) FROM pg_schedule_block "
                   "WHERE start_at IS NULL")
        )
        check(
            "nulls_distinct_inserts_every_run",
            n_null == 2,
            f"{n_null} NULL-keyed rows after two runs (want 2)",
        )

        # intra-statement duplicates: the SECOND staged copy conflicts
        # with the first inside one INSERT..SELECT and is dropped
        stage(
            "(200, '2023-11-23 01:00', '2023-11-23 02:00'),"
            "(201, '2023-11-23 01:00', '2023-11-23 02:00')"
        )
        pg.sql(MERGE)
        n_dup = int(
            pg.sql("SELECT count(*) FROM pg_schedule_block "
                   "WHERE start_at = '2023-11-23 01:00'")
        )
        check(
            "intra_statement_duplicate_suppressed",
            n_dup == 1,
            f"{n_dup} row(s) from a duplicate-keyed staged pair (want 1)",
        )

        # secondary-unique conflict: novel PK, clashing natural key
        before = count()
        stage("(300, '2023-11-20 21:00', '2023-11-20 22:00')")
        pg.sql(MERGE)
        check(
            "natural_key_conflict_skipped",
            count() == before,
            f"row count {before} -> {count()} (novel PK, clashing "
            "(start_at, est_end_at) — must be skipped)",
        )

        ok = all(r["ok"] for r in results)
        out = {
            "server": ver,
            "merge_statement": MERGE,
            "scenarios": results,
            "transport_note": (
                "Spark JDBC transport (tests/test_postgres_live.py) "
                "remains environment-blocked: no PostgreSQL JDBC driver "
                "jar in the container and no network to fetch one. This "
                "probe verifies the rendered SQL contract "
                "(sinks/relational.py:471-475) against a live server."
            ),
        }
        with open(os.path.join(REPO, "PG_LIVE_PROBE.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(("\nall scenarios green on: " if ok else "\nFAILURES on: ") + ver)
        return 0 if ok else 1
    finally:
        pg.stop()


if __name__ == "__main__":
    sys.exit(main())
