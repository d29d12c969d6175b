#!/usr/bin/env python
"""Stream-vs-batch equivalence CERTIFICATE (round-10 VERDICT item #1).

Unit tests certify the streaming operators on toy fixtures; this harness
certifies them at tier scale the same way the driver certifies batch
queries — an order-insensitive value hash that must be IDENTICAL between
the streaming computation and an independent batch computation of the
same semantics. Building (but not committing) this harness in round 9 is
what exposed the fused-sessions bug; round 10 commits it.

What it stages (deterministically, no RNG):

- the tier's ``events`` table split into ``--blocks`` time-block files,
  streamed with ``maxFilesPerTrigger=1`` → a genuinely MULTI-BATCH run
  with carried state at every block boundary;
- ~20% of rows (``event_id % 5 == 0``) displaced one block LATER →
  cross-batch OUT-OF-ORDER arrival, including whole late sessions that
  chronologically precede state carried from a newer batch (the exact
  fold-class bug of rounds 8/9); the watermark delay (4 days) exceeds
  the displacement (one 3-day block), so nothing is ever dropped late
  and the batch twin needs no late-row model;
- ~14% of rows (``event_id % 7 == 3``) duplicated into the next block →
  real cross-batch duplicates for the watermark-dedup path.

Certificates emitted (check_correctness-style OK/FAIL lines):

1. ``sessionize_stream_vs_batch`` — ``sessionize_events`` (event-time
   timeout) over the staged stream == batch gap-sessionization of the
   staged rows, filtered to watermark-sealed sessions
   (``end + gap < final watermark``, the only sessions append mode may
   emit).
2. ``sessionize_restart_recovery`` — same pipeline on the RocksDB state
   store, killed mid-run (after ~half the batches) and restarted from
   the checkpoint into a parquet sink: final hash must equal #1.
3. ``dedup_stream_vs_batch`` — ``stream_with_watermark_dedup`` on
   ``event_id`` == batch ``dropDuplicates``.
4. ``interval_join_stream_vs_batch`` — ``join_event_streams`` (the
   watermarked stream-stream interval join, self-join shape: each event
   paired with the same user's events in the 300 s after it) == a batch
   non-equi join of the staged rows. The watermark (4 days) exceeds the
   out-of-order displacement (one 3-day block), so state retention
   covers every admissible pair and the streaming result must be match-
   complete — this is exactly the state-expiry contract the operator's
   docstring claims and that unit tests can't certify at scale.

Usage:
    python tools/stream_equiv.py [tier_dir] [--blocks 10]
                                 [--out STREAM_EQUIV.json]

Exit 0 iff every certificate is OK; writes the JSON artifact and appends
the OK lines to CORRECTNESS_X10.txt when run at a ×10 tier.
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
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from tools.check_correctness import frame_hash  # noqa: E402

from ska_src_maltopuft_etl_spark.engine import get_spark  # noqa: E402

GAP_MINUTES = 30
WATERMARK = "96 hours"  # 4 days > one 3-day displacement block
WATERMARK_MS = 96 * 3600 * 1000


def stage_inputs(tier_dir: str, stage: str, blocks: int) -> dict:
    """Split the tier's events into time-block files with deterministic
    displacement (out-of-order) and duplication, oldest-block-first
    mtimes so the file stream consumes them as ordered micro-batches."""
    con = duckdb.connect()
    ev = f"read_parquet('{tier_dir}/events.parquet')"
    lo, hi, n = con.execute(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)), count(*) FROM {ev}"
    ).fetchone()
    block_len = (hi - lo) // blocks + 1
    con.execute(
        f"""
        CREATE TEMP TABLE staged AS
        WITH base AS (
            SELECT * REPLACE (ts::TIMESTAMP AS ts),
                   least((epoch_us(ts) - {lo}) // {block_len},
                         {blocks - 1}) AS block
            FROM {ev}
        )
        SELECT event_id, ts, user_id, event_type, value, props,
               CASE WHEN event_id % 5 = 0 AND block < {blocks - 1}
                    THEN block + 1 ELSE block END AS f
        FROM base
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value, props,
               least(block + 1, {blocks - 1}) AS f
        FROM base WHERE event_id % 7 = 3
        """
    )
    n_staged = con.execute("SELECT count(*) FROM staged").fetchone()[0]
    now = time.time()
    for i in range(blocks):
        path = os.path.join(stage, f"block_{i:03d}.parquet")
        con.execute(
            f"COPY (SELECT event_id, ts, user_id, event_type, value, props "
            f"FROM staged WHERE f = {i}) TO '{path}' (FORMAT PARQUET)"
        )
        # oldest-first mtimes pin the micro-batch order
        os.utime(path, (now - 3600 + i * 60, now - 3600 + i * 60))
    return {"rows_base": n, "rows_staged": n_staged, "ts_max_us": hi}


def load_stream(spark, stage: str, schema):
    from pyspark.sql import functions as F

    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    if dict(zip(schema.fieldNames(), [f.dataType.simpleString() for f in schema.fields])).get(
        "ts"
    ) == "timestamp_ntz":
        s = s.withColumn("ts", F.col("ts").cast("timestamp"))
    return s


def hash_df(df) -> tuple[int, str]:
    rows = [tuple(r) for r in df.collect()]
    return len(rows), frame_hash(df.columns, rows)


def batch_sessions(spark, stage: str, ts_max_us: int):
    """Independent batch twin of sessionize_events: window-lag gap split,
    filtered to sessions the watermark has sealed (the only ones
    append-mode streaming may emit). Spark truncates event-time stats to
    ms, so the final watermark is floor(max_us/1000) - delay ms."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_us = GAP_MINUTES * 60 * 1_000_000
    final_wm_us = (ts_max_us // 1000 - WATERMARK_MS) * 1000
    ev = spark.read.parquet(stage).withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ses = (
        ev.withColumn("ts_us", F.unix_micros("ts"))
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > F.lit(gap_us)),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("ts_us").alias("end_us"),
        )
        .where(F.col("end_us") + F.lit(gap_us) < F.lit(final_wm_us))
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    return ses


def run_to_memory(spark, df, name: str) -> None:
    ckpt = tempfile.mkdtemp(prefix=f"equiv_{name}_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(1800) is True, f"{name} did not terminate"
    shutil.rmtree(ckpt, ignore_errors=True)


def run_with_kill_restart(spark, make_df, sink_dir: str, ckpt: str, kill_after: int) -> dict:
    """Start the query, stop it once >= kill_after batches committed,
    restart from the checkpoint, drain. The parquet sink's metadata log
    makes the restart exactly-once, which the hash check verifies."""

    def start():
        return (
            make_df()
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    killed_at = None
    while q.isActive:
        prog = q.recentProgress
        done = max((p["batchId"] for p in prog), default=-1) if prog else -1
        if done >= kill_after:
            q.stop()
            killed_at = done
            break
        time.sleep(0.5)
    q.awaitTermination(600)
    if killed_at is None:  # drained before we could kill: still a valid run
        return {"killed_at_batch": None, "restarted": False}
    q2 = start()
    assert q2.awaitTermination(1800) is True, "restarted query did not terminate"
    return {"killed_at_batch": killed_at, "restarted": True}


def main() -> int:
    args = sys.argv[1:]
    out_name = "STREAM_EQUIV.json"
    if "--out" in args:
        i = args.index("--out")
        out_name = args[i + 1]
        del args[i : i + 2]
    blocks = 10
    if "--blocks" in args:
        i = args.index("--blocks")
        blocks = int(args[i + 1])
        del args[i : i + 2]
    only = None  # substring filter: run only matching certificates
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        del args[i : i + 2]
    tier = args[0] if args else "/tmp/sparkgraft_sf1"
    if not os.path.exists(os.path.join(tier, "events.parquet")):
        sys.exit(f"events table not found in {tier} (run tools/make_sfN.py first)")

    from pyspark.sql import functions as F

    from ska_src_maltopuft_etl_spark.streaming import (
        join_event_streams,
        sessionize_events,
        stream_with_watermark_dedup,
    )

    spark = get_spark(app_name="stream_equiv", conf={"spark.ui.enabled": "false"})
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    stage = tempfile.mkdtemp(prefix="stream_equiv_src_")
    work = []
    results: list[dict] = []
    ok = True

    def record(name: str, match: bool, rows: int, h: str, extra: str = "") -> None:
        nonlocal ok
        tag = "OK  " if match else "FAIL"
        print(f"{tag}  {name}: rows={rows} hash={h} {extra}".rstrip(), flush=True)
        results.append({"name": name, "ok": match, "rows": rows, "hash": h})
        ok = ok and match

    try:
        info = stage_inputs(tier, stage, blocks)
        print(
            f"staged {info['rows_staged']} rows ({info['rows_base']} base + dups) "
            f"into {blocks} blocks at {stage}",
            flush=True,
        )
        schema = spark.read.parquet(stage).schema
        band_s = 300
        ev_b = spark.read.parquet(stage).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

        def want(name: str) -> bool:
            return only is None or only in name


        def sessions_stream():
            return sessionize_events(
                load_stream(spark, stage, schema),
                gap_minutes=GAP_MINUTES,
                watermark=WATERMARK,
            ).withColumn("total_value", F.round("total_value", 4))

        if want("sessionize"):
            # --- certificate 1: sessionize, streaming == batch twin -------
            t0 = time.time()
            run_to_memory(spark, sessions_stream(), "equiv_sessions")
            n_s, h_s = hash_df(spark.sql("SELECT * FROM equiv_sessions"))
            n_b, h_b = hash_df(batch_sessions(spark, stage, info["ts_max_us"]))
            record(
                "sessionize_stream_vs_batch",
                (n_s, h_s) == (n_b, h_b),
                n_s,
                h_s,
                f"(batch twin rows={n_b} hash={h_b}; {time.time() - t0:.0f}s)",
            )

            # --- certificate 2: kill + restart from RocksDB checkpoint ----
            t0 = time.time()
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            sink_dir = tempfile.mkdtemp(prefix="equiv_sink_")
            ckpt = tempfile.mkdtemp(prefix="equiv_ckpt_")
            work += [sink_dir, ckpt]
            meta = run_with_kill_restart(
                spark, sessions_stream, sink_dir, ckpt, kill_after=blocks // 2
            )
            n_r, h_r = hash_df(spark.read.schema(
                spark.sql("SELECT * FROM equiv_sessions").schema
            ).parquet(sink_dir))
            record(
                "sessionize_restart_recovery",
                (n_r, h_r) == (n_s, h_s) and meta["restarted"],
                n_r,
                h_r,
                f"(killed at batch {meta['killed_at_batch']}, restarted="
                f"{meta['restarted']}, rocksdb state; {time.time() - t0:.0f}s)",
            )
            results[-1].update(meta)

            # --- certificate 2b: COLD restart with NEW files (round-13) --
            # Cert 2 kills a RUNNING query; this one stops a fully
            # DRAINED one (availableNow terminated on half the blocks),
            # lands the remaining time-block files, and restarts on the
            # same checkpoint + sink — the operational "new data arrived
            # after the stream stopped" path. Carried state (open
            # sessions at the phase boundary, the watermark) must
            # survive the cold start: the combined output hash must
            # equal the single-run hash from certificate 1.
            t0 = time.time()
            hold = tempfile.mkdtemp(prefix="equiv_hold_")
            sink2 = tempfile.mkdtemp(prefix="equiv_sink2_")
            ckpt2 = tempfile.mkdtemp(prefix="equiv_ckpt2_")
            work += [hold, sink2, ckpt2]
            moved = []
            for i in range(blocks // 2, blocks):
                fname = f"block_{i:03d}.parquet"
                shutil.move(os.path.join(stage, fname), os.path.join(hold, fname))
                moved.append(fname)

            def drain_cold():
                q = (
                    sessions_stream().writeStream.format("parquet")
                    .option("path", sink2)
                    .option("checkpointLocation", ckpt2)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(1800) is True, "cold-restart drain hung"

            drain_cold()
            for fname in moved:  # restore BEFORE the restart and for certs 3-5
                shutil.move(os.path.join(hold, fname), os.path.join(stage, fname))
            drain_cold()
            n_c, h_c = hash_df(
                spark.read.schema(
                    spark.sql("SELECT * FROM equiv_sessions").schema
                ).parquet(sink2)
            )
            record(
                "sessionize_cold_restart_new_files",
                (n_c, h_c) == (n_s, h_s),
                n_c,
                h_c,
                f"(drained {blocks // 2} blocks, stopped, +{len(moved)} blocks, "
                f"restarted from checkpoint; {time.time() - t0:.0f}s)",
            )

        if want("dedup"):
            # --- certificate 3: watermark dedup, streaming == batch -------
            t0 = time.time()
            deduped = stream_with_watermark_dedup(
                load_stream(spark, stage, schema), "ts", ["event_id"], watermark=WATERMARK
            )
            run_to_memory(spark, deduped, "equiv_dedup")
            n_d, h_d = hash_df(spark.sql("SELECT * FROM equiv_dedup"))
            twin = (
                spark.read.parquet(stage)
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .dropDuplicates(["event_id"])
            )
            n_t, h_t = hash_df(twin)
            record(
                "dedup_stream_vs_batch",
                (n_d, h_d) == (n_t, h_t),
                n_d,
                h_d,
                f"(batch twin rows={n_t} hash={h_t}; {time.time() - t0:.0f}s)",
            )

        if want("interval_join_stream_vs_batch"):
            # --- certificate 4: stream-stream interval join == batch ------
            t0 = time.time()

            def join_sides(left, right):
                l = left.select(
                    "user_id",
                    "ts",
                    F.col("event_id").alias("l_event"),
                    F.col("value").alias("l_value"),
                )
                r = right.select(
                    "user_id",
                    F.col("ts").alias("r_ts"),
                    F.col("event_id").alias("r_event"),
                )
                return l, r

            sl, sr = join_sides(
                load_stream(spark, stage, schema), load_stream(spark, stage, schema)
            )
            joined_stream = join_event_streams(
                sl, sr, key="user_id", left_ts="ts", right_ts="r_ts",
                band_seconds=band_s, watermark=WATERMARK,
            ).select("l_event", "r_event", F.round("l_value", 4).alias("l_value"))
            run_to_memory(spark, joined_stream, "equiv_ivjoin")
            n_j, h_j = hash_df(spark.sql("SELECT * FROM equiv_ivjoin"))
            bl, br = join_sides(ev_b, ev_b)
            br = br.withColumnRenamed("user_id", "r_user")
            twin_j = (
                bl.join(
                    br,
                    (bl["user_id"] == br["r_user"])
                    & (br["r_ts"] >= bl["ts"])
                    & (br["r_ts"] <= bl["ts"] + F.expr(f"INTERVAL {band_s} SECONDS")),
                )
                .select("l_event", "r_event", F.round("l_value", 4).alias("l_value"))
            )
            n_jb, h_jb = hash_df(twin_j)
            record(
                "interval_join_stream_vs_batch",
                (n_j, h_j) == (n_jb, h_jb),
                n_j,
                h_j,
                f"(batch twin rows={n_jb} hash={h_jb}; {time.time() - t0:.0f}s)",
            )

        if want("left_outer"):
            # --- certificate 5: LEFT-OUTER stream-stream join == batch ----
            # (round-11, VERDICT r10 item #4). The outer contract is
            # timing-sensitive: an unmatched left event may only emit once
            # the watermark closes its band (ts + band < wm), so the batch
            # twin is a left join whose null-extended rows are filtered to
            # bands the FINAL watermark sealed — matched pairs emit
            # unconditionally. The bucketed rewrite must not duplicate a
            # null-extension (left rows carry exactly one band bucket).
            # ASYMMETRIC sides (clicks → purchases): a symmetric self-join
            # would match every left row to itself at distance 0 and the
            # outer path would never produce a null row — the certificate
            # must force real unmatched lefts, both sealed (emitted with
            # nulls) and open-band at end-of-stream (withheld).
            t0 = time.time()

            def outer_sides(left, right):
                l = left.where(F.col("event_type") == "click").select(
                    "user_id",
                    "ts",
                    F.col("event_id").alias("l_event"),
                    F.col("value").alias("l_value"),
                )
                r = right.where(F.col("event_type") == "purchase").select(
                    "user_id",
                    F.col("ts").alias("r_ts"),
                    F.col("event_id").alias("r_event"),
                )
                return l, r

            sl, sr = outer_sides(
                load_stream(spark, stage, schema), load_stream(spark, stage, schema)
            )
            joined_outer = join_event_streams(
                sl, sr, key="user_id", left_ts="ts", right_ts="r_ts",
                band_seconds=band_s, watermark=WATERMARK, how="leftOuter",
            ).select("l_event", "r_event", F.round("l_value", 4).alias("l_value"))
            run_to_memory(spark, joined_outer, "equiv_ivjoin_lo")
            n_o, h_o = hash_df(spark.sql("SELECT * FROM equiv_ivjoin_lo"))
            n_null = spark.sql(
                "SELECT count(*) FROM equiv_ivjoin_lo WHERE r_event IS NULL"
            ).first()[0]
            final_wm_us = (info["ts_max_us"] // 1000 - WATERMARK_MS) * 1000
            bl, br = outer_sides(ev_b, ev_b)
            br = br.withColumnRenamed("user_id", "r_user")
            twin_o = (
                bl.join(
                    br,
                    (bl["user_id"] == br["r_user"])
                    & (br["r_ts"] >= bl["ts"])
                    & (br["r_ts"] <= bl["ts"] + F.expr(f"INTERVAL {band_s} SECONDS")),
                    "left",
                )
                .where(
                    F.col("r_event").isNotNull()
                    | (
                        F.unix_micros("ts") + F.lit(band_s * 1_000_000)
                        < F.lit(final_wm_us)
                    )
                )
                .select("l_event", "r_event", F.round("l_value", 4).alias("l_value"))
            )
            n_ob, h_ob = hash_df(twin_o)
            record(
                "interval_join_left_outer_stream_vs_batch",
                (n_o, h_o) == (n_ob, h_ob) and n_null > 0,
                n_o,
                h_o,
                f"(batch twin rows={n_ob} hash={h_ob}; null-extended rows={n_null}; "
                f"{time.time() - t0:.0f}s)",
            )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        for d in work:
            shutil.rmtree(d, ignore_errors=True)

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=REPO,
    ).stdout.strip()
    artifact = {
        "tier_dir": tier,
        "blocks": blocks,
        "rows_staged": info["rows_staged"],
        "watermark": WATERMARK,
        "gap_minutes": GAP_MINUTES,
        "commit": commit,
        "all_ok": ok,
        "certificates": results,
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_name} (all_ok={ok})", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
