#!/usr/bin/env python
"""Streaming-path scale datapoint (round-7 VERDICT item #6).

The streaming operators (`stream_with_watermark_dedup`,
`sessionize_events`) are pytest-certified at toy size only; this
harness runs each over a scale tier's `events` table as a real
Structured Streaming query (availableNow trigger, parquet source,
checkpointed noop-style sink) and records wall time plus the state
store's own accounting (rows + bytes from `lastProgress`) — the number
that decides whether the state fits executor memory at 100 TB.

Usage:
    python tools/streaming_scale.py [tier_dir] [--out STREAM_SCALE.json]

Emits one JSON line per path and writes the combined artifact.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ska_src_maltopuft_etl_spark.engine import get_spark  # noqa: E402


def state_metrics(query) -> list[dict]:
    prog = query.lastProgress or {}
    out = []
    for op in prog.get("stateOperators", []):
        out.append(
            {
                "operator": op.get("operatorName"),
                "state_rows": op.get("numRowsTotal"),
                "state_bytes": op.get("memoryUsedBytes"),
                "rows_updated": op.get("numRowsUpdated"),
                "rows_removed": op.get("numRowsRemoved"),
            }
        )
    return out


def run_stream(spark, df, name: str) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"stream_scale_{name}_")
    t0 = time.time()
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 3)
    rec = {
        "path": name,
        "wall_sec": wall,
        "batches": q.lastProgress.get("batchId", -1) + 1 if q.lastProgress else 0,
        "rows_in": (q.lastProgress or {}).get("numInputRows"),
        "state": state_metrics(q),
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return rec


def main() -> int:
    args = sys.argv[1:]
    out_name = "STREAM_SCALE.json"
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            sys.exit("--out requires a value")
        out_name = args[i + 1]
        del args[i : i + 2]
    rocksdb = "--rocksdb" in args
    if rocksdb:
        args.remove("--rocksdb")
    tier = args[0] if args else "/tmp/sparkgraft_sf1"
    events_path = os.path.join(tier, "events.parquet")
    if not os.path.exists(events_path):
        sys.exit(f"events table not found: {events_path}")

    conf = {}
    if rocksdb:
        # The 100 TB state knob: RocksDB spills state off-heap/disk and
        # its memory accounting reflects real bytes, not the HDFS-backed
        # store's JVM-object overhead (~68 KB/row measured at ×10).
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark(app_name="streaming_scale", conf=conf)
    # events.parquet at the tiers is TIMESTAMP(NANOS); same conf the
    # batch loader sets (see sources.load_table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # Stage the single parquet file into a directory (a file-source
    # stream reads directories) and derive the schema from a batch read.
    stage = tempfile.mkdtemp(prefix="stream_scale_src_")
    os.symlink(os.path.abspath(events_path), os.path.join(stage, "events.parquet"))
    batch = spark.read.parquet(stage)
    n_rows = batch.count()
    from pyspark.sql import functions as F

    has_nanos = dict(batch.dtypes).get("ts") == "bigint"
    results = []

    def load_stream():
        s = spark.readStream.schema(batch.schema).parquet(stage)
        if has_nanos:
            # integer div: float division corrupts µs above 2^53 (NOTES)
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(batch.dtypes).get("ts") == "timestamp_ntz":
            # make_sfN tiers write naive µs timestamps; watermarks
            # require TimestampType (session tz is pinned UTC).
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s

    # 1. Watermark dedup keyed on the unique event id — the worst-case
    # state shape (every in-horizon row is a state entry).
    from ska_src_maltopuft_etl_spark.streaming import (
        sessionize_events,
        stream_with_watermark_dedup,
    )

    deduped = stream_with_watermark_dedup(
        load_stream(), "ts", ["event_id"], watermark="1 hour"
    )
    rec = run_stream(spark, deduped, "watermark_dedup")
    print(json.dumps(rec), flush=True)
    results.append(rec)

    # 2. Custom stateful sessionization (applyInPandasWithState):
    # state is one row per in-flight user session.
    sess = sessionize_events(load_stream(), gap_minutes=30)
    rec = run_stream(spark, sess, "sessionize_events")
    print(json.dumps(rec), flush=True)
    results.append(rec)

    # 3. LEFT-OUTER stream-stream interval join (round-12, VERDICT r11
    # item #6): outer-null emission is watermark-driven, so its state
    # row (both sides buffered until the band seals) is the number that
    # decides executor sizing — the asymmetric clicks→purchases shape
    # keeps real unmatched lefts in state to the end of the horizon.
    from ska_src_maltopuft_etl_spark.streaming import join_event_streams

    sl = load_stream().where(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.col("event_id").alias("l_event"),
        F.col("value").alias("l_value"),
    )
    sr = load_stream().where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    joined = join_event_streams(
        sl, sr, key="user_id", left_ts="ts", right_ts="r_ts",
        band_seconds=300, watermark="1 hour", how="leftOuter",
    )
    rec = run_stream(spark, joined, "interval_join_left_outer")
    print(json.dumps(rec), flush=True)
    results.append(rec)

    shutil.rmtree(stage, ignore_errors=True)
    artifact = {
        "tier_dir": tier,
        "rows": n_rows,
        "state_store": "rocksdb" if rocksdb else "hdfs-backed (default)",
        "paths": results,
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_name}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
