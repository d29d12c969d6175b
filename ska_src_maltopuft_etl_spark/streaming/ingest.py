"""Structured Streaming extensions.

The reference is pure batch (SURVEY.md §2.11): late/duplicate data is
handled by re-runs + content dedup + idempotent upserts. On a cluster the
natural evolution is a file-arrival stream with the same semantics:

- ``stream_run_summaries``: streaming version of the run-summary scan —
  same schema, same flattening; ``dropDuplicatesWithinWatermark`` on the
  content hash replaces the batch keep-first dedup (S4/W1) for files that
  arrive within the watermark horizon;
- ``stream_with_watermark_dedup``: the generic operator;
- ``sessionize_events``: an example custom stateful operator
  (``applyInPandasWithState``) — session windows with timeout, the shape
  any bespoke streaming state machine takes in this engine.

All sinks are left to the caller (``writeStream`` with checkpointing);
tests drive these with ``Trigger.AvailableNow`` over static directories.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def stream_with_watermark_dedup(
    df: DataFrame,
    event_time_col: str,
    dedup_cols: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming analogue of the batch content dedup (S4):
    duplicates arriving within ``watermark`` of each other collapse to
    the first-seen row; state is bounded by the watermark horizon."""
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        dedup_cols
    )


def stream_run_summaries(
    spark: SparkSession, directory: str, watermark: str = "1 hour"
) -> DataFrame:
    """File-arrival stream of run summaries with content dedup.

    Reuses the batch source's schema + flattening (sources/run_summary)
    via a thin readStream; event time is the observation start.
    """
    from ska_src_maltopuft_etl_spark.sources.run_summary import (
        RUN_SUMMARY_SCHEMA,
    )

    raw = (
        spark.readStream.schema(RUN_SUMMARY_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*run_summary.json")
        .option("maxFilesPerTrigger", "1000")
        .json(directory)
        .withColumn("__path", F.input_file_name())
    )
    # minimal projection for streaming consumers; the full flatten is the
    # batch path's job once files land in bronze.
    flat = raw.select(
        F.col("__path").alias("path"),
        F.to_timestamp(F.col("utc_start"), "yyyy-MM-dd'_'HH:mm:ss").alias("utc_start"),
        F.md5(F.to_json(F.struct("beams", "data", "sb_details", "utc_start", "utc_stop"))).alias(
            "content_hash"
        ),
        F.col("sb_details.id").alias("meerkat_id"),
    )
    return stream_with_watermark_dedup(flat, "utc_start", ["content_hash"], watermark)


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize_events(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout: str = "event",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: gap-based session windows per user via
    ``applyInPandasWithState``.

    Demonstrates the engine's pattern for operators Structured Streaming
    lacks natively: per-key state in Arrow batches, emitted on timeout.
    Batch demo/verification uses session_window aggregation instead
    (see plans/relational streaming-adjacent queries).

    ``timeout`` picks the session-close clock:

    - ``"event"`` (default): EventTimeTimeout — a session closes when
      the WATERMARK passes its end + gap. Deterministic (a replay
      produces the same sessions) and terminates under
      ``Trigger.AvailableNow``; requires ``watermark`` on ``ts_col``.
    - ``"processing"``: ProcessingTimeTimeout — a session closes
      ``gap_minutes`` of WALL CLOCK after its last update. Only for
      genuinely live streams. **Never combine with AvailableNow**: the
      trigger cannot drain pending processing-time timeouts, so the
      query spins empty micro-batches at full CPU — every batch cycles
      the whole state store through Python — until the wall-clock gap
      elapses (measured: 90+ CPU-minutes "processing" 1 M rows that
      took 6 s of real work; found by the round-8 scale harness).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    if timeout == "event":
        events = events.withWatermark(ts_col, watermark)
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif timeout == "processing":
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        raise ValueError(f"timeout must be 'event' or 'processing': {timeout!r}")

    def set_timeout(state: GroupState, end_us: int) -> None:
        if timeout == "event":
            # fire when the watermark passes session end + gap (ms);
            # clamp above the current watermark — a timeout timestamp
            # at/behind it is an error (late rows within the allowed
            # lateness can end a session before the watermark).
            ts_ms = end_us // 1000 + gap_minutes * 60 * 1000
            state.setTimeoutTimestamp(
                max(ts_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_us = rows[ts_col].astype("int64") // 1000
        lo, hi = int(ts_us.min()), int(ts_us.max())
        n_new, tot_new = len(rows), float(rows[value_col].sum())
        if state.exists:
            start_us, end_us, n, total = state.get
            if lo - end_us > gap_us:
                # gap exceeded: emit the closed session, start fresh
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(end_us, unit="us")],
                        "n_events": [n],
                        "total_value": [total],
                    }
                )
                state.update((lo, hi, n_new, tot_new))
            else:
                state.update(
                    (min(start_us, lo), max(end_us, hi), n + n_new, total + tot_new)
                )
        else:
            state.update((lo, hi, n_new, tot_new))
        set_timeout(state, int(state.get[1]))
        return

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events for the same key occurring within
    ``band_seconds`` AFTER it (the streaming form of the batch
    interval_join operator).

    Both sides carry watermarks and the join condition bounds the time
    distance, so Spark can expire buffered state once the watermark
    passes an event's band — state is O(events inside the horizon),
    not O(stream). Without the band the state store would grow without
    bound; this is the scale-critical part of the operator, not the
    join syntax.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {int(band_seconds)} SECONDS")
        )
    )
    return lw.join(rw, cond)
