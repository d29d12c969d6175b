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

    def emit(key, spans: list[tuple[int, int, int, float]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(spans),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in spans],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in spans],
                "n_events": [n for _, _, n, _ in spans],
                "total_value": [t for _, _, _, t in spans],
            }
        )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            span = tuple(state.get)
            state.remove()
            yield emit(key, [span])
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).to_numpy()
        vals = rows[value_col].to_numpy()
        # Sessionize WITHIN the batch: split the key's (sorted) rows at
        # every gap > gap_us. Merging the whole batch into one span —
        # the round-8 shape — silently fused separate sessions whenever
        # one micro-batch carried a key's rows across a gap (with
        # availableNow over one file, i.e. one batch, EVERY gap was
        # fused; found by the round-9 stream-vs-batch certificate).
        cut = [0]
        for i in range(1, len(ts_us)):
            if ts_us[i] - ts_us[i - 1] > gap_us:
                cut.append(i)
        cut.append(len(ts_us))
        spans = [
            (
                int(ts_us[a]),
                int(ts_us[b - 1]),
                b - a,
                float(vals[a:b].sum()),
            )
            for a, b in zip(cut[:-1], cut[1:])
        ]
        if state.exists:
            prev = tuple(state.get)
            first = spans[0]
            if first[0] - prev[1] > gap_us:
                spans.insert(0, prev)
            else:
                # overlap/adjacent: fold the carried state into span 0
                spans[0] = (
                    min(prev[0], first[0]),
                    max(prev[1], first[1]),
                    prev[2] + first[2],
                    prev[3] + first[3],
                )
        closed, last = spans[:-1], spans[-1]
        state.update(last)
        set_timeout(state, last[1])
        if closed:
            yield emit(key, closed)
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
