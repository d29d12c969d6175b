"""Streaming maintenance of mergeable aggregate state.

Connects ``operators/incremental_agg`` (the commutative-monoid state:
count / sum / sum-of-squares / min / max per group) to Structured
Streaming: each micro-batch's state is merged into a parquet-backed
state table via ``foreachBatch``, so per-group statistics over an
unbounded stream stay queryable at any time with one small scan —
no re-aggregation of history, ever.

Why ``foreachBatch`` + explicit state parquet instead of the built-in
streaming aggregation state store:

- the state is REUSABLE outside the stream (the batch engine's
  ``finalize`` reads the same parquet — one code path for batch
  backfill and streaming tail, the lambda-architecture unification);
- the merge is a pure DataFrame job per batch — the same plan at any
  scale, with the shuffle keyed on the (small) group domain rather
  than the raw event volume;
- no state-store retention tuning: the parquet IS the checkpointed
  aggregate, atomically replaced per batch.

Crash consistency: the swap is write-temp → atomic directory rename,
and Structured Streaming's checkpoint replays an unacknowledged batch
on restart — the merge is NOT idempotent per replayed batch (counts
would double), so `epoch_id` is persisted alongside the state and a
replayed epoch is skipped. This is the standard exactly-once
foreachBatch recipe.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ska_src_maltopuft_etl_spark.operators import incremental_agg as ia

__all__ = ["maintain_aggregate_state", "read_finalized"]

_EPOCH_FILE = "_last_epoch"


def _state_dirs(state_path: str) -> tuple[str, str]:
    return os.path.join(state_path, "state"), os.path.join(state_path, "_tmp")


def maintain_aggregate_state(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    state_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Start a stream that folds each micro-batch into the persistent
    aggregate state at ``state_path``.

    Returns the started :class:`StreamingQuery`. Query the live
    statistics at any moment with :func:`read_finalized`.
    """
    cur_dir, tmp_dir = _state_dirs(state_path)
    os.makedirs(state_path, exist_ok=True)
    epoch_file = os.path.join(state_path, _EPOCH_FILE)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(epoch_file):
            with open(epoch_file) as fh:
                if int(fh.read().strip() or -1) >= epoch_id:
                    return  # replayed batch after restart — already merged
        batch_state = ia.aggregate_state(batch_df, group_cols, value_col)
        if os.path.exists(cur_dir):
            existing = spark.read.parquet(cur_dir)
            merged = ia.merge_states(existing, batch_state, group_cols)
        else:
            merged = batch_state
        # materialize BEFORE touching cur_dir (merged reads from it)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp_dir)
        shutil.rmtree(cur_dir, ignore_errors=True)
        os.replace(tmp_dir, cur_dir)
        with open(epoch_file, "w") as fh:
            fh.write(str(epoch_id))

    writer = stream_df.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_finalized(
    spark: SparkSession, state_path: str, group_cols: list[str]
) -> DataFrame:
    """Finalized per-group statistics from the current persisted state —
    a scan of |group domain| rows regardless of how much data the
    stream has absorbed."""
    cur_dir, _ = _state_dirs(state_path)
    return ia.finalize(spark.read.parquet(cur_dir), group_cols)
