"""Streaming candidate ingestion: SPCCL arrival stream → beam-resolved
candidate rows.

The batch pipeline resolves each candidate's beam with the backward
as-of join (plans/meertrap/candidate.py). Streams can't run window
functions, so the idiomatic composition is ``foreachBatch``: each
micro-batch is a bounded DataFrame that reuses the *batch* operator
verbatim against the (slowly-changing, broadcastable) beam/observation
dimension. Exactly-once lands on the idempotent merge sink — the same
recipe the reference achieves with re-runs + ON CONFLICT.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ska_src_maltopuft_etl_spark import functions as K
from ska_src_maltopuft_etl_spark.operators import asof_join_backward
from ska_src_maltopuft_etl_spark.sources.spccl import SPCCL_SCHEMA


def stream_spccl(spark: SparkSession, directory: str) -> DataFrame:
    """File-arrival stream of SPCCL candidate lines (streaming S5)."""
    raw = (
        spark.readStream.schema(SPCCL_SCHEMA)
        .option("sep", "\t")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*spccl*")
        .option("maxFilesPerTrigger", "1000")
        .csv(directory)
        .withColumn("__path", F.input_file_name())
    )
    cand_dir = F.regexp_extract(F.col("__path"), r"([^/]+)/[^/]+$", 1)
    return raw.select(
        F.concat_ws("/", cand_dir, F.regexp_extract(F.col("__path"), r"([^/]+)$", 1)).alias(
            "filename"
        ),
        F.col("mjd").alias("cand_mjd"),
        F.col("dm").alias("cand_dm"),
        F.col("snr").alias("cand_snr"),
        F.col("width").alias("cand_width"),
        F.col("beam").alias("cand_beam"),
        (F.col("beam_mode") == "C").alias("cand_coherent"),
        K.mjd_to_timestamp(F.col("mjd")).alias("cand_observed_at"),
    )


def resolve_beams_stream(
    spark: SparkSession,
    directory: str,
    beam_obs: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the stream: per micro-batch, run the batch as-of join
    against ``beam_obs`` and hand the resolved frame to ``sink``.

    ``beam_obs`` is the (beam_number, beam_coherent, obs_t_min, beam_id)
    dimension from the observation transform — dimension-sized, so the
    per-batch join broadcasts it.
    """
    stream = stream_spccl(spark, directory)
    right = beam_obs.select(
        F.col("beam_number").alias("cand_beam"),
        F.col("beam_coherent").alias("cand_coherent"),
        "obs_t_min",
        "beam_id",
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        withround = batch_df.withColumn(
            "__obs_round", K.round_timestamp_seconds("cand_observed_at")
        )
        resolved = asof_join_backward(
            withround,
            right,
            left_on="__obs_round",
            right_on="obs_t_min",
            by=["cand_beam", "cand_coherent"],
            right_tiebreak=["beam_id"],
        ).drop("__obs_round", "obs_t_min")
        sink(resolved, batch_id)

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
