"""Parquet checkpoint memoization (SURVEY.md §2.1 S7).

The reference wraps every expensive parse in ``read_or_parse_parquet``:
if the stage output exists on disk, read it; otherwise compute and
persist (meertrap/meertrap.py:33-67). Same contract here, Spark-native —
also the pattern for cross-run idempotency on a cluster (stage outputs
live on shared storage, re-runs skip completed stages).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def read_or_create_parquet(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    compression: str = "gzip",
) -> DataFrame:
    """Return the checkpoint at ``path`` if present, else build, write,
    and re-read (re-reading pins the schema/stats to the materialized
    file, exactly like the reference's cache-hit path)."""
    try:
        return spark.read.parquet(path)
    except Exception:
        pass
    df = build()
    df.write.mode("overwrite").option("compression", compression).parquet(path)
    return spark.read.parquet(path)
