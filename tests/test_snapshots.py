"""Versioned snapshot sink (sinks/snapshots.py): atomic publish, time
travel, crash invisibility, rollback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.sinks import snapshots as snap


def test_snapshot_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = snap.write_snapshot(spark.range(10), t)
    v1 = snap.write_snapshot(spark.range(25), t)
    assert (v0, v1) == (0, 1)
    assert snap.snapshot_versions(t) == [0, 1]
    assert snap.read_snapshot(spark, t).count() == 25          # latest
    assert snap.read_snapshot(spark, t, version=0).count() == 10  # travel


def test_uncommitted_write_is_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.write_snapshot(spark.range(5), t)
    # simulate a crashed writer: data directory exists, no manifest
    spark.range(99).write.parquet(os.path.join(t, "snap-00000007"))
    assert snap.snapshot_versions(t) == [0]
    assert snap.read_snapshot(spark, t).count() == 5


def test_rollback_preserves_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.write_snapshot(spark.range(10), t)
    snap.write_snapshot(spark.range(3), t)  # the "bad batch"
    v2 = snap.rollback_snapshot(t, to_version=0)
    assert v2 == 2
    assert snap.read_snapshot(spark, t).count() == 10       # rolled back
    assert snap.read_snapshot(spark, t, version=1).count() == 3  # kept


def test_read_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, t)
    snap.write_snapshot(spark.range(1), t)
    with pytest.raises(ValueError):
        snap.read_snapshot(spark, t, version=7)
    with pytest.raises(ValueError):
        snap.rollback_snapshot(t, to_version=7)


def test_snapshot_content_roundtrip(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    snap.write_snapshot(df, t)
    back = snap.read_snapshot(spark, t)
    assert back.agg(F.sum("x")).collect()[0][0] == 1000 * 999
