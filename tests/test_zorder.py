"""Z-order layout (sinks/zorder.py): the clustered layout must let a
range predicate on EITHER dimension prune most files, where a
linear-sort layout only prunes on its sort column."""

from __future__ import annotations

from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.sinks import zorder

N_FILES = 16


def _touched(spark, path, col, lo, hi) -> int:
    """Files a [lo, hi] range predicate on col would have to read."""
    stats = zorder.file_skipping_stats(spark, path, col).collect()
    assert len(stats) == N_FILES
    return sum(1 for r in stats if r["v_max"] >= lo and r["v_min"] <= hi)


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    # two independent uniform dimensions, deterministic (hash-derived)
    df = (
        spark.range(40_000)
        .withColumn("x", F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .withColumn("y", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)))
    )
    linear, zpath = str(tmp_path / "linear"), str(tmp_path / "zorder")
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    zorder.zorder_write(df, zpath, ["x", "y"], n_files=N_FILES, bits=8)

    # a 5%-selectivity band on each dimension
    lin_x = _touched(spark, linear, "x", 4000, 4500)
    lin_y = _touched(spark, linear, "y", 4000, 4500)
    z_x = _touched(spark, zpath, "x", 4000, 4500)
    z_y = _touched(spark, zpath, "y", 4000, 4500)

    # linear layout: perfect on x, useless on y
    assert lin_x <= 2
    assert lin_y == N_FILES
    # z-order: prunes meaningfully on BOTH dimensions. Bound has one
    # file of headroom over the typical 8: repartitionByRange picks
    # boundaries by SAMPLING with a seed derived from the RDD id, which
    # depends on session history — under the full suite the layout can
    # shift by one file vs a fresh session (observed 9 once in-suite,
    # 8 standalone). The operator's guarantee is statistical.
    assert z_x <= N_FILES // 2 + 2
    assert z_y <= N_FILES // 2 + 2
    # and never worse than reading everything
    assert z_x + z_y < lin_x + lin_y


def test_zorder_key_width_validation(spark):
    df = spark.range(10).withColumn("x", F.col("id"))
    try:
        zorder.zorder_key(df, ["id", "x"], bits=32)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(5_000).withColumn(
        "x", F.pmod(F.xxhash64("id"), F.lit(1000))
    )
    path = str(tmp_path / "z")
    zorder.zorder_write(df, path, ["id", "x"], n_files=8, bits=6)
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    assert back.agg(F.sum("id")).collect()[0][0] == 5_000 * 4_999 // 2
