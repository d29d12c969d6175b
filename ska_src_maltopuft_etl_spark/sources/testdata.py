"""Readers for the star-schema test tables (TESTDATA.md).

One parquet file per table under ``<sf_dir>/``. The only normalization
applied is nanosecond-timestamp repair: parquet TIMESTAMP(NANOS) columns
(written by pandas/arrow) are not a legal Spark type, so the session reads
them as long nanos (``spark.sql.legacy.parquet.nanosAsLong``) and this
loader converts them back to microsecond ``TimestampType`` — the same
truncation DuckDB applies, keeping the oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) in the test parquet, surfaced as
# long nanos by the legacy reader conf.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


#: Session-scoped LAZY-PLAN memo: (applicationId, sf_dir, table) → the
#: analyzed DataFrame. DataFrames are immutable plan handles — sharing
#: one caches NO data and NO results; every action still scans the
#: parquet from disk. What it removes is the repeated driver-side read
#: setup (footer/schema fetch, conf round-trips, the nanos-repair
#: re-analysis) that multi-query sessions otherwise pay per query —
#: measured ~0.09 s/call × ~350 calls per battery. Same spirit as
#: Spark's own FileStatusCache (guide §6): metadata reuse, not result
#: caching. Assumes table files are immutable for the session lifetime
#: (true for the bench/oracle/test drivers); entries die with the app.
_PLAN_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    memo = _PLAN_MEMO.get(key)
    if memo is not None:
        return memo
    # Defensive: callers (e.g. the external verify driver) may hand us a
    # session without the engine defaults; both confs are runtime-settable
    # and required for correct reads/parses of these tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, ()):
        field = dict(df.dtypes).get(col)
        if field == "bigint":
            # integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed the
            # double-exact range, so float division is off by ±1 µs.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Naive parquet timestamps (TIMESTAMP(MICROS, isAdjustedToUTC=false))
    # scan as TIMESTAMP_NTZ; normalize to session-TZ TimestampType (UTC
    # session, so wall-clock is preserved) so downstream kernels like
    # unix_micros/mjd work uniformly regardless of how the data was written.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _PLAN_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
