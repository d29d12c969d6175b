"""Materialized inverted index: term-bucketed postings with
partition-pruned BM25 querying.

The ad-hoc BM25 query (`plans/textsearch.py:bm25_keyword_search`)
re-derives postings from raw text on every run — right for one-off
analytics, wrong for a serving/repeated-query workload. This sink
materializes the index once:

- ``postings/`` parquet partitioned by ``term_bucket`` (md5-derived,
  so the SAME bucket function is computable driver-side without a
  Spark job) holding (term, doc_id, tf);
- ``doclens/`` parquet of per-document token counts;
- ``stats/`` single-row parquet of corpus size + average length.

A query then touches only its terms' partitions: the bucket ids are
computed on the driver from the query string (hashlib md5 — portable
with Spark's ``md5`` by construction), the partition filter prunes
every other directory at file-listing time, and the surviving scan is
|terms|/|buckets| of the index regardless of corpus size. Scoring is
the same rational-idf BM25 variant as the ad-hoc query, so results are
bit-identical to it — the test asserts exactly that equivalence.

At 100 TB: the build is one explode + one keyed aggregate (map-side
partial tf counts) + a partitioned write; queries are a few-partition
scan + broadcast of the (tiny) df/stats tables. Index maintenance
composes with sinks/snapshots.py (atomic publish) and
sinks/compaction.py (small-file compaction of hot buckets).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.operators import text

__all__ = ["build_inverted_index", "search_index", "term_bucket_py"]


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the Spark-side bucket expression.

    Both take the first 8 hex chars of md5(term) as an integer mod
    ``n_buckets`` — md5 is the only hash both hashlib and Spark
    compute identically (xxhash64 has no portable stdlib twin).
    """
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term: Column | str, n_buckets: int) -> Column:
    c = F.col(term) if isinstance(term, str) else term
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def build_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Materialize postings/doclens/stats under ``path``."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), text.tokens(F.col(text_col)).alias("__t")
    )
    doclens = toks.select("doc_id", F.size("__t").alias("dl"))
    postings = (
        toks.select("doc_id", F.explode("__t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("term_bucket", _term_bucket_col("term", n_buckets))
    )
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    doclens.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{path}/stats"
    )


def search_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the materialized index, pruned to the query terms'
    buckets. Scoring matches `bm25_keyword_search` bit-for-bit (same
    rational idf, same fixed-order per-term sum)."""
    stats = spark.read.parquet(f"{path}/stats")
    n_buckets = stats.select("n_buckets").head()[0]
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        # partition filter first: prunes non-matching bucket dirs at
        # file listing; the term filter then drops same-bucket noise.
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(terms))
        .select("term", "doc_id", F.col("tf").cast("double").alias("tf"))
    )
    doclens = spark.read.parquet(f"{path}/doclens")
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    k1c, bc = F.lit(k1), F.lit(b)
    scored = (
        postings.join(doclens, "doc_id")
        .crossJoin(F.broadcast(stats.select("n", "avgdl")))
        .join(F.broadcast(dfreq), "term")
        .select(
            "doc_id",
            "term",
            (
                ((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
                * (F.col("tf") * (k1c + F.lit(1.0)))
                / (
                    F.col("tf")
                    + k1c
                    * (
                        F.lit(1.0)
                        - bc
                        + bc * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                )
            ).alias("s"),
        )
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
            ).alias(f"__s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = None
    for i in range(len(terms)):
        c = F.col(f"__s{i}")
        total = c if total is None else (total + c)
    return (
        pivoted.select("doc_id", total.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
