"""Inverted-index sink: build, partition-pruned search, and bit-parity
with the ad-hoc BM25 registry query."""

from __future__ import annotations

from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.sinks.inverted_index import (
    build_inverted_index,
    search_index,
    term_bucket_py,
)
from ska_src_maltopuft_etl_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bucket_functions_agree(spark):
    terms = ["spark", "hash", "window", "merge", "the", "Ünïcode"]
    rows = (
        spark.createDataFrame([(t,) for t in terms], ["term"])
        .select(
            "term",
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % 64
            ).cast("int").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert r["b"] == term_bucket_py(r["term"], 64), r["term"]


def test_search_matches_adhoc_bm25_bit_for_bit(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "idx")
    build_inverted_index(docs, path)

    got = search_index(spark, path, ["spark", "hash", "window"], k=20).collect()

    from ska_src_maltopuft_etl_spark.plans import QUERIES

    want = QUERIES["bm25_keyword_search"].fn(spark, SF).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_search_prunes_partitions(spark, tmp_path):
    import contextlib
    import io

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "idx")
    build_inverted_index(docs, path, n_buckets=64)

    terms = ["spark", "hash"]
    buckets = sorted({term_bucket_py(t, 64) for t in terms})
    pruned = spark.read.parquet(f"{path}/postings").where(
        F.col("term_bucket").isin(buckets)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the bucket predicate is a PARTITION filter (directory-level
    # pruning at file listing), not a row filter after the scan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "term_bucket" in pf_line
    # and the pruned read returns exactly the buckets' rows
    assert pruned.select("term_bucket").distinct().count() == len(buckets)


def test_incremental_update_equals_full_build(spark, tmp_path):
    """Index half the corpus, append the rest (with overlap) in two
    batches — search results must equal a from-scratch full build, and
    re-running a batch must be a no-op."""
    from ska_src_maltopuft_etl_spark.sinks.inverted_index import (
        update_inverted_index,
    )

    docs = load_table(spark, SF, "documents")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)

    inc_path = str(tmp_path / "inc")
    build_inverted_index(first, inc_path)
    n1 = update_inverted_index(second, inc_path)
    assert n1 == second.count()
    # overlap batch: every doc already indexed → no-op
    assert update_inverted_index(docs.limit(50), inc_path) == 0

    full_path = str(tmp_path / "full")
    build_inverted_index(docs, full_path)

    terms = ["spark", "hash", "window"]
    inc = search_index(spark, inc_path, terms, k=20).collect()
    full = search_index(spark, full_path, terms, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in inc] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_streaming_index_maintenance(spark, tmp_path):
    """foreachBatch maintenance: streamed files land in the index; the
    search result equals a batch build over the same docs."""
    from ska_src_maltopuft_etl_spark.sinks.inverted_index import (
        run_index_maintenance_stream,
    )

    docs = load_table(spark, SF, "documents").limit(100).localCheckpoint()
    data = str(tmp_path / "docs_in")
    docs.select("doc_id", "text").write.parquet(data)

    idx = str(tmp_path / "idx")
    build_inverted_index(docs.limit(0), idx)  # empty seed index

    stream = spark.readStream.schema("doc_id long, text string").parquet(data)
    q = run_index_maintenance_stream(
        stream, idx, checkpoint_dir=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    batch_idx = str(tmp_path / "batch_idx")
    build_inverted_index(docs, batch_idx)
    terms = ["spark", "hash"]
    got = search_index(spark, idx, terms, k=10).collect()
    want = search_index(spark, batch_idx, terms, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_hot_bucket_compaction_preserves_search(spark, tmp_path):
    """Many small appends fragment hot term-bucket directories; the
    compaction sink rewrites one bucket dir in place (partition value
    is directory-encoded, so inner files keep their columns) and
    search results must be unchanged with fewer files."""
    import glob

    from ska_src_maltopuft_etl_spark.sinks.compaction import compact_parquet
    from ska_src_maltopuft_etl_spark.sinks.inverted_index import (
        update_inverted_index,
    )

    docs = load_table(spark, SF, "documents").localCheckpoint()
    path = str(tmp_path / "idx")
    build_inverted_index(docs.where(F.col("doc_id") < 100), path)
    # fragment the index with several small appends
    for lo in range(100, 400, 100):
        update_inverted_index(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)),
            path,
        )

    terms = ["spark", "hash"]
    before = search_index(spark, path, terms, k=15).collect()

    bucket = term_bucket_py("spark", 64)
    bucket_dir = f"{path}/postings/term_bucket={bucket}"
    n_before = len(glob.glob(f"{bucket_dir}/*.parquet"))
    n_files = compact_parquet(spark, bucket_dir, target_file_mb=256)
    n_after = len(glob.glob(f"{bucket_dir}/*.parquet"))
    assert n_after == n_files <= 1 < n_before

    after = search_index(spark, path, terms, k=15).collect()
    assert [(r["doc_id"], r["score"]) for r in before] == [
        (r["doc_id"], r["score"]) for r in after
    ]
