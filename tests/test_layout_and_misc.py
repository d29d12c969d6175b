"""Tests for layout CLIs (O4), checkpoint memoization (S7), and the
salted join."""

from __future__ import annotations

import json
import tarfile

from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.operators.skew import salted_join
from ska_src_maltopuft_etl_spark.sources.checkpoint import read_or_create_parquet
from ska_src_maltopuft_etl_spark.sources.layout import (
    delete_empty_candidate_dirs,
    reorganise_candidate_dirs,
    untar_directory,
)


def test_untar_and_reorg_and_cleanup(tmp_path):
    # build a tarball holding one candidate dir
    src = tmp_path / "incoming"
    payload = tmp_path / "payload" / "tpn-0-37_1700000000"
    payload.mkdir(parents=True)
    (payload / "x_run_summary.json").write_text(
        json.dumps({"sb_details": {"actual_start_time": "2023-11-20 21:37:42.000+00:00"}})
    )
    src.mkdir()
    with tarfile.open(src / "batch1.tar.gz", "w:gz") as tf:
        tf.add(payload, arcname="tpn-0-37_1700000000")
    data = tmp_path / "data"
    roots = untar_directory(src, data)
    assert len(roots) == 1
    # flatten extraction root into data dir layout
    extracted = roots[0] / "tpn-0-37_1700000000"
    extracted.rename(data / "tpn-0-37_1700000000")
    roots[0].rmdir()

    moved = reorganise_candidate_dirs(data)
    assert moved == {"2023-11-20": ["tpn-0-37_1700000000"]}
    assert (data / "2023-11-20" / "tpn-0-37_1700000000" / "x_run_summary.json").exists()

    (data / "empty1" / "empty2").mkdir(parents=True)
    removed = delete_empty_candidate_dirs(data)
    assert any("empty2" in r for r in removed) and any("empty1" in r for r in removed)


def test_read_or_create_parquet(spark, tmp_path):
    path = str(tmp_path / "ckpt.parquet")
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    a = read_or_create_parquet(spark, path, build)
    b = read_or_create_parquet(spark, path, build)
    assert a.count() == 5 and b.count() == 5
    assert len(calls) == 1  # second read memoized


def test_salted_join_matches_plain_join(spark):
    # skewed large side: 90% of rows share key 1
    large = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(1, "hot"), (10, "cold"), (999, "miss")], "k long, v string")
    plain = large.join(small, "k").groupBy("v").count().collect()
    salted = salted_join(large, small, "k", salt_buckets=8).groupBy("v").count().collect()
    assert sorted((r["v"], r["count"]) for r in plain) == sorted(
        (r["v"], r["count"]) for r in salted
    )


def test_bucketed_join_no_exchange(spark, tmp_path):
    import contextlib
    import io

    from ska_src_maltopuft_etl_spark.sinks.bucketed import write_bucketed

    orders = spark.range(10_000).selectExpr("id as o_orderkey", "id % 997 as o_custkey")
    lineitem = spark.range(30_000).selectExpr(
        "id % 10000 as l_orderkey", "id as l_qty"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8)
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # bucketed both sides on the join key → SMJ with no shuffle
        assert "SortMergeJoin" in plan
        assert not any(
            line.strip().startswith("(") and ") Exchange" in line
            for line in plan.splitlines()
        ), plan
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_write_clears_orphaned_location(spark):
    """A run killed between writing table files and committing the catalog
    entry leaves the warehouse dir on disk with no table; overwrite-mode
    write_bucketed must clear the orphan instead of failing with
    LOCATION_ALREADY_EXISTS."""
    import os
    from urllib.parse import urlparse

    from ska_src_maltopuft_etl_spark.sinks.bucketed import write_bucketed

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(warehouse, "b_orphan_tbl")
    os.makedirs(os.path.join(orphan, "leftover"), exist_ok=True)
    try:
        df = spark.range(100).selectExpr("id as k", "id * 2 as v")
        write_bucketed(df, "b_orphan_tbl", ["k"], num_buckets=4)
        assert spark.table("b_orphan_tbl").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orphan_tbl")


def test_partition_pruned_scan(spark, tmp_path):
    """Hive-partitioned layout (O1): a date filter must prune partitions
    at the scan, not filter rows post-hoc."""
    import contextlib
    import io

    from ska_src_maltopuft_etl_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_partitioned")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).parquet(path)
    back = spark.read.parquet(path).where(F.col("day") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "day" in pf_line
    assert back.count() > 0
    assert back.select("day").distinct().count() == 1


def test_sql_frontend_over_pipeline_outputs(spark, tmp_path):
    """The reference's post-load SQL surface: register pipeline outputs
    as views and run the documented smoke query via spark.sql."""
    from ska_src_maltopuft_etl_spark.engine.catalog import register_tables
    from ska_src_maltopuft_etl_spark.plans.meertrap import meertrap_run
    from tests.test_meertrap_pipeline import OBS, run_summary, spccl_line, mjd
    import datetime as dt
    import json

    data = tmp_path / "d"
    sb, start, stop = OBS[0]
    d = data / "tpn-0-37_1700000000"
    d.mkdir(parents=True)
    (d / "t0_tpn-0-37_run_summary.json").write_text(
        json.dumps(run_summary(sb, start, stop, "tpn-0-37"))
    )
    (d / "candA_beam.spccl.log").write_text(
        spccl_line(mjd(start + dt.timedelta(seconds=5)), 1.0, 2.0, 3.0, 0, "C",
                   "4:40:17.07", "-43:33:09.0")
    )
    tables = meertrap_run(spark, str(data), partition_key="x")
    register_tables(spark, tables)
    rows = spark.sql("SELECT * FROM sp_candidate LIMIT 1").collect()
    assert len(rows) == 1


def test_jaccard_doc_frequency_cap(spark):
    from ska_src_maltopuft_etl_spark.operators import similarity

    docs = spark.createDataFrame(
        [
            (1, "common common common unique1 unique1 unique1"),
            (2, "common common common unique2 unique2 unique2"),
            (3, "common common common unique1 unique1 unique1"),
        ],
        "doc_id long, text string",
    )
    sh = similarity.ngram_shingles(docs, "doc_id", "text", n=3)
    # uncapped: every pair shares the 'common common common' shingle
    full = similarity.jaccard_pairs(sh, "doc_id", min_intersection=1)
    assert full.count() == 3
    # df cap 2 drops the boilerplate shingle; only the true duplicate
    # pair (1,3) survives
    capped = similarity.jaccard_pairs(sh, "doc_id", min_intersection=1,
                                      max_doc_frequency=2)
    rows = capped.collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(1, 3)}
    assert rows[0]["jaccard"] == 1.0


def test_cli_parser():
    from ska_src_maltopuft_etl_spark.cli import build_parser

    p = build_parser()
    a = p.parse_args(["meertrap", "/data/x", "--output", "/out", "--no-validate",
                      "--incremental", "--partition-key", "2023-11-20"])
    assert a.command == "meertrap" and a.no_validate and a.incremental
    a = p.parse_args(["untar", "src", "dst", "--remove-archives"])
    assert a.command == "untar" and a.remove_archives
    a = p.parse_args(["reorg", "/data"])
    assert a.command == "reorg"


def test_format_roundtrips(spark, tmp_path):
    from ska_src_maltopuft_etl_spark.sinks.formats import read_table, write_table
    from ska_src_maltopuft_etl_spark.sources import load_table

    orig = load_table(spark, "/root/testdata/sf0.001", "nation")
    baseline = sorted(tuple(r) for r in orig.collect())
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"nation_{fmt}")
        write_table(orig, path, fmt)
        back = read_table(spark, path, fmt, schema=orig.schema)
        assert sorted(tuple(r) for r in back.collect()) == baseline, fmt


def test_ngram_shingles_short_documents(spark):
    # docs shorter than n tokens must yield zero shingles, not crash
    # (sequence(0, size-n) with size<n counts DOWN -> element_at OOB)
    from ska_src_maltopuft_etl_spark.operators.similarity import (
        jaccard_pairs,
        ngram_shingles,
    )

    d = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "only two"), (4, "now three tokens"),
         (5, "now three tokens")],
        ["doc_id", "text"],
    )
    for hashed in (False, True):
        sh = ngram_shingles(d, "doc_id", "text", n=3, hashed=hashed)
        got = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
        assert got == {4, 5}
    pairs = jaccard_pairs(
        ngram_shingles(d, "doc_id", "text", n=3, hashed=True),
        "doc_id",
        min_intersection=1,
    ).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(4, 5, 1.0)]


def test_hash_split_partition_invariant(spark):
    # split membership must be a pure function of the key: identical
    # assignment regardless of partitioning or row order
    from pyspark.sql import functions as F

    from ska_src_maltopuft_etl_spark.operators.similarity import md5_hash60

    def assign(df):
        bucket = md5_hash60(F.col("id").cast("string")) % 100
        split = (
            F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        )
        return {r["id"]: r["s"] for r in df.select("id", split.alias("s")).collect()}

    base = spark.range(0, 500)
    a = assign(base)
    b = assign(base.repartition(17).orderBy(F.col("id").desc()))
    assert a == b
    # rough proportions hold (not exact — hash buckets)
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] > 400 and c["val"] + c["test"] > 20


def test_compact_parquet_reduces_files(spark, tmp_path):
    from ska_src_maltopuft_etl_spark.sinks.compaction import compact_parquet

    path = str(tmp_path / "many")
    # 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(path)
    files_before = [p for p in (tmp_path / "many").glob("part-*")]
    assert len(files_before) == 40
    n = compact_parquet(spark, path, target_file_mb=1024)
    assert n == 1
    files_after = [p for p in (tmp_path / "many").glob("part-*")]
    assert len(files_after) == 1
    got = spark.read.parquet(path)
    assert got.count() == 4000
    assert got.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(4000))
    assert not (tmp_path / "many._compacting").exists()
    assert not (tmp_path / "many._pre_compact").exists()


def test_cluster_parquet_nonoverlapping_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    from ska_src_maltopuft_etl_spark.sinks.compaction import cluster_parquet

    path = str(tmp_path / "clust")
    # shuffle ids so the input files have overlapping id ranges
    spark.range(0, 20000).withColumn(
        "shuf", F.xxhash64("id")
    ).orderBy("shuf").drop("shuf").repartition(8).write.parquet(path)
    # force >1 output file via a tiny target size
    n = cluster_parquet(spark, path, ["id"], target_file_mb=0.02)
    files = sorted((tmp_path / "clust").glob("part-*.parquet"))
    assert len(files) >= 2 and len(files) == n
    ranges = []
    for f in files:
        md = pq.read_metadata(str(f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "file key ranges overlap — clustering broken"
    total = sum(
        pq.read_metadata(str(f)).num_rows for f in files
    )
    assert total == 20000


def test_pipeline_config_contract(tmp_path):
    """YAML config twin of reference core/config.py:39-139 — default file
    + override file + CLI overrides, derived paths, unknown-key and
    missing-key failure modes."""
    import pytest

    from ska_src_maltopuft_etl_spark.config import load_config

    default = tmp_path / "config.default.yml"
    default.write_text(
        "data_path: ./data/\n"
        "output_path: {out}\n"
        "save_output: true\n"
        "remote_file_root_path: ./results/data/\n".format(out=tmp_path / "meta")
    )
    cfg = load_config(default_cfg_path=default)
    assert cfg.data_path == __import__("pathlib").Path("./data")
    assert cfg.output_path.exists()  # created eagerly, as the reference does
    assert cfg.output_prefix == ""
    assert cfg.raw_obs_data_path.name == "obs_raw.parquet"

    # cfg file wins over default; CLI overrides win over both.
    override = tmp_path / "config.yml"
    override.write_text("partition_key: 2023-11-20\n")
    cfg = load_config(override, default_cfg_path=default)
    assert cfg.partition_key == "2023-11-20"
    assert cfg.partition_data_path.name == "2023-11-20"
    assert cfg.transformed_cand_data_path.name == "2023-11-20_cand_transformed.parquet"
    cfg = load_config(override, default_cfg_path=default,
                      overrides={"partition_key": "2024-01-01"})
    assert cfg.output_prefix == "2024-01-01_"

    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(default_cfg_path=default, overrides={"outptu_path": "x"})
    with pytest.raises(ValueError, match="missing required"):
        load_config(overrides={"output_path": str(tmp_path)})


def test_cli_meertrap_config_flag(tmp_path):
    from ska_src_maltopuft_etl_spark.cli import build_parser

    p = build_parser()
    ns = p.parse_args(["meertrap", "--config", "cfg/config.yml"])
    assert ns.command == "meertrap" and ns.config and ns.data_dir is None


def test_harness_config_precedence(tmp_path, monkeypatch):
    """env < YAML file < overrides; unknown keys fail loudly."""
    import pytest

    from ska_src_maltopuft_etl_spark.config import load_harness_config

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/env/sf")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUNDS", "9")
    cfg = load_harness_config()
    assert cfg.sf_dir == "/env/sf" and cfg.bench_rounds == 9

    yml = tmp_path / "harness.yml"
    yml.write_text("sf_dir: /file/sf\nqueries: [a, b]\nsweep_sfs: [sf0.01]\n")
    cfg = load_harness_config(yml)
    assert cfg.sf_dir == "/file/sf"          # file beats env
    assert cfg.bench_rounds == 9             # env survives where file silent
    assert cfg.queries == ("a", "b") and cfg.sweep_sfs == ("sf0.01",)

    cfg = load_harness_config(yml, overrides={"sf_dir": "/cli/sf"})
    assert cfg.sf_dir == "/cli/sf"           # overrides beat file

    yml.write_text("sf_dirr: /typo\n")
    with pytest.raises(ValueError, match="unknown harness config keys"):
        load_harness_config(yml)


def test_partitioned_oracle_digest_equals_frame_hash():
    """The sliced oracle's accumulate-then-sort digest must be
    bit-identical to check_correctness.frame_hash on the same rows —
    this identity is what lets a sliced DuckDB run certify the same
    hash a single-shot oracle would (tools/partitioned_oracle.py)."""
    import random

    from tools.check_correctness import frame_hash
    from tools.partitioned_oracle import digest, lines_of

    rng = random.Random(7)
    cols = ["b_id", "a_val", "c_note"]
    rows = [
        (
            rng.randint(0, 50),
            rng.choice([None, rng.random(), float("nan"), 3, -7]),
            rng.choice([None, "x", "y\x1fz", ""]),
        )
        for _ in range(500)
    ]
    # arbitrary uneven slicing of the same multiset
    k1, k2 = rng.randint(1, 499), rng.randint(1, 499)
    lo, hi = min(k1, k2), max(k1, k2)
    slices = [rows[:lo], rows[lo:hi], rows[hi:], []]
    acc: list[str] = []
    for s in slices:
        acc.extend(lines_of(cols, s))
    assert digest(acc) == frame_hash(cols, rows)
