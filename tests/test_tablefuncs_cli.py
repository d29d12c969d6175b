"""Table-function surface (functions/tablefuncs.py) and CLI parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.functions import tablefuncs


def test_udtf_lateral_join_from_sql(spark):
    tablefuncs.register_table_functions(spark)
    docs = spark.createDataFrame(
        [(1, "first one. second one."), (2, "only"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("tf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.pos, s.sentence "
        "FROM tf_docs, LATERAL split_sentences(text) s "
        "ORDER BY doc_id, s.pos"
    ).collect()
    assert [(r["doc_id"], r["pos"], r["sentence"]) for r in rows] == [
        (1, 0, "first one"),
        (1, 1, "second one"),
        (2, 0, "only"),
    ]


def test_native_path_matches_udtf(spark):
    tablefuncs.register_table_functions(spark)
    docs = spark.createDataFrame(
        [(1, "a. b.c . "), (2, "x"), (3, "...")],
        "doc_id long, text string",
    )
    native = {
        (r["doc_id"], r["pos"], r["sentence"])
        for r in tablefuncs.split_sentences_df(docs, "doc_id", "text").collect()
    }
    docs.createOrReplaceTempView("tf_docs2")
    via_udtf = {
        (r["doc_id"], r["pos"], r["sentence"])
        for r in spark.sql(
            "SELECT doc_id, s.pos, s.sentence "
            "FROM tf_docs2, LATERAL split_sentences(text) s"
        ).collect()
    }
    assert native == via_udtf and len(native) == 4


def test_cli_parser_and_layout_commands(tmp_path):
    from ska_src_maltopuft_etl_spark.cli import build_parser, main

    p = build_parser()
    ns = p.parse_args(["meertrap", "/data", "--incremental"])
    assert ns.command == "meertrap" and ns.incremental

    # clean-empty runs end-to-end without Spark
    d = tmp_path / "cands" / "empty_dir"
    d.mkdir(parents=True)
    rc = main(["clean-empty", str(tmp_path / "cands")])
    assert rc == 0
    assert not d.exists()
