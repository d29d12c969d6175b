#!/usr/bin/env python
"""HOF call-site audit (round-10 VERDICT item #9, r8 brief #6).

Lambda-based higher-order functions (``aggregate``/``transform``/
``filter``/``zip_with``) never enter whole-stage codegen — they run
interpreted per element. Round 7 measured a 46× tax on the simhash
vote fold and fixed it with Arrow; this audit times the REMAINING
hot-path HOF expressions against native-function rewrites, with the
noop-sink metric, so each call site carries a measured verdict instead
of a suspicion. Fix policy (r8 brief): rewrite only what's >1.5×; a
rewrite ships with a hypothesis parity test.

Audited sites (battery queries in parentheses):

- ``stopword_ratio`` / ``quality_score`` (text_quality_scores):
  ``F.filter(tokens, array_contains)`` vs a lookaround
  ``regexp_count`` that counts stopword occurrences without
  tokenizing (lookarounds are zero-width, so consecutive stopwords
  both match — the naive ``' the '`` pattern misses every other one).
- rerank candidate counter (rerank_cross_encoder):
  ``F.size(F.filter(tokens, isin))`` vs lookaround ``regexp_count``.
- ``sum_token_lengths`` (public API, no battery query):
  fold-of-lengths vs ``length(regexp_replace(text, ' ', ''))``.
- embedding mean (embedding_stats): ``aggregate`` fold over a
  64-float array — no native array-mean exists; measured for the
  record.
- cosine dot product (knn/`similarity.dot`): ``aggregate(zip_with)``
  over 64 floats — the ANN hot path; measured for the record.

Usage: python tools/hof_audit.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ska_src_maltopuft_etl_spark.engine import get_spark  # noqa: E402
from ska_src_maltopuft_etl_spark.operators import text as T  # noqa: E402
from ska_src_maltopuft_etl_spark.sources import load_table  # noqa: E402

STOPS = ("the", "a")


def stopword_ratio_regexp(c, stopwords=STOPS):
    pat = "(?<=^| )(" + "|".join(stopwords) + ")(?= |$)"
    n_stop = F.regexp_count(c, F.lit(pat))
    return n_stop.cast("double") / T.token_count_ws(c).cast("double")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="hof_audit", conf={"spark.ui.enabled": "false"})
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    docs.count(), emb.count()  # warm page cache

    def timed(df) -> float:
        best = None
        for _ in range(rounds):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        return best

    txt = F.col("text")
    cases = {
        "tokenize_baseline (split+filter only)": (
            docs.select("doc_id", F.size(T.tokens(txt)).alias("v")),
            None,
        ),
        "stopword_ratio": (
            docs.select("doc_id", T.stopword_ratio(txt, STOPS).alias("v")),
            docs.select("doc_id", stopword_ratio_regexp(txt).alias("v")),
        ),
        "quality_score": (
            docs.select("doc_id", T.quality_score(txt).alias("v")),
            None,  # composition; bound by stopword_ratio above
        ),
        "rerank_hit_count": (
            docs.select(
                "doc_id",
                F.size(
                    F.filter(
                        T.tokens(txt), lambda w: w.isin("spark", "hash", "window")
                    )
                ).alias("v"),
            ),
            docs.select(
                "doc_id",
                F.regexp_count(
                    txt, F.lit("(?<=^| )(spark|hash|window)(?= |$)")
                ).alias("v"),
            ),
        ),
        "sum_token_lengths": (
            docs.select("doc_id", T.sum_token_lengths(txt).alias("v")),
            docs.select(
                "doc_id", F.length(F.regexp_replace(txt, " ", "")).alias("v")
            ),
        ),
        "embedding_mean_fold": (
            emb.select(
                "vec_id",
                (
                    F.aggregate(
                        F.transform(F.col("embedding"), lambda x: x.cast("double")),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    / F.size("embedding")
                ).alias("v"),
            ),
            None,
        ),
        "cosine_dot_fold": (
            emb.alias("a")
            .join(F.broadcast(emb.limit(8).alias("b")))
            .select(
                F.aggregate(
                    F.zip_with(
                        F.col("a.embedding"), F.col("b.embedding"),
                        lambda x, y: x.cast("double") * y.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("v")
            ),
            None,
        ),
    }
    print(f"{'site':42s} {'hof_s':>8s} {'rewrite_s':>10s} {'ratio':>6s}")
    for name, (hof_df, rw_df) in cases.items():
        h = timed(hof_df)
        if rw_df is not None:
            r = timed(rw_df)
            print(f"{name:42s} {h:8.3f} {r:10.3f} {h / r:6.2f}x")
        else:
            print(f"{name:42s} {h:8.3f} {'—':>10s} {'—':>6s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
