"""Python UDTFs — the table-function surface.

The reference's UDF inventory is scalar-only (SURVEY.md §2.10: "no
UDAFs and no UDTFs"); this module completes the surface on the Spark
side with a lateral-joinable table function, registered for SQL use.

Hot-path note (the same rule as everywhere in this engine): a Python
UDTF is row-at-a-time Python — for segmentation that a native
expression can express, prefer ``explode(split(...))`` (JVM,
whole-stage codegen). :func:`sentences_native` is that equivalent, and
the test suite asserts both produce identical rows. The UDTF form
earns its keep when per-row expansion needs real Python (a tokenizer
library, a parser) — the multimodal decode path's row-generating
sibling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["SplitSentences", "register_table_functions", "sentences_native"]


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """Expand a text column into (pos, sentence) rows, splitting on
    '.' and dropping empty segments — LATERAL-joinable from SQL."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text:
            parts = (p.strip() for p in text.split("."))
            for i, s in enumerate(p for p in parts if p):
                yield i, s


def register_table_functions(spark: SparkSession) -> None:
    """Register all table functions with the session catalog (SQL:
    ``SELECT s.* FROM docs, LATERAL split_sentences(text) s``)."""
    spark.udtf.register("split_sentences", SplitSentences)


def sentences_native(text: Column) -> Column:
    """JVM-side equivalent of :class:`SplitSentences` for hot paths:
    an array of (pos, sentence) structs to ``explode``. Uses the same
    split/trim/drop-empty semantics."""
    trimmed = F.filter(
        F.transform(F.split(text, "\\."), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return F.transform(
        trimmed,
        lambda s, i: F.struct(
            i.cast("int").alias("pos"), s.alias("sentence")
        ),
    )


def split_sentences_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Native-path sentence segmentation: (id, pos, sentence) rows."""
    return df.select(
        F.col(id_col),
        F.explode(sentences_native(F.col(text_col))).alias("__s"),
    ).select(id_col, "__s.pos", "__s.sentence")
