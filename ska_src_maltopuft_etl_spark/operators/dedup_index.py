"""Incremental near-duplicate index: dedup new batches against an
ever-growing corpus without re-shingling the corpus.

The batch analogue of the reference's idempotent re-run model (content
dedup on every run, observation/extract.py:60-77) lifted to near-dup
semantics: persist per-document MinHash *band hashes* once, and on each
new batch join the batch's bands against the stored bands — candidate
generation cost is O(batch) + an equi-join against the index, never a
re-scan of the corpus text.

Design for 100 TB:

- The index is a plain parquet table (doc_id, band, band_hash),
  ~num_bands rows per document — a few dozen bytes/doc, 4-5 orders of
  magnitude smaller than the corpus text.
- `update` appends only NEW docs' bands (anti-join on doc_id), so
  re-running a batch is a no-op — same contract as
  `sinks.incremental_load`.
- The candidate join is keyed on (band, band_hash): uniform short keys,
  broadcast-able batch side, AQE-splittable if a band bucket is hot
  (boilerplate documents).
- Exact verification of candidates stays the caller's choice (join the
  candidate ids back to text and run `jaccard_pairs`), keeping this
  module free of any text re-processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.operators.similarity import (
    minhash_signatures,
    ngram_shingles,
)


def band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """(id, band, band_hash) for each document — the index payload."""
    sh = ngram_shingles(docs, id_col, text_col, n=n, distinct=False)
    sigs = minhash_signatures(sh, id_col, num_hashes=num_hashes)
    nb = band_size
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor(F.size("signature") / nb).cast("int") - 1
                ),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("signature"), b * nb + 1, nb))
                ),
            )
        ).alias("band", "band_hash"),
    )


class NearDupIndex:
    """Parquet-backed incremental LSH index.

    >>> idx = NearDupIndex(spark, "/lake/neardup_index")
    >>> cands = idx.candidates(new_docs)    # vs indexed corpus + in-batch
    >>> idx.update(new_docs)                # append new docs' bands
    """

    def __init__(self, spark: SparkSession, path: str, **params) -> None:
        self.spark = spark
        self.path = path
        self.params = params

    def _bands(self, docs: DataFrame) -> DataFrame:
        return band_table(docs, **self.params)

    def _existing(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None

    def candidates(self, docs: DataFrame) -> DataFrame:
        """Candidate near-dup pairs (doc_a, doc_b): batch-vs-index and
        batch-vs-batch. ``doc_b`` is always the batch side; ``doc_a``
        is an indexed doc or an earlier-id batch doc."""
        batch = self._bands(docs)
        existing = self._existing()
        id_col = self.params.get("id_col", "doc_id")
        a = (
            existing.union(batch) if existing is not None else batch
        ).select(F.col(id_col).alias("doc_a"), "band", "band_hash")
        b = batch.select(F.col(id_col).alias("doc_b"), "band", "band_hash")
        return (
            a.join(b, ["band", "band_hash"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )

    def update(self, docs: DataFrame) -> int:
        """Append bands for docs not already indexed; returns the
        number of newly indexed documents. Re-running the same batch is
        a no-op (anti-join on the id), matching incremental_load's
        re-run contract."""
        batch = self._bands(docs)
        id_col = self.params.get("id_col", "doc_id")
        existing = self._existing()
        if existing is not None:
            seen = existing.select(id_col).distinct()
            batch = batch.join(seen, id_col, "left_anti")
        # localCheckpoint: the append below reads self.path, which
        # `_existing` lineage also scans — materialize first so the
        # write doesn't race its own input scan. Lazy: the n_new count
        # below is the first action and materializes the pin (eager=True
        # ran the identical computation in an extra prior job — r14/r15
        # checkpoint-conversion discipline).
        batch = batch.localCheckpoint(eager=False)
        n_new = batch.select(id_col).distinct().count()
        if n_new:
            batch.write.mode("append").parquet(self.path)
        return n_new
