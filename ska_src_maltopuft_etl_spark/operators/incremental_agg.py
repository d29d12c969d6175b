"""Incremental aggregate maintenance over mergeable state.

The reference recomputes every aggregate from raw inputs on each run
(meertrap/meertrap.py stage functions re-parse and re-aggregate the
whole partition directory). At 100 TB a full rescan per batch is the
dominant cost, so this module keeps a small per-group STATE table of
mergeable partial aggregates — the classic commutative-monoid
decomposition (count/sum/min/max, plus sum-of-squares for variance):

- ``aggregate_state(batch)``        → state rows for one batch
- ``merge_states(state, batch_st)`` → state ⊕ batch_state (one groupBy)
- ``finalize(state)``               → the user-facing aggregate values

Invariant: ``finalize(merge_states(aggregate_state(A), aggregate_state(B)))
== finalize(aggregate_state(A ∪ B))`` for disjoint batches — verified by
`tests/test_operators.py::test_incremental_agg_matches_full_recompute`
and the `incremental_agg_events` oracle query (Spark runs the two-batch
merge path; DuckDB aggregates the union directly).

Scale posture: state size is O(groups), not O(rows) — each batch costs
one scan of the BATCH plus a groupBy on the (small) state union. The
merge is associative, so k batches can also be merged tree-wise. All
stages are plain DataFrame ops: map-side partial aggregation applies to
every batch scan, and the state merge shuffles only `groups` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state columns appended to the group key
STATE_COLS = ("cnt", "cnt_nonnull", "s", "s2", "mn", "mx")


def aggregate_state(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable partial-aggregate state for one batch."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(v).alias("cnt_nonnull"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("s2"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_states(
    state: DataFrame, batch_state: DataFrame, group_cols: list[str]
) -> DataFrame:
    """state ⊕ batch_state: union then re-reduce with the monoid ops.

    Sums of counts/sums, min of mins, max of maxes — associative and
    commutative, so any merge tree over any batch partitioning yields
    identical state.
    """
    u = state.select(state.columns).unionByName(
        batch_state.select(state.columns)
    )
    return u.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("cnt_nonnull").alias("cnt_nonnull"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """User-facing aggregates from state: count / sum / mean / min /
    max / population variance. Variance uses the textbook
    E[x²] − E[x]² form — adequate at aggregate-state magnitudes and,
    more importantly, bit-reproducible across engines when rounded."""
    nn = F.col("cnt_nonnull")
    mean = F.col("s") / nn
    var = F.col("s2") / nn - mean * mean
    return state.select(
        *group_cols,
        F.col("cnt").alias("n_rows"),
        F.col("s").alias("value_sum"),
        F.when(nn > 0, mean).alias("value_mean"),
        F.when(nn > 0, var).alias("value_var"),
        F.col("mn").alias("value_min"),
        F.col("mx").alias("value_max"),
    )
