"""Join operators Spark lacks as primitives, built scale-first.

Reference semantics reproduced (SURVEY.md §2.4):

- J5 interval (range) join — reference implements it as a per-row Python
  loop over the parent frame, O(n·m)
  (meertrap/observation/transform.py:203-221,316-321).
- J6 backward as-of join with by-keys — reference uses Polars
  ``join_asof`` (meertrap/candidate/transform.py:107-136).
- J9/F17 key remap with identity fallback — reference uses a driver-side
  dict + per-row ``map_elements`` (core/database_loader.py:182-188).
- J1-J4 cardinality-validated equi-joins — Polars ``validate="1:m"`` etc.
  (meertrap/observation/transform.py:38-104).

Scale notes:

- ``asof_join_backward`` uses the union + last(ignoreNulls) window
  technique: ONE shuffle on the by-keys, no range-join row explosion, no
  broadcast requirement. It scales to arbitrarily large both-sides as long
  as a single (by-key) group's rows fit in an executor's sort spill —
  which Spark handles by external sort. This beats the range-join +
  row_number formulation, whose intermediate blowup is O(matches).
- ``interval_join`` is an equi+range join: with by-keys it is a plain
  shuffled equi-join with a residual range filter; without by-keys the
  small side should be broadcast (the caller passes ``broadcast_right``).
"""

from __future__ import annotations

from typing import Literal, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class CardinalityError(ValueError):
    """Join cardinality validation failed (mirrors Polars ``validate=``)."""


# ---------------------------------------------------------------------------
# As-of join (J6)
# ---------------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[str] = (),
    tolerance_seconds: float | None = None,
    allow_exact_matches: bool = True,
    right_prefix: str = "",
    right_tiebreak: Sequence[str] = (),
    direction: Literal["backward", "forward"] = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``by`` group: the greatest ``right_on`` <= ``left_on`` (backward,
    the default) or the smallest ``right_on`` >= ``left_on`` (forward —
    e.g. "next maintenance window after this candidate"). Forward is
    the same one-shuffle union+window plan with the time order
    reversed; every other knob behaves identically.

    Implementation ("union trick", one shuffle, no row explosion):

    1. Tag right rows with a marker and union both sides on
       (by-keys, event time, marker, payload-struct).
    2. Sort within each by-group by (time, marker) — right rows sort
       before left rows at equal times when ``allow_exact_matches`` —
       and propagate the last non-null right payload with
       ``last(..., ignoreNulls=True)``.
    3. Keep left rows; unpack the propagated right payload.

    All right columns (except the by-keys) come back ``right_prefix``-ed;
    rows with no match get NULLs (left-join semantics, matching Polars
    ``join_asof``). ``tolerance_seconds`` drops matches older than the
    tolerance (timestamps only). ``right_tiebreak`` columns make the
    winner among equal-``right_on`` right rows deterministic (the row
    with the greatest tiebreak value wins).

    NULL semantics — a deliberate divergence from Polars: this operator
    uses SQL equi-join NULL semantics for the ``by`` keys (a NULL by-key
    matches nothing, on either side; NULL-keyed/NULL-time right rows are
    dropped pre-union, NULL-keyed left rows come back unmatched). Polars
    ``join_asof`` groups by-keys groupby-style, where NULL by-keys on
    both sides fall into the same group and CAN match each other. The
    reference pipeline never exercises the difference (its beam /
    coherent-beam keys are validated non-null upstream,
    meertrap/candidate/transform.py:107-136); SQL semantics are the
    consistent choice next to every other join in this module.
    """
    by = list(by)
    lcols = left.columns
    rcols = [c for c in right.columns if c not in by]
    out_rcols = {c: f"{right_prefix}{c}" for c in rcols}
    if set(out_rcols.values()) & set(lcols):
        clash = set(out_rcols.values()) & set(lcols)
        raise ValueError(f"right columns clash with left: {sorted(clash)}; pass right_prefix")

    # marker: right=0 sorts before left=1 at equal times → exact matches
    # visible to left rows. With allow_exact_matches=False, invert.
    r_marker, l_marker = (0, 1) if allow_exact_matches else (1, 0)

    # Equi-join NULL semantics (round-12 fuzz hardening): a right row
    # with a NULL event time or NULL by-key can never be "the nearest
    # right row" — drop them before the union, else they sort first in
    # the group (nulls-first) and their payload propagates as a bogus
    # match to every probe before the first real right row. Left rows
    # with NULL keys/times stay (left-join semantics: NULL match) —
    # with rights filtered, their group holds no rights, and the
    # nulls-FIRST placement below makes NULL-time left rows see zero
    # rights in both directions.
    right_ok = F.col(right_on).isNotNull()
    for k in by:
        right_ok = right_ok & F.col(k).isNotNull()
    right = right.where(right_ok)

    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(r_marker).alias("__m"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rpayload"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s")).schema["s"].dataType
        ).alias("__lpayload"),
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__t"),
        F.lit(l_marker).alias("__m"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType
        ).alias("__rpayload"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lpayload"),
    )

    unioned = r_tagged.unionByName(l_tagged)
    w = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
    # forward = backward with the time axis reversed: process greater
    # times first, so "last right seen so far" is the SMALLEST
    # right_on >= left_on. The marker still orders right before left
    # at equal times (exact-match semantics unchanged).
    # nulls FIRST in both directions: a NULL-time left row must be
    # processed before ANY right row so it accumulates no match
    # (Spark's desc default is NULLS LAST, which would hand it the
    # final right row of the scan).
    t_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    order = [t_order, F.col("__m")]
    # equal-time right rows: greatest tiebreak sorts last → wins last().
    order += [F.col(f"__rpayload.{c}").asc_nulls_first() for c in right_tiebreak]
    w = w.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # last(ignoreNulls) skips structs that are NULL; right rows carry a
    # non-null struct, left rows carry NULL __rpayload → wrap so the whole
    # struct is NULL for left rows.
    matched = unioned.withColumn(
        "__match",
        F.last(
            F.when(
                F.col("__rpayload").isNotNull(),
                F.struct(F.col("__t").alias("__rt"), F.col("__rpayload").alias("__rp")),
            ),
            ignorenulls=True,
        ).over(w),
    )

    out = matched.where(F.col("__lpayload").isNotNull())
    if tolerance_seconds is not None:
        gap = (
            F.col("__t").cast("double") - F.col("__match.__rt").cast("double")
            if direction == "backward"
            else F.col("__match.__rt").cast("double") - F.col("__t").cast("double")
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__match")),
        )

    sel: list[Column] = [F.col(f"__lpayload.{c}").alias(c) for c in lcols]
    sel += [F.col(c) for c in by if c not in lcols]
    sel += [F.col(f"__match.__rp.{c}").alias(out_rcols[c]) for c in rcols]
    return out.select(*sel)


def asof_join_backward(*args, **kwargs) -> DataFrame:
    """Alias for :func:`asof_join` with ``direction="backward"`` (the
    reference's semantics, meertrap candidate/transform.py:129-160)."""
    kwargs["direction"] = "backward"
    return asof_join(*args, **kwargs)


def asof_join_forward(*args, **kwargs) -> DataFrame:
    """Alias for :func:`asof_join` with ``direction="forward"``."""
    kwargs["direction"] = "forward"
    return asof_join(*args, **kwargs)


# ---------------------------------------------------------------------------
# Interval join (J5)
# ---------------------------------------------------------------------------

def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    how: Literal["inner", "left"] = "left",
    tie_break: str | None = None,
    tie_break_desc: bool = False,
    broadcast_right: bool = True,
    right_prefix: str = "",
) -> DataFrame:
    """Join each left row to right rows whose [start, end] interval
    contains ``left_ts``; optionally keep one match per left row.

    Reference J5 finds the parent schedule block of each observation with
    a per-row Python filter loop (observation/transform.py:203-221). Here
    it is a declarative non-equi join Catalyst can plan:

    - with ``by`` keys → shuffled equi-join + residual range predicate;
    - without → broadcast-nested-loop; pass ``broadcast_right=True``
      (dimension side small — schedule blocks, in the reference).

    ``tie_break`` picks a single match per left row (row_number == 1 over
    the tie-break ordering), making the operator deterministic when
    intervals overlap.
    """
    by = list(by)
    rcols = [c for c in right.columns if c not in by]
    renamed = right
    for c in rcols:
        renamed = renamed.withColumnRenamed(c, f"{right_prefix}{c}") if right_prefix else renamed
    rstart = f"{right_prefix}{right_start}"
    rend = f"{right_prefix}{right_end}"

    # Internal per-row id so the tie-break window keys on left ROWS, not
    # left values — duplicate left rows must each keep their own match.
    # (The id never leaves the operator, so monotonic non-determinism is
    # harmless.)
    out_cols = list(left.columns)
    left = left.withColumn("__iv_rowid", F.monotonically_increasing_id())

    rhs = F.broadcast(renamed) if broadcast_right else renamed
    cond = (F.col(rstart) <= left[left_ts]) & (F.col(rend) >= left[left_ts])
    for k in by:
        cond = cond & (left[k] == renamed[k])
    joined = left.join(rhs, cond, how)
    if by:
        joined = joined.drop(*[renamed[k] for k in by])

    if tie_break is not None:
        tb = f"{right_prefix}{tie_break}"
        order = F.col(tb).desc_nulls_last() if tie_break_desc else F.col(tb).asc_nulls_last()
        w = Window.partitionBy(F.col("__iv_rowid")).orderBy(order)
        joined = (
            joined.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    out_rcols = [f"{right_prefix}{c}" for c in rcols]
    return joined.select(*out_cols, *out_rcols)


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width_s: int = 86400,
    by: Sequence[str] = (),
    how: Literal["inner", "left"] = "left",
    tie_break: str | None = None,
    tie_break_desc: bool = False,
    right_prefix: str = "",
    force_pairwise: bool = False,
) -> DataFrame:
    """:func:`interval_join` for the case neither side is broadcastable.

    Decision matrix (the J5 family):

    - ALL matches wanted (``tie_break=None``) → this operator. The
      pair blowup IS the answer size; nothing can beat it.
    - ONE best match + arbitrary (nested) intervals → delegated to
      :func:`interval_join_sweep` (this operator does that
      automatically when ``tie_break`` is set — see below).
    - ONE best match + non-nested intervals → :func:`interval_join_asof`
      is cheapest (one window, no explode).
    - dimension-sized right side → plain :func:`interval_join` with
      ``broadcast_right=True``.

    ``tie_break`` guard (round-11 VERDICT "What's wrong" #1): calling
    THIS variant with a ``tie_break`` buys the full per-(key, bucket)
    pair materialization only to throw away all but one row per probe —
    the measured ×10-zipf cliff is 15.3 s here vs 1.6 s for the sweep.
    Since the sweep is semantically identical (and strictly more
    deterministic on ties), a ``tie_break`` call now warns and
    delegates to :func:`interval_join_sweep`. Pass
    ``force_pairwise=True`` to keep the pair-join plan anyway (the
    skew-bench baseline exhibit does, to keep measuring the cliff).

    The plain operator's no-``by``-keys path plans as a
    BroadcastNestedLoopJoin — correct, but only viable while the
    interval side broadcasts; with ``by`` keys it shuffles on those
    keys alone, which degenerates when a key is hot (one user's whole
    history in one task). This variant makes the TIME axis part of the
    shuffle key: timestamps map to ``floor(epoch / width)`` buckets,
    each interval explodes to the buckets it covers, and the join is a
    plain equi-join on (by..., bucket) with the containment predicate
    as a residual. A left row has exactly ONE bucket, so it meets each
    containing interval exactly once — no post-join dedup.

    Cost model: the explode replicates each interval ``span/width + 1``
    times — pick ``bucket_width_s`` near the typical interval span so
    the factor is ~2. Both sides then shuffle uniformly (hot keys
    spread across their time buckets), which is the 100 TB shape: at
    that size the time axis, not the key axis, carries the
    cardinality. Tie-break semantics match :func:`interval_join`.
    """
    if tie_break is not None and not force_pairwise:
        import warnings

        warnings.warn(
            "interval_join_bucketed(tie_break=...) materializes every "
            "(probe, interval) pair before keeping one — delegating to "
            "interval_join_sweep, the pair-free single-best-match "
            "operator (pass force_pairwise=True to override)",
            stacklevel=2,
        )
        return interval_join_sweep(
            left,
            right,
            left_ts=left_ts,
            right_start=right_start,
            right_end=right_end,
            tie_break=tie_break,
            bucket_width_s=bucket_width_s,
            by=by,
            how=how,
            tie_break_desc=tie_break_desc,
            right_prefix=right_prefix,
        )
    by = list(by)
    rcols = [c for c in right.columns if c not in by]
    renamed = right
    if right_prefix:
        for c in rcols:
            renamed = renamed.withColumnRenamed(c, f"{right_prefix}{c}")
    rstart = f"{right_prefix}{right_start}"
    rend = f"{right_prefix}{right_end}"
    width_us = int(bucket_width_s) * 1_000_000

    out_cols = list(left.columns)
    left = left.withColumn("__iv_rowid", F.monotonically_increasing_id())
    lb = left.withColumn(
        "__iv_bucket", F.floor(F.unix_micros(F.col(left_ts)) / F.lit(width_us))
    )
    rb = renamed.withColumn(
        "__iv_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(rstart)) / F.lit(width_us)),
                F.floor(F.unix_micros(F.col(rend)) / F.lit(width_us)),
            )
        ),
    )
    cond = (
        (lb["__iv_bucket"] == rb["__iv_bucket"])
        & (rb[rstart] <= lb[left_ts])
        & (rb[rend] >= lb[left_ts])
    )
    for k in by:
        cond = cond & (lb[k] == rb[k])
    joined = lb.join(rb, cond, how)
    joined = joined.drop(rb["__iv_bucket"]).drop(lb["__iv_bucket"])
    for k in by:
        joined = joined.drop(rb[k])

    if tie_break is not None:
        tb = f"{right_prefix}{tie_break}"
        order = (
            F.col(tb).desc_nulls_last()
            if tie_break_desc
            else F.col(tb).asc_nulls_last()
        )
        w = Window.partitionBy(F.col("__iv_rowid")).orderBy(order)
        joined = (
            joined.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    out_rcols = [f"{right_prefix}{c}" for c in rcols]
    return joined.select(*out_cols, *out_rcols)



def interval_join_sweep(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    tie_break: str,
    bucket_width_s: int = 86400,
    by: Sequence[str] = (),
    how: Literal["inner", "left"] = "left",
    tie_break_desc: bool = True,
    right_prefix: str = "",
) -> DataFrame:
    """Skew-safe single-best-match interval join for ARBITRARY (nested /
    overlapping) right intervals: an ordered merge-scan per
    (by-keys, time-bucket) instead of a pair-producing join.

    Semantics match :func:`interval_join`/``interval_join_bucketed``
    with a ``tie_break``: each left row gets the right interval
    containing ``left_ts`` that wins the tie-break ordering (ties on
    the tie-break value are broken deterministically by greatest
    ``right_start``, then greatest ``right_end`` — the pair-join
    formulations leave such ties to row_number nondeterminism).

    Why it exists (round-10/11 Zipf finding, VERDICT r10 "What's wrong"
    #1): every pair-producing formulation — including the bucketed one —
    pairs each probe with EVERY candidate interval of its (key, bucket)
    before the tie-break dedups, an 8.7-12× intermediate blowup on
    Zipf-hot keys (20.8 s vs the as-of twin's 1.1 s at the ×10-zipf
    tier), and the as-of reduction (:func:`interval_join_asof`) is only
    exact for NON-NESTED intervals. This operator closes the gap:

    1. Intervals explode to the time buckets they cover (sort epoch =
       ``max(start, bucket_start)``, so a copy is active from its
       bucket's first instant); probes carry their single bucket.
    2. One hash shuffle on (by..., bucket) + sortWithinPartitions by
       (group, time, marker) — intervals sort before probes at equal
       times, so ``start <= ts`` is inclusive.
    3. A linear Arrow-batched sweep (``mapInPandas``) walks each sorted
       group once, holding candidate intervals in a max-heap keyed by
       the tie-break. Probes ascend in time, so a heap top whose
       ``end < ts`` is dead FOREVER and is lazily popped; the surviving
       top is exactly the best containing interval. Each interval is
       pushed/popped at most once per bucket copy: O((n+m)·log m) per
       group, ZERO pair materialization, and the group key contains the
       time axis, so a Zipf-hot user's history spreads across its
       buckets instead of one task.

    The sweep is genuinely not expressible in DataFrame ops (dynamic
    ordered state with deletions); per the repo's UDF policy it is an
    Arrow-batched ``mapInPandas`` — the only Python loop is over rows
    already sorted and partitioned JVM-side. For ALL-matches semantics
    (no tie-break) the output IS the pair set — use
    ``interval_join_bucketed``, whose blowup is then the answer size.
    """
    by = list(by)
    if tie_break is None:  # defensive: signature requires it
        raise ValueError("interval_join_sweep picks ONE best match; pass tie_break")
    rcols = [c for c in right.columns if c not in by]
    renamed = right
    if right_prefix:
        for c in rcols:
            renamed = renamed.withColumnRenamed(c, f"{right_prefix}{c}")
    out_rcols = [f"{right_prefix}{c}" for c in rcols]
    rstart = f"{right_prefix}{right_start}"
    rend = f"{right_prefix}{right_end}"
    rtb = f"{right_prefix}{tie_break}"
    width_us = int(bucket_width_s) * 1_000_000

    lcols = list(left.columns)
    if set(out_rcols) & set(lcols):
        clash = set(out_rcols) & set(lcols)
        raise ValueError(
            f"right columns clash with left: {sorted(clash)}; pass right_prefix"
        )
    K = [f"__sw_k{i}" for i in range(len(by))]
    rfields = {f.name: f for f in renamed.schema.fields}
    lfields = {f.name: f for f in left.schema.fields}

    # Probes whose join key or timestamp is NULL can never match — route
    # them around the shuffle entirely (left-join semantics keep them).
    probe_ok = F.col(left_ts).isNotNull()
    for k in by:
        probe_ok = probe_ok & F.col(k).isNotNull()
    probes = left.where(probe_ok).select(
        *[F.col(b).alias(K[i]) for i, b in enumerate(by)],
        F.floor(F.unix_micros(F.col(left_ts)) / F.lit(width_us))
        .cast("long")
        .alias("__sw_b"),
        F.unix_micros(F.col(left_ts)).alias("__sw_t"),
        F.lit(1).alias("__sw_m"),
        F.lit(None).cast("long").alias("__sw_s"),
        F.lit(None).cast("long").alias("__sw_e"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rfields[c].dataType).alias(c) for c in out_rcols],
    )
    ival_ok = F.col(rstart).isNotNull() & F.col(rend).isNotNull()
    for k in by:
        ival_ok = ival_ok & F.col(k).isNotNull()
    ivals = (
        renamed.where(ival_ok)
        .select(
            *[F.col(b).alias(K[i]) for i, b in enumerate(by)],
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(rstart)) / F.lit(width_us)),
                    F.floor(F.unix_micros(F.col(rend)) / F.lit(width_us)),
                )
            ).alias("__sw_b"),
            F.unix_micros(F.col(rstart)).alias("__sw_s"),
            F.unix_micros(F.col(rend)).alias("__sw_e"),
            *[F.col(c) for c in out_rcols],
        )
        .select(
            *K,
            "__sw_b",
            F.greatest(F.col("__sw_s"), F.col("__sw_b") * F.lit(width_us)).alias(
                "__sw_t"
            ),
            F.lit(0).alias("__sw_m"),
            "__sw_s",
            "__sw_e",
            *[F.lit(None).cast(lfields[c].dataType).alias(c) for c in lcols],
            *[F.col(c) for c in out_rcols],
        )
    )
    unioned = ivals.unionByName(probes)
    part_cols = [F.col(c) for c in (*K, "__sw_b")]
    stream = unioned.repartition(*part_cols).sortWithinPartitions(
        *K, "__sw_b", "__sw_t", "__sw_m", "__sw_s", "__sw_e"
    )

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [StructField(c, lfields[c].dataType, True) for c in lcols]
        + [StructField(c, rfields[c].dataType, True) for c in out_rcols]
    )
    n_l, n_r = len(lcols), len(out_rcols)
    tb_idx = out_rcols.index(rtb)
    inner = how == "inner"
    desc = tie_break_desc

    class _Rev:
        """Inverts comparison so heapq (a min-heap) pops the MAX.

        ``__eq__`` is required, not optional: tuple comparison consults
        it before ``__lt__``, and the default identity-``__eq__`` made
        equal tie-break values look UNEQUAL, so heap ordering
        short-circuited at the _Rev element and never fell through to
        the -start/-end tie policy (round-12 interval fuzzer finding:
        desc-ordered equal-tb intervals picked an arbitrary winner
        instead of the documented greatest-start one; asc ordering uses
        the raw value and was always correct).
        """

        __slots__ = ("v",)

        def __init__(self, v):
            self.v = v

        def __lt__(self, other):
            return other.v < self.v

        def __eq__(self, other):
            # Load-bearing invariant: ordkeys only ever compare
            # _Rev-to-_Rev — the null_tb flag ahead of this element in
            # the heap tuple partitions NULL from non-NULL tie-breaks,
            # so tuple comparison never reaches a _Rev with a non-_Rev
            # on the other side. The isinstance guard keeps any future
            # caller outside that invariant on Python's defined
            # NotImplemented path instead of an AttributeError.
            if not isinstance(other, _Rev):
                return NotImplemented
            return self.v == other.v

    def sweep(batches):
        import heapq

        import numpy as np
        import pandas as pd

        group = None
        # (null_flag, ordkey, -start, -end, seq, end, payload): seq is an
        # insertion counter so fully-tied entries never fall through to
        # comparing payload tuples (which may hold None vs value and
        # would raise); among full (tb, start, end) ties the
        # first-encountered interval wins, deterministically per plan.
        heap: list = []
        seq = 0
        none_r = (None,) * n_r
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = [pdf[c].to_numpy() for c in (*K, "__sw_b")]
            # Per-row work is the whole cost of this pass (guide §4.2), so
            # everything O(row × column) happens at C speed per batch:
            # .tolist() converts cells to Python objects once, zip
            # materializes the row tuples once (a per-row generator
            # expression re-pays iterator setup per cell), and the group
            # boundaries come from one vectorized compare per key column
            # instead of building + comparing a key tuple per row. List
            # indexing in the loop beats numpy scalar indexing (which
            # boxes a fresh numpy scalar per access).
            #
            # Rows are split by marker BEFORE tuple materialization
            # (ADVICE r14): an interval row only consumes its right-side
            # payload and a probe row only its left columns, so building
            # both tuple sets for every row threw away half the zip work
            # — interval-heavy batches (the bucket-copy amplification)
            # built left-row tuples that were never read. kind_pos maps
            # a stream index to its row's position within its own kind.
            ts = pdf["__sw_t"].tolist()
            m_np = pdf["__sw_m"].to_numpy() == 0
            ipdf = pdf[m_np]
            ppdf = pdf[~m_np]
            marks = m_np.tolist()  # True = interval copy, False = probe
            kind_pos = np.where(
                m_np, np.cumsum(m_np) - 1, np.cumsum(~m_np) - 1
            ).tolist()
            s_us = ipdf["__sw_s"].tolist()
            e_us = ipdf["__sw_e"].tolist()
            lrows = list(zip(*[ppdf[c].tolist() for c in lcols]))
            rrows = list(zip(*[ipdf[c].tolist() for c in out_rcols]))
            bnd = np.zeros(n, dtype=bool)
            for k in keys:
                np.logical_or(bnd[1:], k[1:] != k[:-1], out=bnd[1:])
            # First row continues the previous batch's group unless its
            # key differs (NaN/NaT keys compare unequal to themselves in
            # both formulations, so they open a new group either way).
            bnd[0] = group is None or tuple(k[0] for k in keys) != group
            group = tuple(k[n - 1] for k in keys)
            newgrp = bnd.tolist()
            out: list[tuple] = []
            out_append = out.append
            heappush, heappop = heapq.heappush, heapq.heappop
            for i in range(n):
                if newgrp[i]:
                    heap.clear()
                t = ts[i]
                p = kind_pos[i]
                if marks[i]:  # interval copy: push candidate
                    payload = rrows[p]
                    tb = payload[tb_idx]
                    null_tb = tb is None or tb != tb  # None/NaN/NaT lose
                    # null tie-breaks get a CONSTANT ordkey (0): they sort
                    # behind every non-null (null_flag=1 first element) and
                    # among themselves by -start; a raw None/NaT ordkey
                    # would raise on comparison.
                    ordkey = 0 if null_tb else (_Rev(tb) if desc else tb)
                    seq += 1
                    e = int(e_us[p])
                    heappush(
                        heap,
                        (null_tb, ordkey, -int(s_us[p]), -e, seq, e, payload),
                    )
                    continue
                # probe: lazily evict heap tops dead at this (ascending) ts
                while heap and heap[0][5] < t:
                    heappop(heap)
                if heap:
                    out_append(lrows[p] + heap[0][6])
                elif not inner:
                    out_append(lrows[p] + none_r)
            if out:
                yield pd.DataFrame(out, columns=[*lcols, *out_rcols])

    matched = stream.mapInPandas(sweep, schema=out_schema)
    if how == "left":
        leftovers = left.where(~F.coalesce(probe_ok, F.lit(False))).select(
            *[F.col(c) for c in lcols],
            *[F.lit(None).cast(rfields[c].dataType).alias(c) for c in out_rcols],
        )
        matched = matched.unionByName(leftovers)
    return matched


def interval_join_asof(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    how: Literal["inner", "left"] = "left",
    right_prefix: str = "",
) -> DataFrame:
    """Skew-proof "latest containing interval" join for NON-NESTED
    right intervals: an as-of backward join on ``right_start`` plus a
    containment filter on ``right_end``.

    Equivalent to :func:`interval_join` with
    ``tie_break=right_start, tie_break_desc=True`` WHENEVER, per
    ``by``-group, no right interval is strictly nested inside another
    (ends non-decreasing in starts — fixed-width windows, the common
    case, always qualify; equal starts are fine, the longest wins).
    Under that condition the latest-started interval at-or-before a
    probe either contains it or nothing does, so picking it first and
    filtering containment after is exact.

    Why it exists (round-10 Zipf-skew finding, SCALING.md): both other
    formulations pair every probe with every candidate interval of the
    same key before the tie-break dedups — on a Zipf-keyed ×10 tier the
    hottest user alone produces tens of millions of intermediate pairs
    and an 8.7× cliff. The as-of plan is one union + one window: the
    hot key costs one sorted partition (O(n log n) rows, zero pair
    blowup), the same shape the certified as-of family already scales
    with.
    """
    p = right_prefix or "__iva_"
    matched = asof_join(
        left,
        right,
        left_on=left_ts,
        right_on=right_start,
        by=by,
        right_prefix=p,
        right_tiebreak=[right_end],
        direction="backward",
    )
    rcols = [c for c in right.columns if c not in by]
    contains = F.col(f"{p}{right_end}") >= F.col(left_ts)
    if how == "inner":
        out = matched.where(contains)
    else:
        out = matched.select(
            *[c for c in left.columns],
            *[
                F.when(contains, F.col(f"{p}{c}")).alias(f"{p}{c}")
                for c in rcols
            ],
        )
    if not right_prefix:
        for c in rcols:
            out = out.withColumnRenamed(f"{p}{c}", c)
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width_s: int = 86400,
    by: Sequence[str] = (),
    right_prefix: str = "",
) -> DataFrame:
    """Interval×interval OVERLAP join (inner): pair every left interval
    with every right interval of the same ``by`` group whose
    [start, end] ranges intersect (closed ends: touching endpoints
    overlap). The interval-point operators (:func:`interval_join`
    family) cannot express this — it is the "sessions × maintenance
    windows" / "annotation spans × document windows" shape.

    Scale design — the dedup-free first-common-bucket trick: both sides
    explode to the time buckets they cover and equi-join on
    (by..., bucket) with the overlap residual, which alone would emit
    each overlapping pair once PER SHARED BUCKET; instead of a
    distinct-shuffle to repair that, the join keeps only the bucket
    containing ``max(left_start, right_start)``. For any overlapping
    pair, max(starts) <= min(ends), so that bucket is covered by BOTH
    intervals and is unique — every overlapping pair emits from exactly
    one bucket, non-overlapping pairs from none. One shuffle, no dedup,
    no window. Cost: each side is replicated span/width + 1 times —
    pick ``bucket_width_s`` near the typical span. Output size is the
    true overlap count (inherent); for Zipf-hot keys the time axis in
    the shuffle key spreads the work exactly as in
    ``interval_join_bucketed``.
    """
    by = list(by)
    rcols = [c for c in right.columns if c not in by]
    renamed = right
    if right_prefix:
        for c in rcols:
            renamed = renamed.withColumnRenamed(c, f"{right_prefix}{c}")
    out_rcols = [f"{right_prefix}{c}" for c in rcols]
    if set(out_rcols) & set(left.columns):
        clash = set(out_rcols) & set(left.columns)
        raise ValueError(
            f"right columns clash with left: {sorted(clash)}; pass right_prefix"
        )
    rstart = f"{right_prefix}{right_start}"
    rend = f"{right_prefix}{right_end}"
    width_us = int(bucket_width_s) * 1_000_000

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__ov_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start)) / F.lit(width_us)),
                    F.floor(F.unix_micros(F.col(end)) / F.lit(width_us)),
                )
            ),
        )

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(renamed, rstart, rend)
    cond = (
        (lb["__ov_bucket"] == rb["__ov_bucket"])
        # overlap: neither interval ends before the other starts
        & (lb[left_start] <= rb[rend])
        & (rb[rstart] <= lb[left_end])
        # first-common-bucket: emit only where max(starts) lands, which
        # both sides cover iff they overlap — exactly-once without dedup
        & (
            lb["__ov_bucket"]
            == F.floor(
                F.greatest(
                    F.unix_micros(lb[left_start]), F.unix_micros(rb[rstart])
                )
                / F.lit(width_us)
            )
        )
    )
    for k in by:
        cond = cond & (lb[k] == rb[k])
    joined = lb.join(rb, cond, "inner")
    joined = joined.drop(rb["__ov_bucket"]).drop(lb["__ov_bucket"])
    for k in by:
        joined = joined.drop(rb[k])
    return joined.select(*left.columns, *out_rcols)


# ---------------------------------------------------------------------------
# Cardinality-validated equi-join (J1-J4)
# ---------------------------------------------------------------------------

def validated_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    expect: Literal["1:1", "1:m", "m:1", "m:m"] = "m:m",
) -> DataFrame:
    """Equi-join with Polars-style ``validate=`` cardinality checking.

    Catalyst has no join-cardinality assertion (SURVEY.md §4.3), so the
    uniqueness of the join keys on the constrained side(s) is checked with
    cheap count-distinct aggregates before joining. Raises
    :class:`CardinalityError` on violation.
    """
    on = [on] if isinstance(on, str) else list(on)

    def _unique(df: DataFrame, side: str) -> None:
        cnt = df.groupBy(*on).count().where(F.col("count") > 1).limit(1).count()
        if cnt:
            raise CardinalityError(
                f"join keys {on} not unique on {side} side (expect={expect})"
            )

    if expect in ("1:1", "1:m"):
        _unique(left, "left")
    if expect in ("1:1", "m:1"):
        _unique(right, "right")
    return left.join(right, on, how)


# ---------------------------------------------------------------------------
# Key remap (J9 / F17)
# ---------------------------------------------------------------------------

def remap_keys(
    df: DataFrame,
    key_col: str,
    keymap: DataFrame,
    old_col: str = "old",
    new_col: str = "new",
    broadcast: bool = True,
) -> DataFrame:
    """Replace ``key_col`` values via a mapping table, keeping the
    original value when unmapped (``mapping.get(x, x)`` semantics).

    The reference holds the map as a driver dict and applies it per row
    (core/database_loader.py:182-188, tests/test_map_keys.py:7-57) — a
    non-starter at scale. Here it is a left join + coalesce: distributed,
    no driver state. ``broadcast=True`` (default) hints the map side —
    right for dimension-sized keymaps; pass False for fact-sized maps
    and let AQE pick the strategy from runtime stats.
    """
    mapping = keymap.select(
        F.col(old_col).alias("__old"), F.col(new_col).alias("__new")
    ).dropDuplicates(["__old"])
    rhs = F.broadcast(mapping) if broadcast else mapping
    out = df.join(rhs, df[key_col] == F.col("__old"), "left")
    return out.withColumn(
        key_col, F.coalesce(F.col("__new"), F.col(key_col))
    ).drop("__old", "__new")
