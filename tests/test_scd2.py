"""Type-2 SCD maintenance (sinks/scd2.py): rule branches, idempotency,
and as-of retrieval."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.sinks.scd2 import scd2_apply

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)

SCHEMA = "k long, attr string, valid_from timestamp, valid_to timestamp"


def _dim(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_scd2_all_branches(spark):
    existing = _dim(
        spark,
        [
            (1, "a", T0, None),      # will change
            (2, "b", T0, None),      # unchanged (same attrs in batch)
            (3, "c", T0, None),      # absent from batch
            (1, "old", T0 - dt.timedelta(days=30), T0),  # closed history
        ],
    )
    batch = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (4, "d")], "k long, attr string"
    )
    out = scd2_apply(existing, batch, ["k"], ["attr"], T1)
    rows = {
        (r["k"], r["attr"]): (r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        (1, "old"): (T0 - dt.timedelta(days=30), T0),  # history untouched
        (1, "a"): (T0, T1),                            # closed at T1
        (1, "a2"): (T1, None),                         # new version
        (2, "b"): (T0, None),                          # unchanged
        (3, "c"): (T0, None),                          # absent: stays open
        (4, "d"): (T1, None),                          # new key
    }


def test_scd2_reapply_is_noop(spark):
    existing = _dim(spark, [(1, "a", T0, None), (2, "b", T0, None)])
    batch = spark.createDataFrame([(1, "a2"), (2, "b")], "k long, attr string")
    once = scd2_apply(existing, batch, ["k"], ["attr"], T1)
    twice = scd2_apply(once, batch, ["k"], ["attr"], T2)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_null_attr_transitions(spark):
    # null-safe compare: null->null is unchanged; null->value is a change
    existing = _dim(spark, [(1, None, T0, None), (2, None, T0, None)])
    batch = spark.createDataFrame(
        [(1, None), (2, "x")], "k long, attr string"
    )
    out = scd2_apply(existing, batch, ["k"], ["attr"], T1)
    rows = {(r["k"], r["attr"]): r["valid_to"] for r in out.collect()}
    assert rows == {(1, None): None, (2, None): T1, (2, "x"): None}


def test_scd2_asof_retrieval(spark):
    """Facts join the dimension AS OF their event time."""
    dim0 = _dim(spark, [(1, "v1", T0, None)])
    dim1 = scd2_apply(
        dim0,
        spark.createDataFrame([(1, "v2")], "k long, attr string"),
        ["k"],
        ["attr"],
        T1,
    )
    facts = spark.createDataFrame(
        [(1, T0 + dt.timedelta(days=5)), (1, T1 + dt.timedelta(days=5))],
        "k long, event_ts timestamp",
    )
    resolved = facts.join(
        dim1,
        (facts["k"] == dim1["k"])
        & (facts["event_ts"] >= dim1["valid_from"])
        & (
            dim1["valid_to"].isNull()
            | (facts["event_ts"] < dim1["valid_to"])
        ),
    ).select("event_ts", "attr")
    got = {r["attr"] for r in resolved.collect()}
    assert got == {"v1", "v2"}
    assert resolved.count() == 2


# --- property-based: arbitrary batch sequences vs a Python model -----------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# keys from a tiny alphabet (forces change/unchanged/new collisions);
# attrs from 3 values + None (exercises null-safe compare)
batch_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from(["a", "b", "c", None])),
    min_size=0,
    max_size=6,
    unique_by=lambda t: t[0],
)


def _model_apply(dim: dict, history: list, batch, ts):
    """Python reference model: dim maps key -> (attr, valid_from)."""
    for k, attr in batch:
        if k not in dim:
            dim[k] = (attr, ts)
        elif dim[k][0] != attr:
            old_attr, old_from = dim[k]
            history.append((k, old_attr, old_from, ts))
            dim[k] = (attr, ts)
    return dim, history


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=4))
def test_scd2_matches_python_model(spark, batches):
    dim_df = _dim(spark, [])
    dim_model: dict = {}
    hist_model: list = []
    for i, batch in enumerate(batches):
        ts = T0 + dt.timedelta(days=i)
        bdf = spark.createDataFrame(
            [(k, a) for k, a in batch] or [(None, None)],
            "k long, attr string",
        )
        if not batch:
            continue
        dim_df = scd2_apply(dim_df, bdf, ["k"], ["attr"], ts)
        dim_model, hist_model = _model_apply(dim_model, hist_model, batch, ts)

    def skey(t):
        return (t[0], t[1] or "", t[2], t[3] or dt.datetime.max)

    got = sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"])
            for r in dim_df.collect()
        ),
        key=skey,
    )
    want = sorted(
        [(k, a, vf, None) for k, (a, vf) in dim_model.items()] + hist_model,
        key=skey,
    )
    assert got == want
