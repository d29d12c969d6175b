"""Deterministic fixed-point k-means (operators/clustering.py)."""

from __future__ import annotations

from ska_src_maltopuft_etl_spark.operators.clustering import kmeans_fixed_point


def _run(spark, rows, k, iters=2):
    df = spark.createDataFrame(rows, "id long, v array<float>")
    return {
        r["id"]: (r["cluster"], r["dist_sq"], r["cluster_size"])
        for r in kmeans_fixed_point(df, "id", "v", k=k, iters=iters).collect()
    }


def test_kmeans_recovers_separated_blobs(spark):
    rows = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (1, [5.0, 5.0]), (4, [5.1, 5.0]), (5, [5.0, 5.1]),
    ]
    got = _run(spark, rows, k=2)
    assert {i: got[i][0] for i in got} == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}
    assert all(got[i][2] == 3 for i in got)
    # distances are exact quantized integers; members sit near their
    # centroid, far from the other one
    assert all(got[i][1] < 100_000 for i in got)


def test_kmeans_deterministic_across_runs(spark):
    rows = [(i, [((i * 37) % 11) / 10.0, ((i * 53) % 7) / 10.0]) for i in range(40)]
    a = _run(spark, rows, k=3)
    b = _run(spark, rows, k=3)
    assert a == b


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # identical seeds: every point ties and breaks to the smaller label,
    # so cluster 1 empties after round 1 — without the COALESCE guard its
    # centroid would go NULL and every distance with it too.
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.1, 1.0]), (3, [0.9, 1.0])]
    got = _run(spark, rows, k=2)
    assert {got[i][0] for i in got} == {0}
    assert all(got[i][2] == 4 for i in got)
