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


def test_kmeans_property_random_inputs_match_python_model(spark):
    """Random vector sets vs an exact python replay of the integer
    recurrence — duplicate points, tie-breaks, empty clusters and the
    float32 storage round-trip all covered. Division semantics must
    match Spark's FLOOR(CAST(SUM AS DOUBLE)/COUNT): python's `/` IS
    IEEE double division, so math.floor(s / n) is bit-equivalent
    (never use s // n, exact rational floor can differ)."""
    import math
    import random

    import numpy as np

    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(3, 12)
        dims = rng.randint(2, 4)
        k = rng.randint(2, 3)
        rows = [
            (i, [rng.choice([-0.7, -0.3, 0.0, 0.1, 0.4, 0.9]) for _ in range(dims)])
            for i in range(n)
        ]
        got = _run(spark, rows, k=k, iters=2)

        # exact python model: float32 storage -> double widen -> quantize
        q = {
            i: [int(math.floor(float(np.float32(x)) * 1024 + 0.5)) for x in v]
            for i, v in rows
        }
        cent = {i: list(q[i]) for i in sorted(q)[:k]}

        def assign(cent):
            out = {}
            for i, e in q.items():
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(e, c)), cid)
                    for cid, c in cent.items()
                )
                out[i] = best  # (dist, cid)
            return out

        for _ in range(2):
            asg = assign(cent)
            members: dict = {}
            for i, (_, cid) in asg.items():
                members.setdefault(cid, []).append(i)
            new = {}
            for cid, c in cent.items():
                if cid not in members:
                    new[cid] = c  # emptied cluster keeps its centroid
                    continue
                ms = members[cid]
                new[cid] = [
                    int(math.floor(sum(q[i][d] for i in ms) / len(ms)))
                    for d in range(dims)
                ]
            cent = new
        final = assign(cent)
        sizes: dict = {}
        for i, (_, cid) in final.items():
            sizes[cid] = sizes.get(cid, 0) + 1
        want = {i: (cid, dist, sizes[cid]) for i, (dist, cid) in final.items()}
        assert got == want, (trial, rows)
