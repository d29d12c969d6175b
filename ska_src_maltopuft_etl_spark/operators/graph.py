"""Distributed connected components over an edge DataFrame.

The canonical last step of every near-duplicate pipeline: candidate
pairs (MinHash-LSH bands, exact Jaccard, embedding cosine, fuzzy match)
form an undirected graph; each connected component is one duplicate
cluster, and the minimum id in the component is the canonical document
to keep. The reference has no graph operator (its dedup is
single-column keep-first, observation/extract.py:60-77 family); this is
part of the LLM-data-pipeline extension surface.

Design for 100 TB:

- Min-label propagation expressed as DataFrame joins: each round is one
  equi-join (labels onto edge endpoints, both directions via the
  symmetrized edge table) plus one hash aggregate (MIN per node) — both
  keyed shuffles that AQE can coalesce/skew-split. No driver-side graph
  state; the driver holds only the loop counter and a changed-row count.
- Rounds = graph diameter. Near-dup clusters are shallow (duplicates of
  a common source collapse in 1-2 rounds), so this converges in a
  handful of rounds; the known pathological case is a long chain, where
  an alternating large-star/small-star scheme (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) bounds rounds at
  O(log² n). Label propagation is preferred here because each round is
  strictly cheaper (no edge-set rewriting) and dedup graphs are
  diameter-bounded in practice.
- ``localCheckpoint`` per round cuts lineage so the plan stays O(1) in
  the number of iterations instead of re-planning an ever-deeper join
  tree (the same trick incremental_load uses per table).
- The convergence check (`changed == 0`) costs one extra action per
  round; at scale you would fold it into the same job with an
  accumulator, but a count on the already-checkpointed labels frame is
  a cheap metadata-sized scan and keeps the operator declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MIN node id of its connected component.

    Parameters
    ----------
    edges : (src, dst) pairs, undirected (orientation ignored).
    nodes : optional single-column frame of node ids; isolated nodes
        (no incident edge) appear in the output only if supplied here.
    max_iter : hard round bound; raises if not converged (a dedup graph
        needing >25 rounds of min propagation means the edge set is
        pathological and needs the star-algorithm variant instead).

    Returns (node, component).
    """
    node_col = edges.schema[src].name  # validate columns exist early
    _ = edges.schema[dst].name

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # symmetrize once; every round joins against this static frame
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.localCheckpoint(eager=False)

    labels = und.select(F.col("a").alias("node")).distinct()
    if nodes is not None:
        n_col = nodes.columns[0]
        labels = labels.union(
            nodes.select(F.col(n_col).alias("node"))
        ).distinct()
    labels = labels.withColumn("component", F.col("node")).localCheckpoint()

    for _round in range(max_iter):
        # each node also keeps its own current label (the union below),
        # so labels are monotonically non-increasing → convergence
        nbr = und.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "component")
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "__old"), "node"
            )
            .where(F.col("component") != F.col("__old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter too large for label propagation — use a "
        "star-contraction algorithm for this edge set"
    )


def dedup_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Near-dup clustering summary: (node, component, is_canonical).

    ``is_canonical`` marks the member to KEEP (minimum id per cluster);
    everything else in the component is the drop set.
    """
    cc = connected_components(edges, src=src, dst=dst, nodes=nodes)
    return cc.withColumn(
        "is_canonical", (F.col("node") == F.col("component"))
    )
