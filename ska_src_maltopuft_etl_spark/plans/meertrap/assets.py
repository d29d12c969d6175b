"""Reporting assets over the transformed MeerTRAP tables.

Parity for the reference's ``plot_cand_obs_count`` Dagster asset
(reference ``src/pipelines/meertrap/assets.py:55-76``): a bar chart of
the distinct-observation and candidate counts, returned as a
markdown-embeddable base64 PNG.

Spark-first split: the COUNTS are a distributed aggregate (two tiny
jobs — this is the part that must scale); the matplotlib rendering is
driver-side presentation over exactly two numbers and is gated behind
an import-try because plotting libraries are not part of the engine's
runtime contract.
"""

from __future__ import annotations

import base64
from io import BytesIO

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cand_obs_counts", "plot_cand_obs_count"]


def cand_obs_counts(observation: DataFrame, candidate: DataFrame) -> dict[str, int]:
    """Distinct observation count + candidate count (the asset's data).

    The reference counts ``observation_id.unique()`` and ``len(cand_df)``
    on driver-side polars frames; here both are distributed aggregates.
    A missing observation-id column maps to 0, matching the reference's
    ``ColumnNotFoundError`` fallback.
    """
    id_col = next(
        (c for c in ("observation_id", "id") if c in observation.columns), None
    )
    num_obs = (
        observation.select(id_col).distinct().count() if id_col is not None else 0
    )
    return {"num_obs": num_obs, "num_cands": candidate.count()}


def plot_cand_obs_count(observation: DataFrame, candidate: DataFrame) -> str:
    """Markdown image tag with the base64 PNG bar chart
    (reference assets.py:63-76). Raises ImportError where matplotlib is
    unavailable — the counts themselves are reachable via
    :func:`cand_obs_counts` without any plotting dependency.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = cand_obs_counts(observation, candidate)
    plt.figure(figsize=(8, 8), facecolor=None)
    plt.bar(list(counts.keys()), list(counts.values()))
    buffer = BytesIO()
    plt.savefig(buffer, format="png")
    plt.close()
    image_data = base64.b64encode(buffer.getvalue())
    return f"![img](data:image/png;base64,{image_data.decode()})"
