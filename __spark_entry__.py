"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join aggregation at sf0.001;
``queries()`` exposes the full operator inventory (SURVEY.md §2 +
LLM-data-pipeline extensions) as (spark, sf_dir) callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
deterministic query (approximate ops are rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ska_src_maltopuft_etl_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = QUERIES["q05_local_supplier_volume"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
