"""Session catalog helpers: temp-view registration so users can drive
the engine through plain ``spark.sql`` (ANSI SQL frontend) as well as
the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ska_src_maltopuft_etl_spark.sources import TABLES, load_table


#: (applicationId → sf_dir) most recently registered: re-registering the
#: same directory is a no-op (the views are identical lazy plans), while
#: a different sf_dir still replaces every view.
_REGISTERED: dict[str, str] = {}


def register_star_schema(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view (region, nation, …,
    embeddings); returns the view names."""
    app = spark.sparkContext.applicationId
    if _REGISTERED.get(app) != sf_dir:
        for name in TABLES:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        _REGISTERED[app] = sf_dir
    return list(TABLES)


def register_tables(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Register arbitrary named frames (e.g. MeerTRAP pipeline outputs)
    as temp views for SQL access — the reference's post-load SQL surface
    (README smoke query) without a database."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
