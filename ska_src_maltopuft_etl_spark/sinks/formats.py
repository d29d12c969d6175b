"""Format-agnostic table IO: parquet / orc / csv / json.

The reference only writes parquet checkpoints (K1); an engine replacing
it should speak the common lake formats for both directions. All
formats preserve schema via explicit options (csv/json re-reads take the
original schema — header/text formats don't carry types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | None = None, **options
) -> DataFrame:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
