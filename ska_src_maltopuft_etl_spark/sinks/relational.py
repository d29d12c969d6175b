"""Idempotent relational sink (SURVEY.md §2.2 K2-K5).

The reference loads each table with ``INSERT ... RETURNING id`` inside a
transaction, falling back to per-row get-or-insert on conflicts, and
remaps local → DB keys through a driver-side dict
(core/insert.py:26-119, core/database_loader.py:25-189).

Spark-first redesign (SURVEY.md §4.3): per-row statements and driver
dicts cannot scale, so

- surrogate keys are computed deterministically *in Spark* before the
  sink (operators/dedup.py surrogate_key) — ids never come back from the
  database;
- idempotency is a MERGE-shaped upsert: anti-join new rows against the
  existing natural keys, append only the novel ones (exactly the
  semantics of ``INSERT ... ON CONFLICT DO NOTHING``);
- FK remap from pre-existing rows is a broadcast join
  (operators/joins.py remap_keys), not a dict.

Two backends: parquet directories (tests / lakehouse) and JDBC
(``mode="append"`` after the anti-join; the merge-window race is handled
by the target's unique constraint, as in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TargetInformation:
    """Target table metadata (reference: core/target.py:11-57 introspects
    the live DB; here declared statically)."""

    table_name: str
    table_prefix: str
    primary_key: str
    foreign_keys: tuple[str, ...] = ()
    #: natural-key columns used for conflict detection (the reference's
    #: unique constraints).
    unique_key: tuple[str, ...] = ()


def prepare_data_for_insert(df: DataFrame, target: TargetInformation) -> DataFrame:
    """Prefix-slice the wide frame into one table's insert frame (K5,
    core/database_loader.py:27-67).

    Uses removeprefix semantics — the reference's ``col.replace(prefix,
    "")`` replaces the prefix anywhere in the name, a latent bug noted in
    SURVEY.md §2.2.
    """
    cols = [
        c
        for c in df.columns
        if c.startswith(target.table_prefix)
        or c == target.primary_key
        or c in target.foreign_keys
    ]
    def stripped(c: str) -> str:
        return c[len(target.table_prefix):] if c.startswith(target.table_prefix) else c

    renamed = [F.col(c).alias(stripped(c)) for c in cols]
    return df.select(*renamed).dropDuplicates([stripped(target.primary_key)])


def merge_append(
    new_rows: DataFrame,
    existing: DataFrame | None,
    unique_key: Sequence[str],
) -> DataFrame:
    """Rows of ``new_rows`` whose natural key is absent from ``existing``
    (the MERGE WHEN NOT MATCHED INSERT half, K3/K4 semantics)."""
    if existing is None or not unique_key:
        return new_rows
    return new_rows.join(
        F.broadcast(existing.select(*unique_key).dropDuplicates()),
        on=list(unique_key),
        how="left_anti",
    )


def load_targets(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    targets: Sequence[TargetInformation],
    output_dir: str | None = None,
    jdbc_url: str | None = None,
    jdbc_properties: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Load tables in FK-dependency order (meertrap/meertrap.py:173-197).

    Parquet mode: merge-append against any existing table directory.
    JDBC mode: anti-join against the current table contents then append —
    one statement per table, never per row.
    """
    loaded: dict[str, DataFrame] = {}
    for target in targets:
        df = tables[target.table_name]
        existing = None
        if output_dir is not None:
            path = f"{output_dir}/{target.table_name}.parquet"
            try:
                existing = spark.read.parquet(path)
            except Exception:
                existing = None
            novel = merge_append(df, existing, target.unique_key)
            novel.write.mode("append").option("compression", "gzip").parquet(path)
            loaded[target.table_name] = spark.read.parquet(path)
        elif jdbc_url is not None:
            try:
                existing = spark.read.jdbc(
                    jdbc_url, target.table_name, properties=jdbc_properties or {}
                )
            except Exception:
                existing = None
            novel = merge_append(df, existing, target.unique_key)
            novel.write.jdbc(
                jdbc_url,
                target.table_name,
                mode="append",
                properties=jdbc_properties or {},
            )
            loaded[target.table_name] = novel
        else:
            loaded[target.table_name] = merge_append(df, None, target.unique_key)
    return loaded


#: MeerTRAP load order = the FK dependency DAG (meertrap/meertrap.py:173-197).
MEERTRAP_TARGETS: tuple[TargetInformation, ...] = (
    TargetInformation("schedule_block", "", "id", (), ("start_at", "est_end_at")),
    TargetInformation(
        "meerkat_schedule_block", "", "id", ("schedule_block_id",), ("meerkat_id",)
    ),
    TargetInformation("host", "", "id", (), ("ip_address", "hostname", "port")),
    TargetInformation(
        "coherent_beam_config", "", "id", (), ("angle", "fraction_overlap", "x", "y")
    ),
    TargetInformation(
        "observation", "", "id", ("schedule_block_id", "coherent_beam_config_id"), ("t_min",)
    ),
    TargetInformation("tiling_config", "", "id", ("observation_id",), ()),
    TargetInformation(
        "beam", "", "id", ("observation_id", "host_id"), ("number", "coherent", "observation_id")
    ),
    TargetInformation(
        "candidate",
        "",
        "id",
        ("beam_id",),
        ("dm", "snr", "ra", "dec", "width", "observed_at", "beam_id"),
    ),
    TargetInformation("sp_candidate", "", "id", ("candidate_id",), ("plot_path",)),
)

ATNF_TARGETS: tuple[TargetInformation, ...] = (
    TargetInformation("catalogue", "", "id", (), ("name",)),
    TargetInformation("catalogue_visit", "", "id", ("catalogue_id",), ()),
    TargetInformation(
        "known_pulsar", "", "id", ("catalogue_visit_id",), ("name", "catalogue_visit_id")
    ),
)
