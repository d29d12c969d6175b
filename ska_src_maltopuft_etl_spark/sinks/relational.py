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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@dataclass(frozen=True)
class TargetInformation:
    """Target table metadata (reference: core/target.py:11-57 introspects
    the live DB; declared statically here, or derived from a live schema
    by :func:`~.introspection.targets_from_jdbc`)."""

    table_name: str
    table_prefix: str
    primary_key: str
    #: fk column name → parent table name (load-order DAG edges).
    foreign_keys: dict[str, str] = field(default_factory=dict)
    #: natural-key columns used for conflict detection (the reference's
    #: unique constraints).
    unique_key: tuple[str, ...] = ()
    #: further unique column sets beyond ``unique_key``: the reference's
    #: de-facto semantics are "conflict on ANY unique constraint"
    #: (SURVEY.md §7.3 risk 6 — Postgres raises on whichever trips
    #: first), so merge sinks anti-join on every set listed here too.
    extra_unique_keys: tuple[tuple[str, ...], ...] = ()

    @property
    def all_unique_keys(self) -> tuple[tuple[str, ...], ...]:
        head = (tuple(self.unique_key),) if self.unique_key else ()
        return head + tuple(tuple(k) for k in self.extra_unique_keys)


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


def _null_safe_key_condition(left_cols: Sequence[str], right_cols: Sequence[str]):
    """AND-fold of null-safe equality over paired key columns.

    Natural keys may legitimately contain NULL (e.g. sp_candidate
    plot_path); a plain equi-join never matches those rows, so every
    re-run would re-append them with fresh ids. ``eqNullSafe`` keys still
    plan as hash joins (EqualNullSafe is a supported equi-join key)."""
    cond = None
    for lc, rc in zip(left_cols, right_cols):
        e = F.col(lc).eqNullSafe(F.col(rc))
        cond = e if cond is None else (cond & e)
    return cond


def merge_append(
    new_rows: DataFrame,
    existing: DataFrame | None,
    unique_key: Sequence[str] | Sequence[Sequence[str]],
) -> DataFrame:
    """Rows of ``new_rows`` whose natural key is absent from ``existing``
    (the MERGE WHEN NOT MATCHED INSERT half, K3/K4 semantics).

    ``unique_key`` may be one column set or several (a sequence of
    sequences): a row is dropped when it conflicts on ANY of the sets —
    the reference's effective ON CONFLICT behavior when a table carries
    multiple unique constraints (one anti-join per set; each is a keyed
    equi-join AQE plans independently).

    NULL-valued key columns match null-safely, and the join strategy is
    left to AQE — the existing table grows without bound across runs, so
    a forced broadcast would eventually OOM.
    """
    if existing is None or not unique_key:
        return new_rows
    key_sets: list[list[str]]
    if unique_key and isinstance(unique_key[0], str):
        key_sets = [list(unique_key)]  # type: ignore[arg-type]
    else:
        key_sets = [list(k) for k in unique_key]  # type: ignore[union-attr]
    out = new_rows
    for ks in key_sets:
        aliased = [f"__nk_{i}" for i in range(len(ks))]
        keys = existing.select(
            *[F.col(c).alias(a) for c, a in zip(ks, aliased)]
        ).dropDuplicates()
        out = out.join(
            keys, on=_null_safe_key_condition(ks, aliased), how="left_anti"
        )
    return out


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

    .. warning::
       ``load_targets`` appends rows with their *batch-local* surrogate
       pks and does NOT remap child FKs to surviving existing parents.
       It is therefore re-run-idempotent **only for identical batches**
       (an exact re-run anti-joins every row away). A batch that
       partially overlaps existing data would drop matched parents while
       children still reference batch-local ids — use
       :func:`incremental_load`, which reconciles ids above the existing
       max and remaps FKs through per-table keymaps, for any overlapping
       or multi-run workflow.
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
            novel = merge_append(df, existing, target.all_unique_keys)
            novel.write.mode("append").option("compression", "gzip").parquet(path)
            loaded[target.table_name] = spark.read.parquet(path)
        elif jdbc_url is not None:
            try:
                existing = spark.read.jdbc(
                    jdbc_url, target.table_name, properties=jdbc_properties or {}
                )
            except Exception:
                existing = None
            novel = merge_append(df, existing, target.all_unique_keys)
            novel.write.jdbc(
                jdbc_url,
                target.table_name,
                mode="append",
                properties=jdbc_properties or {},
            )
            loaded[target.table_name] = novel
        else:
            loaded[target.table_name] = merge_append(df, None, target.all_unique_keys)
    return loaded


#: MeerTRAP load order = the FK dependency DAG (meertrap/meertrap.py:173-197).
MEERTRAP_TARGETS: tuple[TargetInformation, ...] = (
    TargetInformation("schedule_block", "", "id", {}, ("start_at", "est_end_at")),
    TargetInformation(
        "meerkat_schedule_block", "", "id",
        {"schedule_block_id": "schedule_block"}, ("meerkat_id",),
    ),
    TargetInformation("host", "", "id", {}, ("ip_address", "hostname", "port")),
    TargetInformation(
        "coherent_beam_config", "", "id", {}, ("angle", "fraction_overlap", "x", "y")
    ),
    TargetInformation(
        "observation", "", "id",
        {"schedule_block_id": "schedule_block",
         "coherent_beam_config_id": "coherent_beam_config"},
        ("t_min",),
    ),
    TargetInformation(
        "tiling_config", "", "id", {"observation_id": "observation"},
        ("observation_id", "epoch", "nbeams", "overlap", "target"),
    ),
    TargetInformation(
        "beam", "", "id", {"observation_id": "observation", "host_id": "host"},
        ("number", "coherent", "observation_id"),
    ),
    TargetInformation(
        "candidate", "", "id", {"beam_id": "beam"},
        ("dm", "snr", "ra", "dec", "width", "observed_at", "beam_id"),
    ),
    TargetInformation(
        "sp_candidate", "", "id", {"candidate_id": "candidate"}, ("plot_path",)
    ),
)

ATNF_TARGETS: tuple[TargetInformation, ...] = (
    TargetInformation("catalogue", "", "id", {}, ("name",)),
    TargetInformation(
        "catalogue_visit", "", "id", {"catalogue_id": "catalogue"}, ("visited_at",)
    ),
    TargetInformation(
        "known_pulsar", "", "id", {"catalogue_visit_id": "catalogue_visit"},
        ("name", "catalogue_visit_id"),
    ),
)


def incremental_load(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    targets: Sequence[TargetInformation],
    output_dir: str,
) -> dict[str, DataFrame]:
    """Idempotent incremental load with id reconciliation (K4 + J9).

    The reference loads each table with INSERT..RETURNING and keeps a
    driver dict of local→DB ids that downstream tables use to remap
    their FKs (core/database_loader.py:25-189). Distributed equivalent,
    one pass per table in FK order:

    1. remap this table's FK columns through the parents' keymaps
       (broadcast joins — J9);
    2. match rows against the existing table on the natural key
       (broadcast anti/left join) — matches adopt the existing id;
    3. novel rows get fresh contiguous ids above the existing max;
    4. the (local id → final id) keymap feeds children;
    5. only novel rows are appended (merge semantics — K3/K4).

    Re-running the same batch is a no-op; partially-overlapping batches
    append only the new rows, with FKs pointing at the surviving ids.
    """
    from ska_src_maltopuft_etl_spark.operators import remap_keys, surrogate_key

    keymaps: dict[str, DataFrame] = {}
    loaded: dict[str, DataFrame] = {}
    for target in targets:
        name, pk = target.table_name, target.primary_key
        df = tables[name]
        for fk_col, parent in target.foreign_keys.items():
            if parent in keymaps:
                # keymaps scale with the batch's table size (fact tables
                # can be huge) — no forced broadcast; AQE decides.
                df = remap_keys(df, fk_col, keymaps[parent], broadcast=False)
        path = f"{output_dir}/{name}.parquet"
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None

        # Match against EVERY unique constraint, like load_targets /
        # load_targets_on_conflict — a table with extra_unique_keys must
        # not get weaker dedup on the incremental path. The first set
        # that matches wins (coalesce order = constraint declaration
        # order, deterministic).
        key_sets = [list(ks) for ks in target.all_unique_keys] or [
            [c for c in df.columns if c != pk]
        ]
        if existing is not None:
            eids = []
            for si, nk in enumerate(key_sets):
                aliased = [f"__nk{si}_{i}" for i in range(len(nk))]
                eid = f"__eid{si}"
                match = existing.select(
                    *[F.col(c).alias(a) for c, a in zip(nk, aliased)],
                    F.col(pk).alias(eid),
                ).dropDuplicates(aliased)
                # existing tables grow without bound — let AQE pick the
                # join strategy instead of forcing a broadcast.
                # Null-safe equality so NULL key columns (e.g.
                # sp_candidate plot_path) match on re-runs instead of
                # re-appending with fresh ids.
                df = df.join(
                    match, _null_safe_key_condition(nk, aliased), "left"
                ).drop(*aliased)
                eids.append(eid)
            df = df.withColumn(
                "__existing_id", F.coalesce(*[F.col(e) for e in eids])
            ).drop(*eids)
            offset_row = existing.agg(F.max(pk).alias("m")).first()
            offset = int(offset_row["m"] or 0)
        else:
            df = df.withColumn("__existing_id", F.lit(None).cast("long"))
            offset = 0

        novel = df.where(F.col("__existing_id").isNull())
        novel = surrogate_key(novel, "__new_id", [pk], offset=offset + 1, scalable=True)
        keymap = (
            df.where(F.col("__existing_id").isNotNull())
            .select(F.col(pk).alias("old"), F.col("__existing_id").alias("new"))
            .unionByName(
                novel.select(F.col(pk).alias("old"), F.col("__new_id").alias("new"))
            )
        )
        # Keymaps are small but their lineage drags the ENTIRE upstream
        # pipeline DAG into every child table's plan — after a few tables
        # the combined plan string alone can OOM the driver. Eagerly
        # localCheckpoint to truncate lineage at each table boundary.
        keymaps[name] = keymap.dropDuplicates(["old"]).localCheckpoint(eager=True)

        out_cols = [c for c in tables[name].columns]
        novel_final = novel.withColumn(pk, F.col("__new_id")).select(*out_cols)
        novel_final.write.mode("append").option("compression", "gzip").parquet(path)
        loaded[name] = spark.read.parquet(path)
    return loaded


def load_targets_on_conflict(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    targets: Sequence[TargetInformation],
    jdbc_url: str,
    jdbc_properties: dict[str, str] | None = None,
    staging_suffix: str = "_stage",
) -> dict[str, DataFrame]:
    """Executable twin of the reference's ``INSERT .. ON CONFLICT DO
    NOTHING`` round trip (reference core/insert.py:76-119), set-based.

    Where :func:`load_targets`'s JDBC branch resolves conflicts in Spark
    (anti-join against a snapshot read of the target, then append), this
    variant resolves them **inside the database**, closing the
    read-modify-write race window between the snapshot and the append:

    1. the batch is staged with ``DataFrameWriter.jdbc`` (bulk write,
       Spark-parallel — never per-row statements);
    2. ONE set-based statement per table moves staged rows into the
       target: ``INSERT ... SELECT ... ON CONFLICT DO NOTHING`` on
       PostgreSQL (conflicting on ANY unique constraint, exactly the
       reference's de-facto semantics — SURVEY.md §7.3 risk 6), or the
       vanilla-SQL ``INSERT ... SELECT ... WHERE NOT EXISTS`` per unique
       key set elsewhere (embedded Derby in tests);
    3. the staging table is dropped.

    The scale shape is right for 100 TB loads: Spark does the heavy
    distributed write into staging, the database does one indexed merge
    — no driver-side row loops, no ids shipped back (surrogate keys are
    deterministic Spark-side, as everywhere in this sink).

    Conflict semantics are Postgres's (and therefore the reference's):

    - **NULLS DISTINCT**: a unique constraint never fires for rows with
      NULL in a key column, so NULL-keyed rows always insert — on every
      run, on both backends. The vanilla ``NOT EXISTS`` guard uses plain
      equality (NULL comparisons are unknown → the guard passes), and
      the Spark-side intra-batch dedup skips NULL-keyed rows to match.
      Callers who need NULL-keyed idempotency should use the anti-join
      sinks (:func:`load_targets` / :func:`incremental_load`), whose
      null-safe matching is documented there.
    - **any unique constraint conflicts, including the primary key**:
      the vanilla branch also guards on the PK so a staged row that
      collides only on its PK is skipped like any other conflict instead
      of aborting the whole set-based INSERT.
    - intra-batch duplicates (non-NULL keys) are collapsed in Spark
      first (``ON CONFLICT`` dedupes within a statement; ``NOT EXISTS``
      does not — normalizing in Spark keeps both backends identical).
    """
    from ska_src_maltopuft_etl_spark.sinks.introspection import (
        check_identifier,
        execute_jdbc_sql,
        stored_column_names,
    )

    props = jdbc_properties or {}
    is_postgres = jdbc_url.startswith("jdbc:postgresql")
    loaded: dict[str, DataFrame] = {}
    for target in targets:
        name = check_identifier(target.table_name)
        stage = check_identifier(f"{name}{staging_suffix}")
        df = tables[name]
        df = df.dropDuplicates([target.primary_key])
        for ks in target.all_unique_keys:
            # NULLS DISTINCT: only rows with a fully non-NULL key can
            # conflict — dedup those; NULL-keyed rows pass through
            # untouched (they all insert, exactly as ON CONFLICT would).
            # One window pass per key set, referencing df ONCE — a
            # where/union split would reference (and recompute) the
            # whole upstream plan twice per constraint, doubling the
            # subtree for every additional unique key set.
            nonnull = None
            for c in ks:
                e = F.col(c).isNotNull()
                nonnull = e if nonnull is None else (nonnull & e)
            w = Window.partitionBy(*ks).orderBy(F.col(target.primary_key))
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .where((F.col("__rn") == 1) | ~nonnull)
                .drop("__rn")
            )

        # ensure the target exists (Spark creates it on first append —
        # without unique constraints; pre-create with real DDL to get
        # database-enforced conflicts, as the reference's schema does).
        try:
            spark.read.jdbc(jdbc_url, name, properties=props).schema
        except Exception:
            df.limit(0).write.jdbc(jdbc_url, name, mode="append", properties=props)

        df.write.jdbc(jdbc_url, stage, mode="overwrite", properties=props)

        # Identifier case: unquoted DDL folds names (up on Derby, down
        # on Postgres) while Spark's JDBC writer QUOTES DataFrame column
        # names verbatim — so target and staging may store different
        # cases for the same column. Quote every identifier with its
        # own stored case, resolved from the catalog.
        tcols = stored_column_names(spark, jdbc_url, name, props)
        scols = stored_column_names(spark, jdbc_url, stage, props)

        def tq(c: str) -> str:
            return '"' + tcols[c.lower()] + '"'

        def sq(c: str) -> str:
            return '"' + scols[c.lower()] + '"'

        # Spark's Derby dialect maps StringType to CLOB (both when it
        # creates the staging table and in setNull on append — so the
        # stage CANNOT be pre-typed VARCHAR), and Derby supports no
        # comparison operators on LOBs at all: a string unique key in
        # the NOT EXISTS guard raises ERROR 42818 (found by the
        # batch-order commutativity property test). CAST both sides of
        # every string-key comparison, and the staged value in the
        # insert list, to VARCHAR(32672) — Derby's maximum; longer
        # values raise truncation rather than silently merging wrong.
        # Postgres maps StringType to TEXT and is unaffected (its
        # branch below uses the columns bare).
        str_cols = {
            f.name.lower()
            for f in df.schema.fields
            if isinstance(f.dataType, StringType)
        }

        def scast(c: str) -> str:
            v = f"s.{sq(c)}"
            return f"CAST({v} AS VARCHAR(32672))" if c.lower() in str_cols else v

        def tcast(c: str) -> str:
            v = f"t.{tq(c)}"
            return f"CAST({v} AS VARCHAR(32672))" if c.lower() in str_cols else v

        insert_cols = ", ".join(tq(c) for c in df.columns)
        select_cols = ", ".join(f"s.{sq(c)}" for c in df.columns)
        if is_postgres:
            merge = (
                f'INSERT INTO "{name}" ({insert_cols}) '
                f'SELECT {select_cols} FROM "{stage}" s '
                "ON CONFLICT DO NOTHING"
            )
        else:
            guards = []
            # PK conflicts are skipped like any other unique conflict
            # (Postgres's bare ON CONFLICT DO NOTHING covers the PK's
            # unique index too; without this guard one PK collision
            # would abort the whole set-based INSERT).
            pk_sets = ((target.primary_key,),) + target.all_unique_keys
            for ks in pk_sets:
                # Plain equality = NULLS DISTINCT (a NULL key column
                # makes the comparison unknown, the EXISTS finds no
                # match, and the row inserts — Postgres semantics).
                match = " AND ".join(f"{tcast(c)} = {scast(c)}" for c in ks)
                guards.append(
                    f"NOT EXISTS (SELECT 1 FROM {name} t WHERE {match})"
                )
            where = f" WHERE {' AND '.join(guards)}" if guards else ""
            # CLOB is not assignable to VARCHAR either — cast staged
            # string values in the insert list too (VARCHAR assigns
            # fine to both VARCHAR and CLOB targets).
            cast_cols = ", ".join(scast(c) for c in df.columns)
            merge = (
                f"INSERT INTO {name} ({insert_cols}) "
                f"SELECT {cast_cols} FROM {stage} s{where}"
            )
        execute_jdbc_sql(
            spark, jdbc_url, [merge, f"DROP TABLE {stage}"], properties=props
        )
        loaded[name] = spark.read.jdbc(jdbc_url, name, properties=props)
    return loaded
