"""MeerTRAP observation transform: run-summary frame → 7 normalized tables.

Faithful re-derivation of the reference's observation dataflow
(meertrap/observation/transform.py:26-527) in declarative Spark, with the
row-order-dependent idioms replaced by explicit keys (SURVEY.md §7.3
risk 1):

- both positional hstacks (transform.py:45, :368-369) become validated
  key joins on ``sb_start_at`` / ``obs_t_min``;
- every ``with_row_index`` surrogate key becomes a ``row_number`` over a
  deterministic total order (the reference's unordered ``unique()`` makes
  several of its ids thread/hash-order dependent — here they are stable);
- the per-row Python interval lookup (transform.py:203-221) becomes a
  broadcast range join with a smallest-id tie-break;
- ``beams_tilings`` / ``beams_host_beams`` are real ArrayType(Struct)
  columns (never Python-repr strings), so explode+struct access replaces
  ast.literal_eval + json_normalize (transform.py:370-391,459-470).

Scale: schedule-block and observation frames are dimension-sized —
broadcast joins; the wide frame and beam explode are the fact path and
stay shuffle-partitioned by their join keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark import functions as K
from ska_src_maltopuft_etl_spark.operators import (
    dedup_keep_first,
    interval_join,
    surrogate_key,
    validated_join,
)

# Reference constants (observation/constants.py:3-4).
SPEED_OF_LIGHT_M_PER_S = 299_792_458.0
MHZ_TO_HZ = 1e6


class UnexpectedShapeError(RuntimeError):
    """Mirror of the reference's invariant-violation error
    (core/exceptions.py:8-9)."""


@dataclass
class ObservationTables:
    schedule_block: DataFrame
    meerkat_schedule_block: DataFrame
    host: DataFrame
    coherent_beam_config: DataFrame
    observation: DataFrame
    tiling_config: DataFrame
    beam: DataFrame
    #: (beam_number, beam_coherent, obs_t_min, beam_id) — the as-of join
    #: right side consumed by the candidate transform.
    beam_obs: DataFrame

    def as_dict(self) -> dict[str, DataFrame]:
        return {
            "schedule_block": self.schedule_block,
            "meerkat_schedule_block": self.meerkat_schedule_block,
            "host": self.host,
            "coherent_beam_config": self.coherent_beam_config,
            "observation": self.observation,
            "tiling_config": self.tiling_config,
            "beam": self.beam,
        }


def _em_min_faithful() -> F.Column:
    # Reference formula verbatim (transform.py:249-254): divide by the
    # MHz value then *multiply* by 1e6 — their unit convention, kept for
    # parity (the physically-dimensioned kernel lives in functions/).
    return (
        SPEED_OF_LIGHT_M_PER_S
        / (F.col("obs_cfreq") + F.col("obs_bw") / 2.0)
        * MHZ_TO_HZ
    )


def _em_max_faithful() -> F.Column:
    return (
        SPEED_OF_LIGHT_M_PER_S
        / (F.col("obs_cfreq") - F.col("obs_bw") / 2.0)
        * MHZ_TO_HZ
    )


def get_sb_df(df: DataFrame) -> DataFrame:
    """Unique schedule-block rows with est_end_at and surrogate keys
    (transform.py:106-176).

    Zero expected durations are replaced by the *global* sum of durations
    mined from every block's script config — reproducing the reference's
    frame-wide scalar quirk (transform.py:111-132, SURVEY.md §7.3 risk 3).
    """
    sb = dedup_keep_first(
        df,
        ["mk_sb_meerkat_id"],
        ["obs_t_min", F.col("obs_t_max").asc_nulls_last(), "filename"],
    ).select(
        "sb_expected_duration_seconds",
        "sb_script_profile_config",
        "sb_start_at",
        "mk_sb_meerkat_id",
        "mk_sb_meerkat_id_code",
        "mk_sb_proposal_id",
        "obs_t_min",
        "obs_t_max",
    )

    # duration= matches are followed by a literal backslash-n in the
    # config text (the reference's r"duration=\d+(\.\d+)?\\n").
    mined = sb.select(
        F.explode_outer(
            F.regexp_extract_all(
                F.col("sb_script_profile_config"), F.lit(r"duration=(\d+(\.\d+)?)\\n"), 1
            )
        ).alias("m")
    ).agg(F.sum(F.col("m").cast("int")).alias("__global_duration"))

    sb = sb.crossJoin(F.broadcast(mined)).withColumn(
        "__duration",
        F.when(
            F.col("sb_expected_duration_seconds") == 0, F.col("__global_duration")
        ).otherwise(F.col("sb_expected_duration_seconds")),
    )
    sb = sb.withColumn("sb_est_end_at", K.add_seconds("sb_start_at", F.col("__duration")))

    sb = surrogate_key(
        sb,
        "schedule_block_id",
        ["obs_t_min", F.col("obs_t_max").asc_nulls_last(), "mk_sb_meerkat_id"],
    ).withColumn("meerkat_schedule_block_id", F.col("schedule_block_id"))
    return sb.select(
        "schedule_block_id",
        "meerkat_schedule_block_id",
        "sb_start_at",
        "sb_est_end_at",
        "mk_sb_meerkat_id",
        "mk_sb_meerkat_id_code",
        "mk_sb_proposal_id",
    )


def get_obs_df(
    obs_uniq: DataFrame, sb_df: DataFrame, validate: bool = True
) -> DataFrame:
    """Unique observation rows (transform.py:243-344): em band, pol enums,
    parent schedule block via interval join, t_max lead-imputation."""
    base = _join(
        validate,
        obs_uniq,
        sb_df.select("sb_start_at", "sb_est_end_at"),
        on="sb_start_at",
        how="left",
        expect="m:1",
    )
    obs = base.select(
        "obs_t_min",
        "obs_t_max",
        "obs_em_xel",
        "obs_pol_xel",
        "obs_t_resolution",
        "sb_est_end_at",
        F.lit("MeerTRAP").alias("obs_facility_name"),
        F.lit("Meerkat").alias("obs_instrument_name"),
        _em_min_faithful().alias("obs_em_min"),
        _em_max_faithful().alias("obs_em_max"),
        K.pol_states("obs_pol_xel").alias("obs_pol_states"),
        K.dataproduct_type("obs_pol_xel").alias("obs_dataproduct_type"),
    )

    # J5: parent schedule block where start_at <= t_min <= est_end + 1h;
    # reference scans the sb frame in order and takes the first match →
    # smallest schedule_block_id tie-break.
    sb_iv = sb_df.select(
        "schedule_block_id",
        F.col("sb_start_at").alias("__iv_start"),
        (F.col("sb_est_end_at") + F.expr("INTERVAL 1 HOUR")).alias("__iv_end"),
    )
    obs = interval_join(
        obs,
        sb_iv,
        left_ts="obs_t_min",
        right_start="__iv_start",
        right_end="__iv_end",
        how="left",
        tie_break="schedule_block_id",
        broadcast_right=True,
    ).drop("__iv_start", "__iv_end")

    obs = surrogate_key(obs, "observation_id", ["obs_t_min"])

    # handle_null_stop (transform.py:224-240): next observation's start,
    # capped by the block's estimated end.
    w = Window.orderBy("obs_t_min")
    obs = obs.withColumn("__next_t_min", F.lead("obs_t_min").over(w)).withColumn(
        "obs_t_max",
        F.when(F.col("obs_t_max").isNotNull(), F.col("obs_t_max")).otherwise(
            F.least("sb_est_end_at", "__next_t_min")
        ),
    )
    return obs.drop("__next_t_min", "sb_est_end_at")


def get_coherent_beam_config_df(
    obs_uniq: DataFrame, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Unique coherent-beam configs + per-observation mapping
    (transform.py:179-200). Returns (config table, t_min→config_id map)."""
    per_obs = obs_uniq.select(
        "obs_t_min", "cb_angle", "cb_fraction_overlap", "cb_x", "cb_y"
    )
    uniq = per_obs.select("cb_angle", "cb_fraction_overlap", "cb_x", "cb_y").dropDuplicates()
    uniq = surrogate_key(
        uniq,
        "coherent_beam_config_id",
        ["cb_angle", "cb_fraction_overlap", "cb_x", "cb_y"],
    )
    mapping = _join(
        validate,
        per_obs,
        uniq,
        on=["cb_angle", "cb_fraction_overlap", "cb_x", "cb_y"],
        how="left",
        expect="m:1",
    ).select("obs_t_min", "coherent_beam_config_id")
    return uniq, mapping


def get_tiling_config_df(
    obs_uniq: DataFrame, obs_df: DataFrame, validate: bool = True
) -> DataFrame:
    """Tiling configs: explode the typed array, split the target field,
    convert coordinates (transform.py:347-437). Position-stable ids via
    posexplode instead of the reference's row index."""
    tiles = obs_uniq.select(
        "obs_t_min", F.posexplode("beams_tilings").alias("__pos", "__tile")
    )
    tiles = _join(
        validate,
        tiles,
        obs_df.select("obs_t_min", "observation_id"),
        on="obs_t_min",
        how="left",
        expect="m:1",
    )
    target_parts = F.split(F.col("__tile.target"), ",")
    tiles = tiles.select(
        "observation_id",
        "__pos",
        F.col("__tile.coordinate_type").alias("tiling_coordinate_type"),
        F.col("__tile.epoch").alias("tiling_epoch"),
        F.col("__tile.epoch_offset").alias("tiling_epoch_offset"),
        F.col("__tile.method").alias("tiling_method"),
        F.col("__tile.nbeams").alias("tiling_nbeams"),
        F.col("__tile.overlap").alias("tiling_overlap"),
        (F.col("__tile.reference_frequency") / MHZ_TO_HZ).alias(
            "tiling_reference_frequency"
        ),
        F.col("__tile.shape").alias("tiling_shape"),
        F.trim(target_parts.getItem(0)).alias("tiling_target"),
        F.trim(target_parts.getItem(2)).alias("__ra_hms"),
        F.trim(target_parts.getItem(3)).alias("__dec_dms"),
    )
    tiles = tiles.withColumns(
        {
            "tiling_ra": K.hms_to_degrees("__ra_hms"),
            "tiling_dec": K.dms_to_degrees("__dec_dms"),
        }
    ).drop("__ra_hms", "__dec_dms")
    return surrogate_key(tiles, "tiling_config_id", ["observation_id", "__pos"])


def get_beam_df(wide: DataFrame) -> DataFrame:
    """Beam rows: hostname from filename, explode host beams, coordinates
    to degrees, dedup (transform.py:440-516)."""
    beams = wide.select(
        "filename", "observation_id", F.explode("beams_host_beams").alias("__b")
    ).select(
        "observation_id",
        F.regexp_extract("filename", r"(tpn-\d+-\d+)", 1).alias("host_hostname"),
        F.col("__b.absnum").alias("beam_number"),
        F.col("__b.coherent").alias("beam_coherent"),
        K.hms_to_degrees(F.col("__b.ra_hms")).alias("beam_ra"),
        K.dms_to_degrees(F.col("__b.dec_dms")).alias("beam_dec"),
        F.col("__b.mc_ip").alias("host_ip_address"),
        F.col("__b.mc_port").alias("host_port"),
    )
    beams = beams.dropDuplicates(
        [
            "beam_number",
            "beam_coherent",
            "beam_dec",
            "host_ip_address",
            "host_port",
            "beam_ra",
            "observation_id",
            "host_hostname",
        ]
    )
    # Order-by must be a TOTAL order over the dedup subset — two beams
    # differing only in ra/dec/hostname would otherwise tie and receive
    # nondeterministic ids across runs (they share the (number, coherent,
    # observation_id) natural key, so incremental_load's existing-row
    # match would pick an arbitrary winner).
    return surrogate_key(
        beams,
        "beam_id",
        [
            "observation_id",
            "beam_number",
            F.col("beam_coherent").desc(),
            "host_ip_address",
            "host_port",
            "beam_ra",
            "beam_dec",
            "host_hostname",
        ],
    )


def get_host_df(beam_df: DataFrame) -> DataFrame:
    """Unique hosts (transform.py:519-527)."""
    hosts = beam_df.select("host_ip_address", "host_hostname", "host_port").dropDuplicates()
    return surrogate_key(hosts, "host_id", ["host_hostname", "host_ip_address", "host_port"])


def _join(validate: bool, left: DataFrame, right: DataFrame, on, how="inner",
          expect="m:m") -> DataFrame:
    if validate:
        return validated_join(left, right, on, how=how, expect=expect)
    on_list = [on] if isinstance(on, str) else list(on)
    return left.join(right, on_list, how)


def transform_observation(df: DataFrame, validate: bool = True) -> ObservationTables:
    """Observation transform entrypoint (transform.py:26-105).

    ``validate=False`` skips the cardinality checks and null-FK count
    jobs (each is an extra Spark action) for production throughput; the
    checks mirror the reference's runtime assertions and stay on in
    tests.
    """
    sb_df = get_sb_df(df)

    obs_uniq = dedup_keep_first(
        df, ["obs_t_min"], [F.col("obs_t_max").asc_nulls_last(), "filename"]
    )
    obs_df = get_obs_df(obs_uniq, sb_df, validate=validate)
    cb_table, cb_map = get_coherent_beam_config_df(obs_uniq, validate=validate)
    tiling_df = get_tiling_config_df(obs_uniq, obs_df, validate=validate)

    if validate:
        # Null-FK invariant (transform.py:98-104): every observation must
        # sit inside a schedule block (+1h grace).
        n_orphans = obs_df.where(F.col("schedule_block_id").isNull()).count()
        if n_orphans:
            raise UnexpectedShapeError(
                f"Merge resulted in {n_orphans} null schedule_block_id."
            )

    # Wide frame: one row per input file, annotated with every id.
    base = df.select("filename", "sb_start_at", "obs_t_min", "obs_t_max", "beams_host_beams")
    wide = _join(
        validate,
        base,
        sb_df.select("sb_start_at", "schedule_block_id", "meerkat_schedule_block_id"),
        on="sb_start_at",
        how="left",
        expect="m:1",
    )
    wide = _join(
        validate,
        wide,
        obs_df.select("obs_t_min", "observation_id").join(
            F.broadcast(cb_map), "obs_t_min", "left"
        ),
        on="obs_t_min",
        how="left",
        expect="m:1",
    ).drop(base["obs_t_max"])

    beam_df = get_beam_df(wide)
    # beam_df feeds host derivation, the beam table, the beam_obs as-of
    # frame, and (with validate) a null scan — cache the explode output.
    from pyspark import StorageLevel

    beam_df = beam_df.persist(StorageLevel.MEMORY_AND_DISK)
    host_df = get_host_df(beam_df)
    beam_df = _join(
        validate,
        beam_df,
        host_df,
        on=["host_ip_address", "host_hostname", "host_port"],
        how="left",
        expect="m:1",
    )

    if validate:
        for frame, col in ((wide, "observation_id"), (beam_df, "host_id")):
            if frame.where(F.col(col).isNull()).limit(1).count():
                raise UnexpectedShapeError(f"Merge resulted in null {col}.")

    # s_ra/s_dec on the observation = first tiling's coordinates
    # (deterministic stand-in for the reference's join-order-dependent
    # pick, transform.py:412-418).
    first_tile = tiling_df.where(F.col("__pos") == 0).select(
        "observation_id",
        F.col("tiling_ra").alias("obs_s_ra"),
        F.col("tiling_dec").alias("obs_s_dec"),
    )
    obs_full = obs_df.join(F.broadcast(cb_map), "obs_t_min", "left").join(
        first_tile, "observation_id", "left"
    )

    observation = obs_full.select(
        F.col("observation_id").alias("id"),
        F.col("obs_t_min").alias("t_min"),
        F.col("obs_t_max").alias("t_max"),
        F.col("obs_em_min").alias("em_min"),
        F.col("obs_em_max").alias("em_max"),
        F.col("obs_em_xel").alias("em_xel"),
        F.col("obs_pol_xel").alias("pol_xel"),
        F.col("obs_pol_states").alias("pol_states"),
        F.col("obs_dataproduct_type").alias("dataproduct_type"),
        F.col("obs_facility_name").alias("facility_name"),
        F.col("obs_instrument_name").alias("instrument_name"),
        F.col("obs_t_resolution").alias("t_resolution"),
        F.col("obs_s_ra").alias("s_ra"),
        F.col("obs_s_dec").alias("s_dec"),
        "schedule_block_id",
        "coherent_beam_config_id",
    )
    schedule_block = sb_df.select(
        F.col("schedule_block_id").alias("id"),
        F.col("sb_start_at").alias("start_at"),
        F.col("sb_est_end_at").alias("est_end_at"),
    )
    meerkat_schedule_block = sb_df.select(
        F.col("meerkat_schedule_block_id").alias("id"),
        F.col("mk_sb_meerkat_id").alias("meerkat_id"),
        F.col("mk_sb_meerkat_id_code").alias("meerkat_id_code"),
        F.col("mk_sb_proposal_id").alias("proposal_id"),
        "schedule_block_id",
    )
    host = host_df.select(
        F.col("host_id").alias("id"),
        F.col("host_ip_address").alias("ip_address"),
        F.col("host_hostname").alias("hostname"),
        F.col("host_port").alias("port"),
    )
    coherent_beam_config = cb_table.select(
        F.col("coherent_beam_config_id").alias("id"),
        F.col("cb_angle").alias("angle"),
        F.col("cb_fraction_overlap").alias("fraction_overlap"),
        F.col("cb_x").alias("x"),
        F.col("cb_y").alias("y"),
    )
    tiling_config = tiling_df.select(
        F.col("tiling_config_id").alias("id"),
        F.col("tiling_coordinate_type").alias("coordinate_type"),
        F.col("tiling_epoch").alias("epoch"),
        F.col("tiling_epoch_offset").alias("epoch_offset"),
        F.col("tiling_method").alias("method"),
        F.col("tiling_nbeams").alias("nbeams"),
        F.col("tiling_overlap").alias("overlap"),
        F.col("tiling_reference_frequency").alias("reference_frequency"),
        F.col("tiling_shape").alias("shape"),
        F.col("tiling_target").alias("target"),
        F.col("tiling_ra").alias("ra"),
        F.col("tiling_dec").alias("dec"),
        "observation_id",
    )
    beam = beam_df.select(
        F.col("beam_id").alias("id"),
        F.col("beam_number").alias("number"),
        F.col("beam_coherent").alias("coherent"),
        F.col("beam_ra").alias("ra"),
        F.col("beam_dec").alias("dec"),
        "observation_id",
        "host_id",
    )
    beam_obs = beam_df.join(
        F.broadcast(obs_df.select("observation_id", "obs_t_min")), "observation_id"
    ).select("beam_number", "beam_coherent", "obs_t_min", "beam_id")

    return ObservationTables(
        schedule_block=schedule_block,
        meerkat_schedule_block=meerkat_schedule_block,
        host=host,
        coherent_beam_config=coherent_beam_config,
        observation=observation,
        tiling_config=tiling_config,
        beam=beam,
        beam_obs=beam_obs,
    )
