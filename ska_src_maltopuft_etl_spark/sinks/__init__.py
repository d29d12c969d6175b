from ska_src_maltopuft_etl_spark.sinks.relational import (
    ATNF_TARGETS,
    MEERTRAP_TARGETS,
    incremental_load,
    TargetInformation,
    load_targets,
    prepare_data_for_insert,
)

__all__ = [
    "ATNF_TARGETS",
    "MEERTRAP_TARGETS",
    "TargetInformation",
    "incremental_load",
    "load_targets",
    "prepare_data_for_insert",
]
