from ska_src_maltopuft_etl_spark.sinks.relational import (
    TargetInformation,
    load_targets,
    prepare_data_for_insert,
)

__all__ = ["TargetInformation", "load_targets", "prepare_data_for_insert"]
