from ska_src_maltopuft_etl_spark.plans.meertrap.observation import (
    ObservationTables,
    transform_observation,
)
from ska_src_maltopuft_etl_spark.plans.meertrap.candidate import (
    CandidateTables,
    transform_spccl,
)
from ska_src_maltopuft_etl_spark.plans.meertrap.pipeline import meertrap_run

__all__ = [
    "CandidateTables",
    "ObservationTables",
    "meertrap_run",
    "transform_observation",
    "transform_spccl",
]
