from ska_src_maltopuft_etl_spark.operators.joins import (
    CardinalityError,
    asof_join_backward,
    interval_join,
    remap_keys,
    validated_join,
)
from ska_src_maltopuft_etl_spark.operators.dedup import (
    dedup_keep_first,
    surrogate_key,
)
from ska_src_maltopuft_etl_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)

__all__ = [
    "CardinalityError",
    "asof_join_backward",
    "connected_components",
    "dedup_clusters",
    "dedup_keep_first",
    "interval_join",
    "remap_keys",
    "surrogate_key",
    "validated_join",
]
