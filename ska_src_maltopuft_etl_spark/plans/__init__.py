from ska_src_maltopuft_etl_spark.plans.registry import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
