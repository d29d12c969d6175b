from ska_src_maltopuft_etl_spark.sources.testdata import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
