from ska_src_maltopuft_etl_spark.streaming.ingest import (
    sessionize_events,
    stream_run_summaries,
    stream_with_watermark_dedup,
)

__all__ = [
    "sessionize_events",
    "stream_run_summaries",
    "stream_with_watermark_dedup",
]
