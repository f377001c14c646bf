from dbt_osmosis_spark.streaming.ingest import (
    content_hashes,
    dedup_batch_against_index,
    index_bloom_bits,
    run_dedup_ingest,
)
from dbt_osmosis_spark.streaming.events import (
    hourly_counts,
    run_to_memory,
    session_aggregate,
    stream_events,
)

__all__ = [
    "stream_events",
    "hourly_counts",
    "session_aggregate",
    "run_to_memory",
    "content_hashes",
    "dedup_batch_against_index",
    "index_bloom_bits",
    "run_dedup_ingest",
]
