from yadf_spark.streaming.dedup import (
    compact_band_index,
    dedup_stream,
    incremental_near_dup_batch,
    streaming_near_dup,
    with_content_hash,
)

__all__ = [
    "compact_band_index",
    "dedup_stream",
    "incremental_near_dup_batch",
    "streaming_near_dup",
    "with_content_hash",
]
