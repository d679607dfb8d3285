from neo4j_dynagraph_spark.streaming.frames import (
    stream_tumbling_counts,
    streaming_frame_counts_from_parquet,
)
from neo4j_dynagraph_spark.streaming.sessions import (
    stateful_sessionize,
    stateful_sessions_from_parquet,
)

__all__ = [
    "stream_tumbling_counts",
    "streaming_frame_counts_from_parquet",
    "stateful_sessionize",
    "stateful_sessions_from_parquet",
]
