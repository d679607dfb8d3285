"""Memory-sink lifecycle for bounded drains.

Every bounded-drain runner (Trigger.AvailableNow + memory sink) used to
return ``spark.table(sink_name)`` with a fresh uuid-suffixed sink per
call and NEVER drop it — each invocation parked a full result copy in
the driver heap forever. Repeated drains of a large result (the bench
protocol runs every query N=10 times; q_stream_edges at sf0.1 is
millions of rows) accumulated until the JVM OOMed.

``snapshot_and_drop`` fixes the lifecycle: snapshot the sink's rows
into checkpointed RDD blocks (MEMORY_AND_DISK — evictable, spillable,
and freed by the ContextCleaner once the returned DataFrame goes out
of scope), then drop the memory-sink temp view so the sink's row
buffer is unreachable as soon as the terminated query object is
collected. Net: at most ONE live copy per drain, reclaimed when the
caller drops the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def snapshot_and_drop(spark: SparkSession, sink_name: str) -> DataFrame:
    """Materialize a terminated memory sink and release it.

    Returns a DataFrame backed by checkpointed blocks, independent of
    the catalog entry (safe to use after the view is gone).
    """
    out = spark.table(sink_name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink_name)
    return out
