"""Streaming co-presence edges — stream-stream self-join.

The reference's FRAME_INTERACTION facts (load_gexf_to_neo4j.py:241-249)
are built in batch by pairing actors active in the same frame. This is
the incremental version: the events stream self-joined on the frame
grid, with watermarks bounding join state — each side only retains
events until the watermark passes their frame, so state is O(events in
the watermark horizon), not O(stream history).

Spark requirements encoded here (and why):
- both sides carry ``withWatermark`` and the join condition includes an
  event-time bound (|ts1 - ts2| < delta) in addition to the frame
  equality — without the time bound the state store could never evict.
- the downstream per-frame aggregation chains a second stateful
  operator after the join (supported with append-mode semantics in
  Spark 3.5+/4.x).

Drained with Trigger.AvailableNow, the result must equal the batch
``presence_to_frame_interactions`` edge set — q_stream_edges checks
exactly that against the batch SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_frame_edges(
    events: DataFrame,
    delta_seconds: int = 3600,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream -> (frame_id, actor1, actor2, weight) co-presence
    edges, weight = n_events(a1) * n_events(a2) exactly as the batch
    operator computes it (ingest.presence_to_frame_interactions).

    Implementation: self-join raw events on the tumbling frame id with
    an event-time bound, then aggregate pair multiplicities per frame.
    The join emits one row per EVENT pair, so count(*) per
    (frame, a1, a2) is already the product of per-actor event counts —
    the batch operator's n1*n2 — with no second join needed.
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        (F.floor(F.unix_timestamp(ts_col) / delta_seconds)).alias("fid"),
    )
    left = (
        base.select(
            F.col("u").alias("u1"), F.col("t").alias("t1"), F.col("fid").alias("fid1")
        ).withWatermark("t1", watermark)
    )
    right = (
        base.select(
            F.col("u").alias("u2"), F.col("t").alias("t2"), F.col("fid").alias("fid2")
        ).withWatermark("t2", watermark)
    )
    pairs = left.join(
        right,
        (F.col("fid1") == F.col("fid2"))
        & (F.col("u1") < F.col("u2"))
        # event-time bound: same frame implies |t1 - t2| < delta; stated
        # explicitly so the state store can evict by watermark
        & (F.col("t2") >= F.col("t1") - F.expr(f"INTERVAL {delta_seconds} SECONDS"))
        & (F.col("t2") <= F.col("t1") + F.expr(f"INTERVAL {delta_seconds} SECONDS")),
    )
    # one row per event pair -> count == n1 * n2. The window() keeps the
    # aggregation event-time-aware so append mode can finalize groups.
    return (
        pairs.groupBy(
            F.window(F.col("t1"), f"{delta_seconds} seconds").alias("w"),
            F.col("fid1").alias("frame_id"),
            F.col("u1").alias("actor1"),
            F.col("u2").alias("actor2"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .select("frame_id", "actor1", "actor2", "weight")
    )


def streaming_frame_edges_from_parquet(
    spark,  # noqa: ANN001
    parquet_path: str,
    schema,  # noqa: ANN001
    delta_seconds: int = 3600,
    ts_is_nanos: bool = False,
) -> DataFrame:
    """Bounded-drain runner (Trigger.AvailableNow, memory sink): returns
    the finalized edge set for differential testing against the batch
    operator.

    Append-mode window aggregation only emits windows the watermark has
    passed, and a drained stream's watermark stops at max_ts - delay —
    the trailing windows would be withheld forever. The runner stages a
    SENTINEL event far past the real data (alone in its own frame, so
    it can never produce a pair) purely to push the final watermark
    beyond every real window — the streaming equivalent of an
    end-of-stream flush marker.
    """
    import os
    import tempfile
    import uuid

    import pyspark.sql.functions as F_

    stage = tempfile.mkdtemp(prefix="dynagraph_edges_src_")
    if os.path.isfile(parquet_path):
        os.symlink(parquet_path, os.path.join(stage, os.path.basename(parquet_path)))
    else:
        for f in os.listdir(parquet_path):
            if f.endswith(".parquet"):
                os.symlink(
                    os.path.join(parquet_path, f), os.path.join(stage, f)
                )
    batch_df = spark.read.schema(schema).parquet(parquet_path)
    ts_field = "ts"
    mx = batch_df.agg(F_.max(ts_field)).first()[0]
    if mx is None:
        raise ValueError(f"no rows under {parquet_path}; nothing to stream")
    horizon_ns = 7 * 24 * 3600
    if ts_is_nanos:
        sentinel_ts = int(mx) + horizon_ns * 1_000_000_000
    else:
        sentinel_ts = mx  # timestamp type: shift below in expression
    sentinel = batch_df.limit(1)
    if ts_is_nanos:
        sentinel = sentinel.withColumn(ts_field, F_.lit(sentinel_ts).cast("long"))
    else:
        sentinel = sentinel.withColumn(
            ts_field, F_.col(ts_field) + F_.expr(f"INTERVAL {horizon_ns} SECONDS")
        )
    sentinel.write.mode("overwrite").parquet(os.path.join(stage, "_sentinel"))
    for f in os.listdir(os.path.join(stage, "_sentinel")):
        if f.endswith(".parquet"):
            os.rename(
                os.path.join(stage, "_sentinel", f),
                os.path.join(stage, f"zz_sentinel_{f}"),
            )
    parquet_path = stage
    stream = spark.readStream.schema(schema).parquet(parquet_path)
    if ts_is_nanos:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    edges = stream_frame_edges(stream, delta_seconds)
    sink_name = f"stream_edges_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="dynagraph_ckpt_")
    query = (
        edges.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink_name)
