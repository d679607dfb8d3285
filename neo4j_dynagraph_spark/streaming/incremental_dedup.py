"""Incremental corpus deduplication: first-seen content-hash filter.

The batch exact-dedup operator (operators/dedup.py) answers "which
docs in THIS corpus are duplicates". Continuous ingestion needs the
incremental form: as document batches stream in, emit only docs whose
content hash has never been seen in ANY earlier batch, maintaining the
seen-hash set durably — the "have we seen this doc before" service a
100 TB crawl pipeline runs at the ingest edge.

Built from the existing pieces: a file-streamed documents source,
foreachBatch (micro-batch commits), and the versioned
:class:`~neo4j_dynagraph_spark.streaming.upsert.DimensionStore` as the
seen-hash set (atomic pointer flip, idempotent merge). Replay safety:
the per-batch output is written to a path keyed by batch_id with
overwrite, so a re-delivered batch overwrites its own output instead
of duplicating it, and the hash-set merge is a set union — both
operations idempotent, the foreachBatch exactly-once recipe.

Semantics: FIRST-SEEN wins (arrival order). When batches arrive in
doc_id order — as a backfill over sorted shards does — this equals the
batch operator's min-doc_id survivor rule, which is what lets the
DuckDB oracle verify the drained result exactly.

At scale the store read-back join is a broadcast while the seen-set is
dimension-sized; past that, swap the DimensionStore for a real table
format (Delta/Iceberg MERGE) — the protocol is unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from neo4j_dynagraph_spark.streaming.upsert import DimensionStore


def stream_dedup_documents(
    spark: SparkSession,
    docs_path: str,
    schema,  # noqa: ANN001
    store_root: str | None = None,
    out_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a documents file-stream through the first-seen filter.

    Returns the surviving (doc_id, content_hash) set as a batch
    DataFrame read back from the per-batch output directories.
    """
    from neo4j_dynagraph_spark.streaming.staging import (
        drain_dirs,
        stage_single_file,
    )

    store_root, ckpt, src_stage, eph = drain_dirs(
        store_root, "dynagraph_dedup_"
    )
    # out_dir is NOT ephemeral: it backs the returned DataFrame (the
    # surviving-docs output is data-sized — callers own its lifetime)
    out_dir = out_dir or tempfile.mkdtemp(prefix="dynagraph_dedup_out_")
    store = DimensionStore(spark, store_root, ["content_hash"])

    # stage single-file fixtures behind a symlink (no sentinel needed —
    # foreachBatch has no watermark to push)
    docs_path = stage_single_file(docs_path, into=src_stage)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_path)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.select(
            "doc_id", F.md5("text").alias("content_hash")
        )
        # within-batch first-seen: min doc_id per hash
        batch_first = hashed.groupBy("content_hash").agg(
            F.min("doc_id").alias("doc_id")
        )
        seen = store.read()
        novel = (
            batch_first
            if seen is None
            else batch_first.join(
                F.broadcast(seen), "content_hash", "left_anti"
            )
        )
        # replay-safe emit: the output path is a pure function of
        # batch_id, so a re-delivered batch overwrites itself
        novel.select("doc_id", "content_hash").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id}")
        )
        store.merge(novel)

    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(os.path.join(out_dir, "batch_*"))
    if eph is not None:
        # the result reads out_dir, not the store — the first-seen
        # state + checkpoint are safe to delete in ephemeral mode
        shutil.rmtree(eph, ignore_errors=True)
    return out
