"""sf1 chopping-invariance proofs for the mixture/IVF streaming twins
(round-13 verdict task 8 — the round-10 precedent applied to the only
streaming family without a 10x proof).

For each drain, the sf1 input (tools/gen_scale.py output) is re-staged
as N parquet files and drained with maxFilesPerTrigger=1 — N real
micro-batches through the batch_id-keyed stores — then compared
BIT-FOR-BIT against the batch twin on the same corpus. Prints one JSON
line per drain:

    {"query": ..., "rows": N, "batches": ..., "wall_sec": S,
     "equal_to_batch": true}

Usage:
    python tools/stream_mix_scale.py [sf_dir] [n_chunks] [q1,q2,...]

sf_dir defaults to /tmp/genscale/sf1.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_dynagraph_spark import get_spark  # noqa: E402


def _chunk_table(spark, path: str, n_chunks: int) -> str:  # noqa: ANN001
    """Re-stage one parquet table as n_chunks files in a fresh dir."""
    stage = tempfile.mkdtemp(prefix="dynagraph_mixchunks_")
    spark.read.parquet(path).repartition(n_chunks).write.mode(
        "overwrite"
    ).parquet(stage)
    for f in os.listdir(stage):  # _SUCCESS/.crc would trip the reader
        if not f.endswith(".parquet"):
            os.remove(os.path.join(stage, f))
    return stage


def _rows(df) -> list[tuple]:  # noqa: ANN001
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    import pyspark.sql.functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/genscale/sf1"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    spark = get_spark("stream-mix-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_dynagraph_spark.operators import similarity, text
    from neo4j_dynagraph_spark.sources.tables import load_table

    docs_path = f"{sf_dir}/documents.parquet"
    emb_path = f"{sf_dir}/embeddings.parquet"

    def report(name, wall, streamed, batch):  # noqa: ANN001
        s, b = _rows(streamed), _rows(batch)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "n_chunks": n_chunks,
                    "rows": len(s),
                    "wall_sec": round(wall, 1),
                    "equal_to_batch": s == b,
                }
            ),
            flush=True,
        )

    if only is None or "stream_unimax_mix" in only:
        from neo4j_dynagraph_spark.streaming.unimax import stream_unimax_mix

        schema = spark.read.parquet(docs_path).schema
        stage = _chunk_table(spark, docs_path, n_chunks)
        t0 = time.perf_counter()
        streamed = stream_unimax_mix(
            spark, stage, schema, max_files_per_trigger=1
        )
        streamed = streamed.localCheckpoint()
        wall = time.perf_counter() - t0
        batch = text.unimax_mix(spark.read.parquet(docs_path))
        report("stream_unimax_mix", wall, streamed, batch)

    if only is None or "stream_domain_weights" in only:
        from neo4j_dynagraph_spark.streaming.bigram_lm import (
            stream_domain_weights,
        )

        schema = spark.read.parquet(docs_path).schema
        stage = _chunk_table(spark, docs_path, n_chunks)
        t0 = time.perf_counter()
        streamed = stream_domain_weights(
            spark, stage, schema, train_source="src0", max_files_per_trigger=1
        )
        streamed = streamed.localCheckpoint()
        wall = time.perf_counter() - t0
        batch = text.domain_weights(
            spark.read.parquet(docs_path), train_source="src0"
        )
        report("stream_domain_weights", wall, streamed, batch)

    if only is None or "stream_soft_dedup" in only:
        from neo4j_dynagraph_spark.operators import dedup
        from neo4j_dynagraph_spark.streaming.soft_dedup import (
            stream_soft_dedup,
        )

        schema = spark.read.parquet(docs_path).schema
        stage = _chunk_table(spark, docs_path, n_chunks)
        t0 = time.perf_counter()
        streamed = stream_soft_dedup(
            spark, stage, schema, max_files_per_trigger=1
        )
        streamed = streamed.localCheckpoint()
        wall = time.perf_counter() - t0
        batch = dedup.soft_dedup(spark.read.parquet(docs_path))
        report("stream_soft_dedup", wall, streamed, batch)

    if only is None or "stream_ivf_assign" in only:
        from neo4j_dynagraph_spark.streaming.ivf import stream_ivf_assign

        emb = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
        centroids = emb.where(F.col("vec_id") < 32).select(
            F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
        )
        schema = spark.read.parquet(emb_path).schema
        stage = _chunk_table(spark, emb_path, n_chunks)
        t0 = time.perf_counter()
        cells = stream_ivf_assign(spark, stage, schema, centroids)
        cells = cells.localCheckpoint()
        wall = time.perf_counter() - t0
        batch = similarity.ivf_assign(emb, centroids, nprobe=1).select(
            "vec_id", "cell"
        )
        report("stream_ivf_assign", wall, cells, batch)


if __name__ == "__main__":
    main()
