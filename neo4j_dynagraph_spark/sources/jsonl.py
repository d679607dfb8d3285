"""JSONL (newline-delimited JSON) document source and sink.

Raw web-crawl / pipeline interchange dumps arrive as JSONL; this is
the ingestion edge that feeds the documents table schema the rest of
the engine operates on (dedup / curation / chunking / mixture
sampling). Counterpart to the GEXF edge for spell data.

Scale notes:

- ``spark.read.json`` with an EXPLICIT schema: schema inference is a
  full extra pass over the data (and non-deterministic under dirty
  rows) — never at 100 TB. The documents schema is pinned here.
- JSONL is line-splittable, so a directory of .jsonl(.gz) shards
  parallelizes like parquet (gzip shards are per-file parallel only —
  noted, use zstd/none for giant shards).
- ``columnNameOfCorruptRecord`` captures undecodable lines into a
  quarantine column instead of failing the stage or silently dropping
  (mode=PERMISSIVE is Spark's default; the explicit quarantine column
  makes the drop ACCOUNTABLE — the same drop-accounting discipline as
  the LSH bucket caps).
- The sink writes through the DataFrameWriter json path (one shard
  per partition); round-trip is exact for the documents schema.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_documents(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read JSONL documents with the pinned schema.

    Undecodable lines land in the quarantine column; by default they
    are dropped AFTER being countable by the caller (pass
    keep_corrupt=True to inspect them — e.g. route to a dead-letter
    sink). Well-formed rows missing a field get NULL for it, the
    permissive-ingest contract.

    Spark restriction: a query over the RAW scan that references ONLY
    the quarantine column raises QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    project at least one data column alongside it (or persist first)
    when filtering the dead-letter rows.
    """
    schema = StructType(
        DOCUMENTS_SCHEMA.fields + [StructField(_CORRUPT, StringType())]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def corrupt_lines(spark: SparkSession, path: str) -> DataFrame:
    """Dead-letter reader: the raw lines that do NOT parse as a
    documents JSON object — route these to a quarantine sink.

    Implemented as read.text + from_json-is-null rather than the
    corrupt-record column: Spark disallows corrupt-column-only queries
    over a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
    dead-letter pipeline queries exactly that shape. A line-level
    re-scan is also the honest cost model — the quarantine path reads
    the bytes once more only when someone asks for the bad rows.
    """
    lines = spark.read.text(path)
    schema = StructType(
        DOCUMENTS_SCHEMA.fields + [StructField(_CORRUPT, StringType())]
    )
    parsed = F.from_json(
        F.col("value"), schema, {"columnNameOfCorruptRecord": _CORRUPT}
    )
    return lines.where(parsed[_CORRUPT].isNotNull()).select(
        F.col("value").alias("line")
    )


def write_jsonl_documents(docs: DataFrame, path: str, shards: int | None = None) -> None:
    """Write documents as JSONL shards (one file per partition).

    ``shards`` repartitions first — size shards for the consumer
    (~100 MB-1 GB each), not for the writer's current partitioning.
    """
    out = docs.select([f.name for f in DOCUMENTS_SCHEMA.fields])
    if shards is not None:
        out = out.repartition(shards)
    out.write.mode("overwrite").json(path)
