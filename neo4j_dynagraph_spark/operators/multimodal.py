"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct. The Spark-side plumbing — schemas, batch iteration,
partition sizing — is real and tested; the actual media decode is
STUBBED (the container has no image/audio libraries): `decode_stub`
raises NotImplementedError unless `fake=True`, in which case it emits a
deterministic fake feature vector so pipelines are testable end-to-end.

Scale design:
- payloads never pass through Python row-at-a-time: mapInPandas streams
  Arrow record batches, and the decode UDF sees a pandas Series of
  bytes per batch.
- binary-heavy tables should be repartitioned by size, not row count
  (`target_partition_bytes`) before heavy UDF stages, so one task's
  Arrow batch fits executor memory even when payloads are MBs each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
        StructField("payload_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_len", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — computed JVM-side
    (length + digest), no decode required."""
    p = F.col(payload_col)
    return df.withColumn("payload_len", F.length(p).cast("long")).withColumn(
        "payload_md5", F.md5(p)
    )


def docs_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test adapter: wrap documents.text as a binary payload so the
    multimodal path is exercisable on the driver testdata."""
    return attach_payload_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    ).select([f.name for f in MEDIA_SCHEMA.fields])


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """THE decode boundary. Real implementation requires media libs not
    present in this container; `fake=True` produces a deterministic
    8-dim feature from the payload bytes (for pipeline tests)."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not available here; "
            "run with fake=True for the deterministic test double"
        )
    acc = [0] * 8
    for i, byte in enumerate(payload[:4096]):
        acc[i % 8] = (acc[i % 8] * 31 + byte) % 100003
    return [a / 100003.0 for a in acc]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each UDF call receives a record batch; per-row Python
    touches only the payload bytes. The output schema is fixed
    (FEATURE_SCHEMA) so downstream similarity operators can consume the
    `feature` column like any embedding.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k, fake=fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_len": pdf["payload_len"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size-based repartitioning before heavy per-payload stages: pick
    the partition count from data volume, not row count."""
    n = max(1, total_bytes // target_partition_bytes)
    return df.repartition(int(n))
