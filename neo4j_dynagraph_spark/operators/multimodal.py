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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
    ]
)


def resize_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize decode boundary (images). The fake double is deterministic:
    it re-chunks the payload to exactly width*height bytes (truncate or
    cycle), so tests can assert output size without a codec."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an image library not available here; "
            "run with fake=True for the deterministic test double"
        )
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize: payload -> payload (1:1 rows), metadata
    recomputed JVM-side afterwards so it can never drift from the new
    bytes. Same batch-shape discipline as extract_features."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        resize_stub(p, width, height, fake=fake)
                        for p in pdf["payload"]
                    ],
                }
            )

    resized = media.mapInPandas(
        run, "media_id long, kind string, payload binary"
    )
    return attach_payload_meta(resized).select(
        [f.name for f in MEDIA_SCHEMA.fields]
    )


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_nth: int = 2, fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling (video): each payload expands to 0..N
    frame rows — the 1-to-many batch shape (generator output rows need
    not align with input rows). The fake double treats the payload as a
    concatenation of fixed-size frames and keeps every `every_nth` one;
    a real implementation would seek keyframes via a codec."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "video frame extraction requires a codec not available here; "
            "run with fake=True for the deterministic test double"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = len(p) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "payload": frames,
                    "payload_len": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size-based repartitioning before heavy per-payload stages: pick
    the partition count from data volume, not row count."""
    n = max(1, total_bytes // target_partition_bytes)
    return df.repartition(int(n))
