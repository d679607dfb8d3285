"""Interval-overlap join: the bucketed-hash-join range join.

The reference's timeline tree prunes range scans by descending
year/month/day/hour levels (BaseTimeline.java's getNextLevel walk);
the Spark-native generalization for interval x interval OVERLAP is
bucket replication: replicate each interval into every fixed-width
time bucket it touches, equi-join on the bucket (so Catalyst plans a
shuffled HASH join, never a cartesian with a range predicate), and
apply the interval predicate within the bucket.

Two design points carry the 100 TB load:

- **first-shared-bucket dedup.** A pair overlapping across a bucket
  boundary matches in every shared bucket; instead of a global
  DISTINCT over the pair output (a shuffle that grows with the
  RESULT), each pair is emitted only from the bucket containing its
  overlap start — a free per-row predicate, since that instant lies
  in both intervals and hence in exactly one bucket.

- **bucket sizing.** Candidate work scales like
  (rows-per-bucket)^2 x buckets while replication is
  ~1 + interval_len/bucket. A bucket just above the typical interval
  length minimizes within-bucket quadratic work at <= 2 copies per
  interval; `auto_bucket_seconds` reads that off the data as the p99
  interval length (one cheap percentile_approx scan) rounded up to
  the next minute so boundary-aligned data stays aligned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def auto_bucket_seconds(
    intervals: DataFrame,
    t1: str = "t1",
    t2: str = "t2",
    quantile: float = 0.99,
) -> int:
    """Pick the overlap-join bucket width from the data: the p99
    interval length (percentile_approx — one aggregate scan, no sort),
    rounded UP to the next minute and floored at one minute.

    p99 rather than max: one pathological year-long interval must not
    force year buckets on everything (the tail intervals just
    replicate into more buckets — correctness is unaffected); rather
    than mean: a typical-length bucket keeps replication <= ~2 for 99%
    of rows, which is the quadratic-work sweet spot.
    """
    row = intervals.select(
        F.expr(
            f"percentile_approx({t2} - {t1}, {quantile})"
        ).alias("p")
    ).first()
    p = 0 if row is None or row.p is None else int(row.p)
    return max(60, ((p + 59) // 60) * 60)


def interval_overlap_join(
    intervals: DataFrame,
    bucket_seconds: int | None = None,
    id_col: str = "event_id",
    key_col: str = "user_id",
    t1: str = "t1",
    t2: str = "t2",
    right: DataFrame | None = None,
) -> DataFrame:
    """Intervals [t1, t2) (epoch seconds) that OVERLAP, as a bucketed
    hash join — never a cartesian.

    Self-join form (``right=None``): pairs across DISTINCT keys with
    key1 < key2 canonical ordering (the ``a.key < b.key`` predicate
    both canonicalizes and de-duplicates the symmetric pair).

    Two-relation form (``right=...``): every (left, right) interval
    pair that overlaps, NO key predicate — the general range join
    (readings x maintenance windows, sessions x campaigns). Both
    inputs must carry the same four column names; each side is
    bucket-replicated independently and the same first-shared-bucket
    predicate keeps the pair set exactly-once at any bucket width.

    Returns (e1, e2, u1, u2, overlap_s) with
    overlap_s = min(t2) - max(t1) > 0. Empty intervals (t2 <= t1 —
    no instants under the half-open contract) are filtered out of
    both sides, so the overlap_s > 0 guarantee holds for arbitrary
    inputs. `bucket_seconds` defaults to
    :func:`auto_bucket_seconds` on the input (the union of both sides
    in the two-relation form — an extra O(1)-output aggregate job;
    pass it explicitly in hot paths or when the width is known, e.g.
    hour buckets for 30-min spells).
    """
    cols = [id_col, key_col, t1, t2]
    if bucket_seconds is None:
        sized = (
            intervals.select(t1, t2)
            if right is None
            else intervals.select(t1, t2).unionByName(right.select(t1, t2))
        )
        bucket_seconds = auto_bucket_seconds(sized, t1, t2)
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w = F.lit(bucket_seconds)

    def bucketed(df: DataFrame) -> DataFrame:
        # half-open [t1, t2) contract: an EMPTY interval (t2 <= t1)
        # contains no instants, so it can overlap nothing — but the
        # strict predicates below (a.t1 < b.t2 && b.t1 < a.t2) can
        # still both hold against it with min(t2) - max(t1) = 0,
        # violating the documented overlap_s > 0 contract, and
        # F.sequence(t1 div w, (t2-1) div w) would step DESCENDING.
        # Filter degenerates out at the scan so arbitrary inputs keep
        # the contract (all current callers use positive spell
        # lengths; this is the latent-input guard).
        return df.select(*cols).filter(F.col(t2) > F.col(t1)).withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    (F.col(t1) / w).cast("long"),
                    ((F.col(t2) - 1) / w).cast("long"),
                )
            ),
        )

    a = bucketed(intervals).alias("a")
    b = bucketed(intervals if right is None else right).alias("b")
    key_pred = (
        F.col(f"a.{key_col}") < F.col(f"b.{key_col}")
        if right is None
        else F.lit(True)
    )
    return a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & key_pred
        & (F.col(f"a.{t1}") < F.col(f"b.{t2}"))
        & (F.col(f"b.{t1}") < F.col(f"a.{t2}"))
        # first-shared-bucket predicate: emit each pair exactly once,
        # from the bucket holding its overlap start
        & (
            F.col("a._bucket")
            == (F.greatest(F.col(f"a.{t1}"), F.col(f"b.{t1}")) / w).cast("long")
        ),
    ).select(
        F.col(f"a.{id_col}").alias("e1"),
        F.col(f"b.{id_col}").alias("e2"),
        F.col(f"a.{key_col}").alias("u1"),
        F.col(f"b.{key_col}").alias("u2"),
        (
            F.least(F.col(f"a.{t2}"), F.col(f"b.{t2}"))
            - F.greatest(F.col(f"a.{t1}"), F.col(f"b.{t1}"))
        ).alias("overlap_s"),
    )
