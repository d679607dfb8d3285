"""Scalar function library (SURVEY.md §2.8).

Everything here is a pure Column -> Column combinator built from JVM
built-ins (whole-stage-codegen friendly; no Python UDFs). Each maps a
reference behavior:

- calendar decomposition   <- load_gexf_to_neo4j.py:137-142 (F1)
- ctime formatting         <- load_gexf_to_neo4j.py:179 (F2)
- printf name synthesis    <- load_gexf_to_neo4j.py:179,213,220 (F4)
- grid alignment           <- load_gexf_to_neo4j.py:69-71 (F5)
- pair canonicalization    <- load_gexf_to_neo4j.py:201-202 (F6)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# ---------------------------------------------------------------- time


def epoch_seconds(ts: Column | str) -> Column:
    """POSIX seconds (truncated) from a timestamp column.

    Reference stores integer POSIX time (load_gexf_to_neo4j.py:9,66-67).
    """
    return F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)


def frame_id(es: Column, delta: int, start: int = 0) -> Column:
    """Tumbling-window frame id for epoch-seconds ``es``.

    ``floor((es - start) / delta)`` — the relational form of the
    reference's get_intervals grid (load_gexf_to_neo4j.py:69-71).
    """
    return F.floor((es - F.lit(start)) / F.lit(delta)).cast("long")


def frame_start(fid: Column, delta: int, start: int = 0) -> Column:
    """Inverse of :func:`frame_id`: the frame's inclusive start (epoch s)."""
    return (fid * F.lit(delta) + F.lit(start)).cast("long")


def align_to_grid(es: Column, delta: int, start: int = 0) -> Column:
    """Align a timestamp down to the frame grid (F5).

    ``es - ((es - start) % delta)`` — load_gexf_to_neo4j.py:70.
    """
    return (es - ((es - F.lit(start)) % F.lit(delta))).cast("long")


def date_parts(ts: Column) -> list[Column]:
    """year..second columns, mirroring FRAME's denormalized parts
    (load_gexf_to_neo4j.py:137-142) — UTC, not the reference's localtime."""
    return [
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        F.second(ts).alias("second"),
    ]


def ctime(ts: Column) -> Column:
    """``time.ctime()``-style string (F2, load_gexf_to_neo4j.py:179)."""
    return F.date_format(ts, "EEE MMM d HH:mm:ss yyyy")


# ---------------------------------------------------------------- names


def actor_name(actor: Column) -> Column:
    """'ACTOR_%04d' (load_gexf_to_neo4j.py:213)."""
    return F.format_string("ACTOR_%04d", actor)


def frame_name(fid: Column) -> Column:
    """'FRAME_%05d' (load_gexf_to_neo4j.py:179)."""
    return F.format_string("FRAME_%05d", fid)


def interaction_name(a1: Column, a2: Column) -> Column:
    """'INTERACTION_%04d_%04d' (load_gexf_to_neo4j.py:220)."""
    return F.format_string("INTERACTION_%04d_%04d", a1, a2)


# ---------------------------------------------------------------- pairs


def canonical_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """Undirected-edge canonical ordering: (min, max) so actor1 < actor2
    (F6, load_gexf_to_neo4j.py:201-202). The single most correctness-
    critical convention in the engine (SURVEY.md §7.3)."""
    return F.least(a, b), F.greatest(a, b)


# ---------------------------------------------------------------- hashing


def hash64(col: Column) -> Column:
    """Deterministic 60-bit hash, identical in Spark and ANSI SQL
    engines: first 15 hex chars of md5 as an integer (< 2^60, so it
    stays inside signed BIGINT in both engines — 16 chars could not).

    Used by MinHash/fingerprint operators so the DuckDB oracle can
    reproduce signatures bit-for-bit
    (Spark: conv(substr(md5(x),1,15),16,10); DuckDB: ('0x'||...)::BIGINT).
    60 bits puts the band-key collision birthday bound near 10^9 keys;
    the previous 32-bit width saturated around 65 k (visible as false
    candidate pairs at billion-doc scale, all rejected by the verify
    stage but paying its cost).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash64(col: Column, seed: int) -> Column:
    """hash64 with a seed prefix — the family of hash functions for
    MinHash signatures."""
    return hash64(F.concat(F.lit(f"s{seed}:"), col))


# ---------------------------------------------------------------- text


TOKEN_PATTERN = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercased word tokens (whitespace/punct split), empty strings
    dropped. Matches DuckDB's regexp_split_to_array form used in oracles."""
    return F.filter(
        F.split(F.lower(text), TOKEN_PATTERN),
        lambda t: t != F.lit(""),
    )
