"""Graph query operators over the star schema (SURVEY.md §2.3).

These re-express the reference's Cypher pattern-match queries
(cypher_query_timing.py:53-212) as DataFrame joins. The central
convention: interactions are undirected and stored canonically
(actor1 < actor2), so every neighbor-style operator symmetrizes first
(union of both orientations) — Cypher's undirected `-[]-` match has no
direct Spark analogue and getting this wrong silently halves/doubles
counts (SURVEY.md §7.3).

Scale notes:
- symmetrize() doubles the edge list with a union of projections — a
  narrow transformation, no shuffle.
- neighbors-of-one-actor pushes the anchor predicate into the scan
  (partition/row-group pruning on a columnar edge table).
- triangles() broadcasts the time-pruned edge set: after restricting to
  one frame/hour the edge set is small even at 100 TB total data, which
  turns a 3-way shuffle self-join into two broadcast joins. The staged
  dropDuplicates between expansions mirrors the reference's
  `WITH DISTINCT` stages (cypher_query_timing.py:163-198) and is
  required to cap intermediate cardinality (X5 in SURVEY.md §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def symmetrize(edges: DataFrame, a1: str = "actor1", a2: str = "actor2") -> DataFrame:
    """Canonical undirected edges -> both orientations (src, dst).

    Keeps all other columns. Equivalent of Cypher's `-[]-` undirected
    expansion (e.g. cypher_query_timing.py:119).
    """
    rest = [c for c in edges.columns if c not in (a1, a2)]
    fwd = edges.select(F.col(a1).alias("src"), F.col(a2).alias("dst"), *rest)
    rev = edges.select(F.col(a2).alias("src"), F.col(a1).alias("dst"), *rest)
    return fwd.unionByName(rev)


def neighbors(edges: DataFrame, actor: int) -> DataFrame:
    """Distinct neighbors of one actor (QUERY7, cypher_query_timing.py:117-121).

    One column: ``actor``. The OR-anchor filter is pushed into the scan.
    """
    return (
        edges.where((F.col("actor1") == actor) | (F.col("actor2") == actor))
        .select(
            F.when(F.col("actor1") == actor, F.col("actor2"))
            .otherwise(F.col("actor1"))
            .alias("actor")
        )
        .distinct()
    )


def common_neighbors(edges: DataFrame, actor_a: int, actor_b: int) -> DataFrame:
    """Common neighbors of two actors (QUERY9/9b,
    cypher_query_timing.py:134-148) — semi-join form of the reference's
    COLLECT + IN formulation."""
    return neighbors(edges, actor_a).join(
        neighbors(edges, actor_b), "actor", "semi"
    )


def degree(edges: DataFrame) -> DataFrame:
    """Distinct-partner degree per actor (QUERY10,
    cypher_query_timing.py:151-155). Columns: actor, degree (desc).

    Endpoints are emitted with ONE explode generator instead of a
    union of two projections: a union makes Spark evaluate the whole
    distinct-edges subtree once per branch (no cross-branch CSE),
    doubling the upstream join work — measured 2x on the sf0.1 bench.
    """
    return (
        edges.select("actor1", "actor2")
        .distinct()
        .select(F.explode(F.array("actor1", "actor2")).alias("actor"))
        .groupBy("actor")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("degree"), "actor")
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate triangles a < b < c in an (already time-restricted)
    canonical edge set (QUERY11a/b/c, cypher_query_timing.py:158-203).

    Because edges are canonical (actor1 < actor2), each triangle is
    found exactly once by joining e1=(a,b), e2=(b,c), e3=(a,c) — no
    post-hoc distinct over permutations needed, but we dedup the edge
    set itself first (staged DISTINCT, X5).

    The edge set is broadcast: time-restriction makes it small relative
    to the full fact table, so both joins are broadcast-hash joins and
    the only shuffle is the final sort.
    """
    e = edges.select("actor1", "actor2").distinct()
    e1 = e.select(F.col("actor1").alias("a"), F.col("actor2").alias("b"))
    e2 = e.select(F.col("actor1").alias("b"), F.col("actor2").alias("c"))
    e3 = e.select(F.col("actor1").alias("a"), F.col("actor2").alias("c"))
    return (
        e1.join(broadcast(e2), "b")
        .join(broadcast(e3), ["a", "c"], "semi")
        .select("a", "b", "c")
        .orderBy("a", "b", "c")
    )
