"""Equivalent-formulation pairs inside Spark — the reference's own test
technique (QUERY5/5b, 6/6b, 9/9b, 11a/b/c; SURVEY.md §5.2): compute the
same answer through different plans and assert identity."""

from __future__ import annotations

import pyspark.sql.functions as F

from neo4j_dynagraph_spark.operators import graph, ingest
from neo4j_dynagraph_spark.queries import (
    ACTOR1,
    ACTOR2,
    DELTA,
    FREQ_MIN,
    _edges,
    _presence,
)
from neo4j_dynagraph_spark.sources.tables import load_table, register_views
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_q5_dataframe_vs_sql_having(spark):
    df_form = (
        _presence(spark, SF_SMALL)
        .groupBy("actor")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") > FREQ_MIN)
    )
    register_views(spark, SF_SMALL, ["events"])
    sql_form = spark.sql(f"""
        SELECT user_id AS actor, count(DISTINCT floor(unix_timestamp(ts)/{DELTA})) AS freq
        FROM events GROUP BY user_id
        HAVING count(DISTINCT floor(unix_timestamp(ts)/{DELTA})) > {FREQ_MIN}
    """)
    assert _rows(df_form) == _rows(sql_form)


def test_q9_intersect_vs_semijoin(spark):
    edges = _edges(spark, SF_SMALL)
    semi = graph.common_neighbors(edges, ACTOR1, ACTOR2)
    intersected = graph.neighbors(edges, ACTOR1).intersect(
        graph.neighbors(edges, ACTOR2)
    )
    assert _rows(semi) == _rows(intersected)


def test_q6_dateparts_vs_range_filter(spark):
    ev = load_table(spark, SF_SMALL, "events")
    ts = F.col("ts")
    parts = (
        ev.where((F.col("user_id") == ACTOR1) & (F.year(ts) == 2024) & (F.month(ts) == 1))
        .select(F.dayofmonth(ts).alias("day"))
        .distinct()
    )
    rng = (
        ev.where(
            (F.col("user_id") == ACTOR1)
            & (ts >= F.lit("2024-01-01"))
            & (ts < F.lit("2024-02-01"))
        )
        .select(F.dayofmonth(ts).alias("day"))
        .distinct()
    )
    assert _rows(parts) == _rows(rng)


def test_q11_broadcast_vs_shuffle_plans(spark):
    ts = F.col("ts")
    edges = _edges(
        spark,
        SF_SMALL,
        (F.year(ts) == 2024) & (F.month(ts) == 1) & (F.dayofmonth(ts) == 10),
    ).select("actor1", "actor2")
    via_helper = graph.triangles(edges)
    # alternative formulation: plain (non-broadcast) three-way join
    e = edges.distinct()
    e1 = e.select(F.col("actor1").alias("a"), F.col("actor2").alias("b"))
    e2 = e.select(F.col("actor1").alias("b"), F.col("actor2").alias("c"))
    e3 = e.select(F.col("actor1").alias("a"), F.col("actor2").alias("c"))
    alt = (
        e1.join(e2, "b").join(e3, ["a", "c"], "semi").select("a", "b", "c")
    )
    assert _rows(via_helper) == _rows(alt)


def test_frame_enumeration_vs_distinct_presence(spark):
    ev = load_table(spark, SF_SMALL, "events")
    frames = ingest.enumerate_frames(ev, DELTA)
    presence_fids = ingest.events_to_presence(ev, DELTA).select("frame_id").distinct()
    # every presence frame exists in the enumerated grid
    missing = presence_fids.join(frames.select("frame_id"), "frame_id", "left_anti")
    assert missing.count() == 0


def test_sessionize_window_func_vs_session_window(spark):
    """q_sessionize's window-function formulation vs Spark's native
    F.session_window — same sessions (start, end, count) per user."""
    from neo4j_dynagraph_spark.queries import SPELL_LEN, q_sessionize

    mine = (
        q_sessionize(spark, SF_SMALL)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    ev = load_table(spark, SF_SMALL, "events")
    native = (
        ev.groupBy("user_id", F.session_window("ts", f"{SPELL_LEN} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
        .collect()
    )
    assert sorted(map(tuple, mine)) == sorted(map(tuple, native))


def test_co_present_equals_edge_neighbors(spark):
    """Equivalent-formulation pair (reference style, SURVEY.md §5): the
    presence-fact semi-join path must equal the pairwise-edge path."""
    from neo4j_dynagraph_spark.operators import graph, ingest
    from neo4j_dynagraph_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    presence = ingest.events_to_presence(load_table(spark, SF_SMALL, "events"))
    edges = ingest.presence_to_frame_interactions(presence)
    for actor in (1, 2, 7):
        via_fact = sorted(r.actor for r in graph.co_present(presence, actor).collect())
        via_edges = sorted(r.actor for r in graph.neighbors(edges, actor).collect())
        assert via_fact == via_edges


def test_q11_anchored_equals_filtered_triangles(spark):
    # the anchored QUERY11 shape must equal filtering the global
    # triangle enumeration to triangles containing the anchor and
    # projecting out the other two vertices (reference 11a/b/c are the
    # same assertion across formulations). Run at sf0.01: the pinned
    # hour has no edges at sf0.001.
    from neo4j_dynagraph_spark.queries import HOUR, REGISTRY, _hour_filter
    from tests.conftest import SF_MED

    anchored = _rows(REGISTRY["q11_anchored"].fn(spark, SF_MED))
    assert anchored, "pinned hour must produce rows at sf0.01"

    edges = (
        _edges(spark, SF_MED, _hour_filter(HOUR, HOUR + 1))
        .select("actor1", "actor2")
        .distinct()
    )
    ev = load_table(spark, SF_MED, "events").where(_hour_filter(HOUR, HOUR + 1))
    anchor = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id").limit(1).collect()[0][0]
    )
    tris = graph.triangles(edges).collect()
    expected = sorted(
        tuple(sorted(set((r.a, r.b, r.c)) - {anchor}))
        for r in tris
        if anchor in (r.a, r.b, r.c)
    )
    assert anchored == expected
