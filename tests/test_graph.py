"""Graph operators on a hand-built edge set with known answers
(undirected semantics — the top correctness risk, SURVEY.md §7.3)."""

from __future__ import annotations

import pytest

from neo4j_dynagraph_spark.operators import graph

# canonical edges of: triangle 1-2-3, plus path 3-4, 4-5, and edge 1-5
EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 5)]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "actor1 long, actor2 long")


def test_symmetrize_doubles_rows(edges):
    sym = graph.symmetrize(edges)
    assert sym.count() == 2 * len(EDGES)
    assert set(sym.columns) == {"src", "dst"}


def test_neighbors_undirected(edges):
    # neighbors(3) must include both orientations: 1,2 (as actor2) and 4
    got = sorted(r.actor for r in graph.neighbors(edges, 3).collect())
    assert got == [1, 2, 4]


def test_common_neighbors(edges):
    got = sorted(r.actor for r in graph.common_neighbors(edges, 1, 3).collect())
    assert got == [2]  # 1's neighbors {2,3,5}; 3's {1,2,4}
    got2 = sorted(r.actor for r in graph.common_neighbors(edges, 2, 5).collect())
    assert got2 == [1]  # 2's {1,3}; 5's {1,4}


def test_degree(edges):
    got = {r.actor: r.degree for r in graph.degree(edges).collect()}
    assert got == {1: 3, 2: 2, 3: 3, 4: 2, 5: 2}


def test_triangles_exactly_once(edges):
    got = [(r.a, r.b, r.c) for r in graph.triangles(edges).collect()]
    assert got == [(1, 2, 3)]


def test_triangles_dedups_multiedges(spark):
    # duplicated edge rows (multiple frames) must not multiply triangles
    dup = spark.createDataFrame(EDGES + EDGES, "actor1 long, actor2 long")
    got = [(r.a, r.b, r.c) for r in graph.triangles(dup).collect()]
    assert got == [(1, 2, 3)]
