"""Skew stress for the triangle-enumeration family: planted MIDDLE hub,
cap vs no cap.

The triangle join (operators/graph.py:triangles) chains
e1=(a,b) x e2=(b,c) on the middle vertex b, then a closing semi-join.
tools/skew_stress_wedge.py's star hub does NOT stress this shape: its
leaves only ever appear as actor2, so the hub row count through the
b-key is zero. The explosive fixture is a hub with neighbors on BOTH
sides of the canonical order — d_lo edges (x, hub) and d_hi edges
(hub, y) produce d_lo * d_hi INTERMEDIATE rows before the semi-join
discards them (the planted leaves close no triangles), i.e. quadratic
intermediate output from linear input. As with the wedge stream, AQE's
OptimizeSkewedJoin keys on shuffle-partition INPUT bytes and never
splits this, so the whole d_lo*d_hi block lands in one task; the
engine's guardrail is the SEMANTIC degree cap
(triangles(max_degree=...) / degree_cap_subgraph, GDS maxDegree
parity — q_triangles_capped / q_clustering_capped / q_ktruss_capped).

Runs triangles, the clustering-coefficient aggregate, and the bounded
truss peel, uncapped vs capped, and prints one JSON line per (query,
variant) with the wall and the result count.

    python tools/skew_stress_triangles.py [n_cliques] [c] [hot_deg] [cap]

Defaults: 2000 cliques x 8 + one middle hub with 6000+6000 neighbors,
cap=64. Cold triangles 2000*C(8,3) = 112k; hub intermediates
6000*6000 = 3.6e7 (all discarded by the closing semi-join).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.operators.graph import (  # noqa: E402
    degree_cap_subgraph,
    k_truss_rounds,
    triangles,
)
from tools.skew_stress_wedge import planted_graph  # noqa: E402


def middle_hub(spark, base_edges, hub: int, d_lo: int, d_hi: int):
    """Attach a hub with d_lo lower-id and d_hi upper-id fresh
    neighbors: canonical edges (lo_i, hub) and (hub, hi_j), so the
    b-keyed triangle join emits d_lo*d_hi intermediates at b=hub."""
    # lower-side neighbor ids sit in [hub - d_lo, hub) — callers place
    # the hub at max_clique_id + d_lo + 1 so both fresh blocks are
    # disjoint from the cliques and straddle the hub id
    lo = spark.range(d_lo).select(
        (F.col("id") + hub - d_lo).alias("actor1"), F.lit(hub).alias("actor2")
    )
    hi = spark.range(d_hi).select(
        F.lit(hub).alias("actor1"), (F.col("id") + hub + 1).alias("actor2")
    )
    return base_edges.unionByName(lo).unionByName(hi)


def main() -> None:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hot_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 12000
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    spark = get_spark("skew-stress-triangles")
    spark.sparkContext.setLogLevel("ERROR")
    cliques = planted_graph(spark, n_cliques, c, 0)  # hot_deg=0: no star
    hub = n_cliques * c + hot_deg // 2 + 1
    edges = middle_hub(
        spark, cliques, hub, hot_deg // 2, hot_deg - hot_deg // 2
    ).localCheckpoint()

    def run(label, fn):
        for variant, capped in (("uncapped", None), (f"capped_{cap}", cap)):
            t0 = time.perf_counter()
            n = fn(capped).count()
            wall = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "query": label,
                        "variant": variant,
                        "n_cliques": n_cliques,
                        "clique_size": c,
                        "hot_deg": hot_deg,
                        "rows": int(n),
                        "wall_sec": round(wall, 1),
                    }
                ),
                flush=True,
            )

    run("triangles", lambda mcd: triangles(edges, max_degree=mcd))

    def clustering(mcd):
        e = edges if mcd is None else degree_cap_subgraph(edges, mcd)
        tri = triangles(e)
        return (
            tri.select(F.explode(F.array("a", "b", "c")).alias("actor"))
            .groupBy("actor")
            .agg(F.count(F.lit(1)).alias("n_tri"))
        )

    run("clustering_agg", clustering)

    def truss(mcd):
        e = edges if mcd is None else degree_cap_subgraph(edges, mcd)
        return k_truss_rounds(e, k=4, rounds=2)

    run("ktruss_rounds2", truss)


if __name__ == "__main__":
    main()
