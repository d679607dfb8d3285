"""Skew stress for the wedge stream: planted hot hub, cap vs no cap.

The link-prediction/triadic operators enumerate wedges by self-joining
the symmetrized edge list on the CENTER key (operators/graph.py
_wedge_pairs). A hub of degree H produces C(H,2) wedge OUTPUT rows
from H join INPUT rows — the same quadratic compute-skew shape the
salted ingest join guards against (tools/skew_stress.py), and the
same reason AQE's skew split does NOT engage: OptimizeSkewedJoin keys
on shuffle-partition BYTES of the join INPUT, and a 20k-row hot
partition is only a few hundred KB. Salting does not apply here
either (both sides of the self-join carry the same hot key, so
replication just moves the quadratic blowup). The engine's guardrail
is the SEMANTIC degree cap (GDS upperDegreeCutoff parity,
link_scores/_wedge_pairs max_center_degree).

This tool plants the fixture — n_cliques cliques of size c (the cold,
useful wedges) plus ONE hub of degree hot_deg (the saturated center)
— runs the real wedge aggregate uncapped vs capped, and prints one
JSON line per variant with wall, wedge count, the max/median
shuffle-output partition rows (whether one task absorbed the hub),
and whether AQE rewrote the join (skew-split engagement, read from
the post-action executed plan).

    python tools/skew_stress_wedge.py [n_cliques] [c] [hot_deg] [cap]

Defaults: 2000 cliques x 8 + one degree-20000 hub, cap=64. Cold
wedges 2000*8*C(7,2) = 336k; hub wedges C(20000,2) ~= 2.0e8 (99.8%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from neo4j_dynagraph_spark import get_spark  # noqa: E402
from neo4j_dynagraph_spark.operators.graph import _wedge_pairs  # noqa: E402


def planted_graph(spark, n_cliques: int, c: int, hot_deg: int):
    """Edges: cliques of size c on ids [g*c, (g+1)*c), plus a star of
    hot_deg leaves around hub id n_cliques*c. Generated JVM-side."""
    pairs = [(i, j) for i in range(c) for j in range(i + 1, c)]
    cliques = (
        spark.range(n_cliques)
        .select(F.col("id").alias("g"))
        .select(
            "g",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
                        for i, j in pairs
                    ]
                )
            ).alias("p"),
        )
        .select(
            (F.col("g") * c + F.col("p.i")).alias("actor1"),
            (F.col("g") * c + F.col("p.j")).alias("actor2"),
        )
    )
    hub = n_cliques * c
    star = spark.range(hot_deg).select(
        F.lit(hub).alias("actor1"),
        (F.col("id") + hub + 1).alias("actor2"),
    )
    return cliques.unionByName(star)


def main() -> None:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hot_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    spark = get_spark("skew-stress-wedge")
    spark.sparkContext.setLogLevel("ERROR")
    edges = planted_graph(spark, n_cliques, c, hot_deg).localCheckpoint()

    for label, mcd in (("uncapped", None), (f"capped_{cap}", cap)):
        w = _wedge_pairs(edges, max_center_degree=mcd)
        # per-OUTPUT-partition row counts: if one task absorbed the
        # hub's C(H,2) wedges, max >> median
        t0 = time.perf_counter()
        parts = (
            w.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum("n").alias("wedges"),
                F.max("n").alias("max_part"),
                F.expr("percentile(n, 0.5)").alias("med_part"),
                F.count(F.lit(1)).alias("n_parts"),
            )
            .first()
        )
        wall = time.perf_counter() - t0
        plan = w._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "variant": label,
                    "n_cliques": n_cliques,
                    "clique_size": c,
                    "hot_deg": hot_deg,
                    "wedges": int(parts.wedges),
                    "max_partition_rows": int(parts.max_part),
                    "median_partition_rows": float(parts.med_part),
                    "n_partitions": int(parts.n_parts),
                    "aqe_skew_split": "skewed=true" in plan
                    or "REBALANCE" in plan,
                    "wall_sec": round(wall, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
