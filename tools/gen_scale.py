"""Synthetic scale-up generator for the sf1 spot-bench (SCALE.md).

/root/testdata is read-only and tops out at sf0.1; validating the
"would this plan survive 10x" claims needs bigger input. This rebuilds
the same star schema with the SAME per-SF scaling rules the driver
testdata follows (measured across sf0.001/0.01/0.1):

    events     1,000,000 * sf rows over 15,000 * sf users, Jan 2024
    lineitem   6,000,000 * sf    orders  1,500,000 * sf
    customer     150,000 * sf    part      200,000 * sf
    supplier      10,000 * sf    documents  50,000 * sf
    nation/region copied verbatim from the real sf0.1 dims

Event density per user-hour is constant across SFs in the driver data
(events and users both scale linearly), so co-presence edge counts per
frame grow ~quadratically with sf — the generator preserves that,
which is exactly what the graph-query scaling study needs to stress.

Deterministic (seed 42). Usage:

    python tools/gen_scale.py <sf> [out_dir]     # default /tmp/genscale/sf<sf>

Writes one parquet per table; events.ts is written as TIMESTAMP_MICROS
like the current driver generation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
T0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
T1 = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")


def gen_events(rng: np.random.Generator, sf: float) -> pa.Table:
    n, users = int(1_000_000 * sf), max(1, int(15_000 * sf))
    ts = np.sort(rng.integers(T0, T1, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n)),
            "value": pa.array(np.round(rng.exponential(80.0, n), 2)),
            "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]),
        }
    )


def gen_documents(rng: np.random.Generator, sf: float) -> pa.Table:
    n = max(500, int(50_000 * sf))
    langs = ["en", "es", "de", "fr", "zh"]
    texts, srcs, lang = [], [], []
    for i in range(n):
        ln = int(rng.integers(8, 100))
        words = list(rng.choice(VOCAB, ln))
        # ~5% near-duplicates: clone the previous doc with one word swapped
        if i and rng.random() < 0.05:
            words = texts[-1].split()
            words[int(rng.integers(0, len(words)))] = str(rng.choice(VOCAB))
        texts.append(" ".join(words))
        srcs.append(f"src{int(rng.integers(0, 20))}")
        lang.append(str(rng.choice(langs)))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, sf: float) -> pa.Table:
    n, dim, k = max(200, int(20_000 * sf)), 64, 10
    centers = rng.normal(0, 1, (k, dim))
    label = rng.integers(0, k, n)
    vec = centers[label] + rng.normal(0, 0.3, (n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vec], pa.list_(pa.float32())
            ),
            "label": pa.array(label, pa.int32()),
        }
    )


def gen_orders_lineitem(rng: np.random.Generator, sf: float):
    n_ord, n_cust = int(1_500_000 * sf), int(150_000 * sf)
    n_li = int(6_000_000 * sf)
    n_part, n_supp = int(200_000 * sf), int(10_000 * sf)
    d0 = np.datetime64("1995-01-01", "us").astype("int64")
    d1 = np.datetime64("2001-08-01", "us").astype("int64")
    day = 86_400_000_000
    odate = (rng.integers(d0, d1, n_ord) // day) * day
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
            "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
            "o_orderdate": pa.array(odate, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE"], n_ord)
            ),
        }
    )
    okey = rng.integers(0, n_ord, n_li)
    sdate = odate[okey] + rng.integers(1, 95, n_li) * day
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n_li).astype("float64")),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
            "l_returnflag": pa.array(rng.choice(["R", "A", "N"], n_li)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
            "l_shipdate": pa.array(sdate, pa.timestamp("us")),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
            "c_mktsegment": pa.array(
                rng.choice(
                    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
                    n_cust,
                )
            ),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": pa.array([f"part {i}" for i in range(n_part)]),
            "p_brand": pa.array([f"Brand#{i % 25:02d}" for i in range(n_part)]),
            "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        }
    )
    return orders, lineitem, customer, part, supplier


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/genscale/sf{sf:g}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_events(rng, sf), f"{out}/events.parquet")
    pq.write_table(gen_documents(rng, sf), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, sf), f"{out}/embeddings.parquet")
    orders, lineitem, customer, part, supplier = gen_orders_lineitem(rng, sf)
    pq.write_table(orders, f"{out}/orders.parquet")
    pq.write_table(lineitem, f"{out}/lineitem.parquet")
    pq.write_table(customer, f"{out}/customer.parquet")
    pq.write_table(part, f"{out}/part.parquet")
    pq.write_table(supplier, f"{out}/supplier.parquet")
    # real dims, constant across SFs
    for dim in ("nation", "region"):
        shutil.copyfile(
            f"/root/testdata/sf0.1/{dim}.parquet", f"{out}/{dim}.parquet"
        )
    print(out)


if __name__ == "__main__":
    main()
