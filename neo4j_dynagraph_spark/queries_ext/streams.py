"""Streaming family: tumbling/sliding frames, watermark dedup, stateful
edge builders, sessions, incremental KMV and corpus stats.

Split from the former single-file queries_ext.py (round 9); blocks are
verbatim. Registered into the shared REGISTRY on import via @query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from neo4j_dynagraph_spark.operators import (  # noqa: F401
    dedup,
    graph,
    multimodal,
    similarity,
    text,
)
from neo4j_dynagraph_spark.queries import (  # noqa: F401
    ACTOR1,
    _EDGES_FROM_P,
    _FID,
    DAY,
    DELTA,
    HOUR,
    MONTH,
    SPELL_LEN,
    YEAR,
    _edges,
    _presence_sql,
    query,
)
from neo4j_dynagraph_spark.sources.tables import load_table  # noqa: F401

from neo4j_dynagraph_spark.queries_ext._shared import (  # noqa: F401
    _BM25_TERMS,
    sql_str,
    _DAY_WHERE,
    _GOPHER_FEAT_SQL,
    _GOPHER_RULES_SQL,
    _H64,
    _SH_CTE,
    _TOK,
    _TOK_CTE,
    _bm25_term_sql,
    _bm25_tf_sql,
    _docs,
)

from neo4j_dynagraph_spark.streaming import (  # noqa: F401
    stateful_sessions_from_parquet,
    streaming_frame_counts_from_parquet,
)


# ------------------------------------------------------------- streaming


@query(
    "q_stream_tumbling",
    oracle=f"""
SELECT CAST(floor(epoch(ts)/{DELTA}) AS BIGINT)*{DELTA} AS window_start,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
FROM events GROUP BY 1 ORDER BY window_start
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming parity (T1/T2): the tumbling-window count run
    as a bounded stream (Trigger.AvailableNow, memory sink) must equal
    the batch aggregation — verified against the batch-SQL oracle."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = streaming_frame_counts_from_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        raw_schema,
        delta_seconds=DELTA,
    )
    return result.orderBy("window_start")


@query(
    "q_stream_sliding",
    oracle=f"""
WITH w0 AS (SELECT CAST(floor(epoch(ts)/{DELTA}) AS BIGINT)*{DELTA} AS w, value
            FROM events),
ex AS (SELECT unnest([w, w - {DELTA}]) AS window_start, value FROM w0)
SELECT window_start, count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
FROM ex GROUP BY 1 ORDER BY window_start
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window as a bounded stream: length 2*DELTA,
    slide DELTA — each event lands in exactly two windows. Absent from
    the reference (SURVEY.md §2.9 'no sliding windows'); the oracle
    replays the window expansion with unnest([w, w-DELTA])."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = streaming_frame_counts_from_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        raw_schema,
        delta_seconds=2 * DELTA,
        slide_seconds=DELTA,
    )
    return result.orderBy("window_start")


@query(
    "q_stream_dedup",
    oracle=f"""
SELECT DISTINCT {_FID} AS frame_id, user_id AS actor
FROM events ORDER BY frame_id, actor
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark): first
    sighting of each (frame, actor) presence pair, state bounded by
    the watermark horizon. Drained == the batch DISTINCT — which is
    the oracle."""
    from neo4j_dynagraph_spark.streaming.frames import (
        streaming_presence_from_parquet,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = streaming_presence_from_parquet(
        spark, f"{sf_dir}/events.parquet", raw_schema, DELTA
    )
    return result.orderBy("frame_id", "actor")


@query(
    "q_stream_edges",
    oracle=f"""
WITH p AS ({_presence_sql()})
SELECT frame_id, actor1, actor2, weight FROM ({_EDGES_FROM_P})
ORDER BY frame_id, actor1, actor2
""",
)
def q_stream_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming co-presence edges: watermarked stream-stream self-join
    of the events stream on the frame grid, chained into a windowed
    pair-count aggregation (two stateful operators). Drained, it must
    equal the batch presence_to_frame_interactions — the oracle IS the
    batch SQL. This is the incremental form of the engine's core
    ingest operator (load_gexf_to_neo4j.py:241-249)."""
    from neo4j_dynagraph_spark.streaming.edges import (
        streaming_frame_edges_from_parquet,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = streaming_frame_edges_from_parquet(
        spark, f"{sf_dir}/events.parquet", raw_schema, DELTA
    )
    return result


@query(
    "q_stream_edges_stateful",
    oracle=f"""
WITH p AS ({_presence_sql()})
SELECT frame_id, actor1, actor2, weight FROM ({_EDGES_FROM_P})
ORDER BY frame_id, actor1, actor2
""",
    bench=True,
)
def q_stream_edges_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful production path for streaming co-presence edges
    (applyInPandasWithState keyed by frame, streaming/edges.py): state
    is the per-frame actor->count map — O(actors-per-frame), never
    O(events) or O(pairs) — and the pair expansion happens only at the
    event-time-timeout flush. This is the skew-robust form for 100 TB
    streams (the join form's state is O(events in the watermark
    horizon)). Hot-frame cap unset here so a fully-drained run equals
    the batch edge set exactly — the same batch SQL oracle as
    q_stream_edges; the cap semantics are differentially tested in
    tests/test_streaming_gexf.py."""
    from neo4j_dynagraph_spark.streaming.edges import (
        stateful_frame_edges_from_parquet,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = stateful_frame_edges_from_parquet(
        spark, f"{sf_dir}/events.parquet", raw_schema, DELTA
    )
    return result


@query(
    "q_stream_degree",
    oracle=f"""
WITH p AS ({_presence_sql()}),
e AS (SELECT DISTINCT actor1, actor2 FROM ({_EDGES_FROM_P})),
s AS (SELECT actor1 AS actor FROM e UNION ALL SELECT actor2 FROM e)
SELECT actor, CAST(count(*) AS BIGINT) AS degree
FROM s GROUP BY 1 ORDER BY actor
""",
)
def q_stream_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY10 as an incrementally-maintained materialized view: the
    finalized co-presence edge stream drains through foreachBatch into
    a versioned canonical-pair dimension (merge-on-key, idempotent
    replays, atomic pointer-flip — streaming/upsert.py), and degree is
    a read of that dimension — the streaming answer to recomputing
    q10's full-range distinct from scratch. (The dependency-free store
    rewrites the merged table per commit; on a deployment the same
    foreachBatch body targets a Delta/Iceberg MERGE, making each
    commit O(batch) — the pattern, commit atomicity, and idempotence
    are what this verifies.) The oracle is q10's batch SQL."""
    from neo4j_dynagraph_spark.streaming.edges import (
        streaming_degree_from_parquet,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = streaming_degree_from_parquet(
        spark, f"{sf_dir}/events.parquet", raw_schema, DELTA
    )
    return result.orderBy("actor")


@query(
    "q_stream_sessions",
    oracle=f"""
WITH o AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, ts
           FROM events),
g AS (SELECT user_id, event_id, es,
             CASE WHEN lag(es) OVER w IS NULL
                       OR es - lag(es) OVER w >= {SPELL_LEN}
                  THEN 1 ELSE 0 END AS brk
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
s AS (SELECT user_id, es,
             sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g)
SELECT user_id, min(es) AS session_start,
       max(es) AS session_end, count(*) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): gap
    sessionizer. Mid-stream, only CLOSED sessions are emitted; trailing
    sessions close via event-time timeout once the bounded stream
    drains and the watermark passes. A fully-drained stream therefore
    equals the batch sessionization exactly — the oracle is that batch
    formulation (gap granularity: whole seconds, matching the state's
    epoch-second carry)."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    result = stateful_sessions_from_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        raw_schema,
        gap_seconds=SPELL_LEN,
    )
    return result.orderBy("user_id", "session_start")


@query(
    "q_stream_campaign",
    oracle=f"""
WITH s AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t1,
                  CAST(floor(epoch(ts)) AS BIGINT) + {SPELL_LEN} AS t2
           FROM events WHERE event_type = 'signup'),
pu AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t1,
              CAST(floor(epoch(ts)) AS BIGINT) + {SPELL_LEN} AS t2
       FROM events WHERE event_type = 'purchase')
SELECT pu.event_id AS e2,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(least(s.t2, pu.t2) - greatest(s.t1, pu.t1)) AS BIGINT)
         AS sum_overlap_s
FROM pu JOIN s ON s.t1 < pu.t2 AND pu.t1 < s.t2
GROUP BY 1 ORDER BY 1
""",
)
def q_stream_campaign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING two-relation interval join: signup-spell exposure per
    purchase spell as a watermarked stream-stream TIME-RANGE join
    (state bounded by watermark + spell horizon on each side) chained
    into a windowed per-purchase aggregation — the incremental twin of
    q_campaign_overlap, drained with Trigger.AvailableNow through the
    distributed file sink. The oracle IS the batch SQL: stream ==
    batch for the full two-stateful-operator chain
    (streaming/intervals.py)."""
    from neo4j_dynagraph_spark.streaming.intervals import (
        stream_interval_overlap_from_parquet,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    res = stream_interval_overlap_from_parquet(
        spark, f"{sf_dir}/events.parquet", raw_schema, spell_seconds=SPELL_LEN
    )
    return res.orderBy("e2")


@query(
    "q_stream_dedup_docs",
    oracle="""
SELECT min(doc_id) AS doc_id, md5(text) AS content_hash
FROM documents GROUP BY md5(text) ORDER BY doc_id
""",
)
def q_stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus dedup: the documents stream drained through
    the first-seen content-hash filter (foreachBatch + the versioned
    seen-hash DimensionStore; replay-safe per-batch outputs) — the
    ingest-edge "have we seen this doc" service, equal to batch exact
    dedup's min-id survivors when batches arrive in id order
    (streaming/incremental_dedup.py; multi-batch arrival order and
    store growth pinned by unit test)."""
    from neo4j_dynagraph_spark.streaming.incremental_dedup import (
        stream_dedup_documents,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    out = stream_dedup_documents(
        spark, f"{sf_dir}/documents.parquet", schema
    )
    return out.orderBy("doc_id")


@query(
    "q_stream_kmv",
    oracle=f"""
WITH v AS (SELECT DISTINCT event_type,
                  (({_H64.format(x="'kmv:' || user_id")}) + 1)
                    / 1152921504606846976.0 AS u
           FROM events),
r AS (SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM v)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen,
       round(CASE WHEN max(CASE WHEN rn = 64 THEN u END) IS NOT NULL
                  THEN 63 / max(CASE WHEN rn = 64 THEN u END)
                  ELSE count(*) END, 6) AS est_distinct
FROM r WHERE rn <= 64 GROUP BY 1 ORDER BY event_type
""",
)
def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL KMV cardinality sketch: the events stream drained
    through foreachBatch union-prune merges against an O(k x groups)
    pruned DimensionStore (streaming/kmv.py) — the mergeable-sketch
    protocol applied across time. Because KMV merge is exactly 'keep
    the k smallest of the union' (associative, commutative,
    idempotent), the drained estimate equals the batch
    q_kmv_distinct bit-for-bit however the stream is chopped into
    micro-batches — which is what lets the same DuckDB oracle replay
    a STREAMING sketch's exact output. Multi-batch arrival order and
    bounded state are pinned by unit test."""
    from neo4j_dynagraph_spark.streaming.kmv import stream_kmv_distinct

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    out = stream_kmv_distinct(
        spark, f"{sf_dir}/events.parquet", schema, k=64
    )
    return out.orderBy("event_type")


@query(
    "q_stream_corpus_stats",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
pd AS (SELECT CAST(len(t) AS BIGINT) AS dl,
       {", ".join(f"CASE WHEN len(list_filter(t, x -> x = {sql_str(t)})) > 0 THEN 1 ELSE 0 END AS hit{i}" for i, t in enumerate(_BM25_TERMS))}
       FROM tok),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(dl) AS BIGINT) AS tok_sum,
              {", ".join(f"CAST(sum(hit{i}) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
       FROM pd)
SELECT * FROM (
  {" UNION ALL ".join(f"SELECT {sql_str(t)} AS term, df{i} AS df, n_docs, round(tok_sum / CAST(n_docs AS DOUBLE), 6) AS avgdl FROM st" for i, t in enumerate(_BM25_TERMS))}
) ORDER BY term
""",
)
def q_stream_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus statistics for retrieval scoring: the
    documents stream drained through foreachBatch partial-aggregate
    commits keyed by (batch_id, key) — plain counters are NOT
    idempotent under re-delivery (unlike KMV's union-prune), so
    exactly-once comes from each batch OVERWRITING its own partial
    rows in the versioned store (streaming/corpus_stats.py); the
    readable stats are the sum over batch partials. Integer counter
    sums are associative/commutative, so the drained N / avgdl /
    per-term df equal the batch aggregate bit-for-bit under any
    micro-batch chopping — the same oracle shape q_bm25_search's
    stats row replays. Multi-batch equality and replay idempotence
    are pinned by unit test."""
    from neo4j_dynagraph_spark.streaming.corpus_stats import (
        stream_corpus_stats,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return stream_corpus_stats(
        spark,
        f"{sf_dir}/documents.parquet",
        schema,
        list(_BM25_TERMS),
    )


@query(
    "q_stream_cms",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
u AS (SELECT unnest(t) AS token FROM tok),
freq AS (SELECT token, count(*) AS cnt FROM u GROUP BY 1),
top AS (SELECT token, cnt FROM freq ORDER BY cnt DESC, token LIMIT 20),
cells AS (SELECT r, {_H64.format(x="'cms' || r || ':' || token")} % 1024 AS c,
                 count(*) AS cnt
          FROM u, UNNEST([0, 1, 2, 3]) AS sd(r) GROUP BY 1, 2),
pr AS (SELECT token, r,
              {_H64.format(x="'cms' || r || ':' || token")} % 1024 AS c
       FROM top, UNNEST([0, 1, 2, 3]) AS sd(r)),
est AS (SELECT pr.token, min(cells.cnt) AS cms_est
        FROM pr JOIN cells ON cells.r = pr.r AND cells.c = pr.c
        GROUP BY 1)
SELECT top.token, CAST(top.cnt AS BIGINT) AS exact_cnt,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(est.cms_est - top.cnt AS BIGINT) AS overshoot
FROM top JOIN est USING (token) ORDER BY exact_cnt DESC, top.token
""",
)
def q_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Count-Min sketch: the documents stream drained
    through foreachBatch partial counter tables keyed by
    (batch_id, r, c) — CMS counters are ADDITIVE, so exactly-once
    follows q_stream_corpus_stats' overwrite-own-batch protocol, not
    KMV's idempotent union-prune (streaming/cms.py). Integer counter
    sums are associative/commutative, so the drained sketch equals the
    batch cms_table bit-for-bit under any micro-batch chopping — the
    probe of the top-20 tokens therefore hash-matches q_cms_freq's
    exact oracle. Multi-batch equality and replay idempotence pinned
    by unit test."""
    from neo4j_dynagraph_spark.operators.sketch import cms_probe
    from neo4j_dynagraph_spark.streaming.cms import stream_cms_table

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    sk = stream_cms_table(spark, f"{sf_dir}/documents.parquet", schema)
    top = (
        text.token_frequencies(_docs(spark, sf_dir))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )
    est = cms_probe(sk, top.select("token"))
    return (
        top.join(est, "token")
        .select(
            "token",
            F.col("cnt").cast("long").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).cast("long").alias("overshoot"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


@query(
    "q_stream_gopher",
    oracle=f"""
WITH {_TOK_CTE},
feat AS (SELECT doc_id, source, {_GOPHER_FEAT_SQL}
FROM tok),
rules AS (SELECT source,
  {_GOPHER_RULES_SQL}
FROM feat)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_wc,
  CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
  CAST(sum(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
  CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
  CAST(sum(CASE WHEN NOT r_rep THEN 1 ELSE 0 END) AS BIGINT) AS fail_rep,
  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop AND r_rep
           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  round(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop AND r_rep
            THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS pass_rate
FROM rules GROUP BY source ORDER BY source
""",
)
def q_stream_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL quality-drift monitor: the documents stream drained
    through foreachBatch per-source Gopher rule-counter partials keyed
    by (batch_id, source) — additive counters get exactly-once from
    overwriting their own batch rows (q_stream_corpus_stats' protocol),
    and the drained per-source audit equals the batch q_gopher_rules
    roll-up bit-for-bit under any micro-batch chopping, so the same
    oracle grades it (streaming/quality.py). At the ingest edge this
    is how a crawl notices a source's pass rate sagging WITHOUT
    rescanning history; state is O(batches x sources). Multi-batch
    equality pinned by unit test."""
    from neo4j_dynagraph_spark.streaming.quality import stream_gopher_stats

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return stream_gopher_stats(spark, f"{sf_dir}/documents.parquet", schema)


@query(
    "q_stream_sq_stats",
    oracle="""
WITH sbase AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT CAST(t.i - 1 AS INT) AS i, min(e[t.i]) AS mn, max(e[t.i]) AS mx
FROM sbase, UNNEST(range(1, len(e) + 1)) AS t(i)
GROUP BY 1 ORDER BY i
""",
)
def q_stream_sq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL scalar-quantization calibration: the embeddings
    stream drained through per-dimension min/max LATTICE merges
    (streaming/sq_stats.py) — the third mergeable-aggregate class at
    the streaming edge beside KMV's idempotent set-prune and the
    additive batch_id-keyed counters: min/max are associative,
    commutative AND idempotent, so no batch keying is needed and the
    drained calibration equals q_sq_topk's batch sq_stats_row
    dimension aggregate bit-for-bit under any chopping or replay.
    This is how a growing corpus keeps its int8 quantizer's ranges
    current (drift outside the envelope clamps) without rescans;
    state is exactly d rows forever. Multi-batch equality and replay
    absorption pinned by unit test."""
    from neo4j_dynagraph_spark.streaming.sq_stats import stream_sq_stats

    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return stream_sq_stats(spark, f"{sf_dir}/embeddings.parquet", schema)


@query(
    "q_stream_training_mix",
    bench=True,
    oracle=f"""
WITH {_TOK_CTE},
keep1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
s AS (SELECT tok.doc_id, t, len(t) AS n_tokens,
             len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS ttr
      FROM tok JOIN keep1 USING (doc_id) WHERE len(t) > 0),
q AS (SELECT doc_id, t FROM s WHERE n_tokens >= 30 AND ttr >= 0.35),
g AS (SELECT DISTINCT doc_id,
             {_H64.format(x="array_to_string(list_slice(t, i, i + 3), ' ')")} AS gh
      FROM tok, UNNEST(range(1, len(t) - 2)) AS u(i) WHERE len(t) >= 4),
b AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
contam AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (gh)
           WHERE g.doc_id % 97 != 0),
clean AS (SELECT doc_id, t FROM q
          WHERE doc_id % 97 != 0
            AND doc_id NOT IN (SELECT doc_id FROM contam)),
n AS (SELECT doc_id, len(t) AS n_tok FROM clean WHERE len(t) > 0),
c AS (SELECT doc_id, n_tok,
             CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start
      FROM n),
e AS (SELECT doc_id, start, start + n_tok AS fin FROM c),
x AS (SELECT doc_id, u.s AS seq_id, start, fin
      FROM e, unnest(range(start // 128, (fin - 1) // 128 + 1)) AS u(s))
SELECT seq_id, doc_id,
       greatest(start, seq_id * 128) - seq_id * 128 AS seg_off,
       least(fin, (seq_id + 1) * 128) - greatest(start, seq_id * 128) AS seg_len
FROM x ORDER BY seq_id, doc_id
""",
)
def q_stream_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of the q_training_mix capstone: the documents
    stream drained through one foreachBatch pipeline of the proven
    incremental pieces — content-hash MIN(doc_id) dedup lattice,
    batch_id-keyed per-doc quality partials, the persisted train
    4-gram index + bench-gram union lattice (the state that makes a
    LATE-arriving benchmark doc contaminate an EARLY training doc
    exactly), with sequence packing assembled at read time from the
    stored token counts via the shared pack_token_counts core.
    Every stage's state is mergeable-exact, so the drained packed
    index equals the batch capstone BIT-FOR-BIT under any micro-batch
    chopping — the driver grades it with q_training_mix's own oracle
    (streaming/training_mix.py; multi-batch chopping equality pinned
    by unit test)."""
    from neo4j_dynagraph_spark.streaming.training_mix import (
        stream_training_mix,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return stream_training_mix(
        spark, f"{sf_dir}/documents.parquet", schema
    ).orderBy("seq_id", "doc_id")


@query(
    "q_stream_dedup_lsh",
    oracle=(
        f"WITH {_TOK_CTE}, {_SH_CTE}, "
        "hx AS (SELECT doc_id, md5('s0:' || shingle) || md5('s1:' || shingle) "
        "|| md5('s2:' || shingle) || md5('s3:' || shingle) AS hh FROM sh), "
        "hs AS (SELECT doc_id, "
        + ", ".join(
            f"('0x' || substr(hh, {15 * i + 1}, 15))::BIGINT AS h{i}"
            for i in range(8)
        )
        + " FROM hx), "
        "sig AS (SELECT doc_id, "
        + ", ".join(f"min(h{i}) AS h{i}" for i in range(8))
        + " FROM hs GROUP BY 1), "
        "bands AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, h{2 * b} AS h0, h{2 * b + 1} AS h1 FROM sig"
            for b in range(4)
        )
        + "), "
        "m AS (SELECT band, h0, h1, min(doc_id) AS mn, count(*) AS n "
        "FROM bands GROUP BY 1, 2, 3) "
        "SELECT b.doc_id, "
        "bool_or(m.n <= 64 AND m.mn < b.doc_id) AS is_near_dup "
        "FROM bands b JOIN m USING (band, h0, h1) "
        "GROUP BY 1 ORDER BY doc_id"
    ),
)
def q_stream_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash-LSH near-dup flagging: the documents stream
    drained through per-batch signature + band-row commits (the
    tokenize/shingle/hash work happens once per doc at ingest; state
    is 4 compact band rows per doc, keyed by batch_id for replay
    safety), flagged at read time under the ORDER-FREE bucket-min
    rule — a doc is a near-dup iff some band bucket of size <= 64
    (q_dedup_minhash's boilerplate-skew cap) contains a smaller
    doc_id, however the stream was chopped and whichever batch the
    smaller doc arrived in. The oracle replays signatures, banding,
    bucket sizes, and the rule (streaming/incremental_dedup.py
    stream_dedup_minhash; late-original multibatch test)."""
    from neo4j_dynagraph_spark.streaming.incremental_dedup import (
        stream_dedup_minhash,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return stream_dedup_minhash(
        spark, f"{sf_dir}/documents.parquet", schema
    )


@query(
    "q_stream_embed_topk",
    oracle="""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe FROM base WHERE vec_id < 5),
pairs AS (SELECT qid, vec_id AS cid, qe, embedding AS ce
          FROM base CROSS JOIN q WHERE vec_id != qid),
un AS (SELECT qid, cid, CAST(unnest(qe) AS DOUBLE) AS x, CAST(unnest(ce) AS DOUBLE) AS y
       FROM pairs),
dots AS (SELECT qid, cid, sum(x*y) AS d, sum(x*x) AS nx, sum(y*y) AS ny
         FROM un GROUP BY 1, 2),
sims AS (SELECT qid, cid, d / (sqrt(nx) * sqrt(ny)) AS sim_raw FROM dots),
ranked AS (SELECT qid, cid, sim_raw,
                  row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, cid) AS rank
           FROM sims)
SELECT qid, rank, cid, round(sim_raw, 6) AS sim
FROM ranked WHERE rank <= 5 ORDER BY qid, rank
""",
)
def q_stream_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING retrieval-index maintenance: the embeddings stream
    drained through the incremental exact top-k — corpus vectors
    appended batch-keyed (the serving index), per-query top-k as a
    PRUNED LATTICE (union + dedup + keep-k-best: associative,
    commutative, idempotent, so the drained ranks equal the batch
    brute-force bit-for-bit under any chopping), and a query vector
    arriving LATE scores once against the stored corpus — the
    retrieval twin of the training-mix late-bench hazard. Same oracle
    as the batch q_embed_topk (streaming/embed_topk.py; multi-batch +
    late-query test)."""
    from neo4j_dynagraph_spark.streaming.embed_topk import (
        stream_embed_topk,
    )

    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return stream_embed_topk(
        spark,
        f"{sf_dir}/embeddings.parquet",
        schema,
        is_query=F.col("vec_id") < 5,
        k=5,
    )


def _stream_ivf_oracle() -> str:
    from neo4j_dynagraph_spark.queries_ext.similarity import _IVF_ORACLE

    return _IVF_ORACLE


@query("q_stream_ivf_assign", oracle=_stream_ivf_oracle())
def q_stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL IVF index maintenance (assign-only): the embeddings
    stream drained through per-batch nearest-frozen-centroid
    assignment merged into a cell-partitioned DimensionStore — the
    streaming half of the ANN story that q_stream_embed_topk's exact
    lattice doesn't cover (a 100 TB pipeline appends embeddings
    continuously; codebook RE-FIT stays batch by design, the FAISS
    add()/train() split — streaming/ivf.py module docstring). The home
    cell is a deterministic argmax against the frozen codebook, so
    the drained assignment set is IDEMPOTENT under any chopping and
    the probe + exact re-rank over it equals batch q_embed_ann_ivf
    bit-for-bit — graded here with that query's own oracle
    (multibatch chopping equality pinned by unit test)."""
    from neo4j_dynagraph_spark.streaming.ivf import stream_ivf_assign

    emb = similarity.as_double_vec(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    cells = stream_ivf_assign(
        spark, f"{sf_dir}/embeddings.parquet", schema, centroids
    )
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    return similarity.ivf_topk_from_cells(
        cells, emb, queries_df, centroids, k=5, nprobe=4
    )


@query(
    "q_stream_temperature_mix",
    oracle=f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total, sum(pow(n, 0.5)) AS pa FROM c),
r AS (SELECT source, n, n / total AS share, pow(n, 0.5) / pa AS target
      FROM c, t),
mx AS (SELECT max(target / share) AS mr FROM r),
rt AS (SELECT source, n, share, target,
       round((target / share) / mr, 6) AS rate FROM r, mx),
k AS (SELECT d.source, count(*) AS n_kept
      FROM documents d JOIN rt ON d.source = rt.source
      WHERE ({_H64.format(x="'temp:' || d.doc_id")} + 1)
            / 1152921504606846976.0 < rate
      GROUP BY 1)
SELECT rt.source, CAST(rt.n AS BIGINT) AS n_docs,
       round(rt.share, 6) AS share,
       round(rt.target, 6) AS target_share,
       rt.rate AS keep_rate,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rt LEFT JOIN k ON rt.source = k.source ORDER BY rt.source
""",
)
def q_stream_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING mixture design: the documents stream drained into the
    batch_id-keyed (doc_id, source) catalog store, with the
    temperature-scaled summary (α=0.5 XLM/mT5 rule) assembled at READ
    time via the shared temperature_mix_from_catalog core — every
    arriving batch shifts every source's share and therefore every
    keep rate, so the decisions are LATE-BOUND by construction (the
    mixture twin of the training-mix late-bench and top-k late-query
    hazards) and the drained summary equals the batch
    q_temperature_mix bit-for-bit under any chopping. Same oracle
    (streaming/mixture.py; multibatch test)."""
    from neo4j_dynagraph_spark.streaming.mixture import (
        stream_temperature_mix,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return stream_temperature_mix(
        spark, f"{sf_dir}/documents.parquet", schema, alpha=0.5
    )


@query("q_stream_burst", oracle=None)
def q_stream_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING activity-burst monitor: the events stream drained
    through per-batch (frame_id, actor) count partials into a
    batch_id-keyed CounterStore (additive class — a frame's count may
    arrive split across micro-batches; the sum over partials is
    order-free and replay-safe), with the trailing-week z-score burst
    pass recomputed at READ time over the summed presence by the
    IDENTICAL pure function the batch query uses
    (operators/graph.py:burst_windows) — so the drained verdicts equal
    batch q_burst_windows bit-for-bit under any chopping, and the
    batch row's DuckDB oracle grades this one too (attached below via
    REGISTRY, keeping the SQL in one place). Multibatch equality is
    unit-pinned (tests/test_streaming_gexf.py)."""
    from neo4j_dynagraph_spark.streaming.bursts import stream_burst_windows

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return stream_burst_windows(
        spark, f"{sf_dir}/events.parquet", schema,
        window=168, min_obs=8, z_thresh=3.0,
    )


# the streaming twin is graded by the SAME oracle as its batch query —
# bit-equality under chopping is the contract (q_stream_training_mix
# precedent: one SQL, two paths). Attached post-hoc because graph.py's
# module constant isn't importable at this module's decoration time
# without a cycle.
import dataclasses as _dc  # noqa: E402

from neo4j_dynagraph_spark.queries import REGISTRY as _REG  # noqa: E402
from neo4j_dynagraph_spark.queries_ext.graph import _BURST_ORACLE  # noqa: E402

_REG["q_stream_burst"] = _dc.replace(
    _REG["q_stream_burst"], oracle=_BURST_ORACLE
)
