"""Shared SQL fragments and loaders for the extension query families.

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


_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_TOK_CTE = f"tok AS (SELECT doc_id, source, {_TOK} AS t FROM documents)"
_SH_CTE = (
    "sh AS (SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle "
    "FROM tok, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3)"
)
_H64 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


_DAY_WHERE = f"WHERE year(ts)={YEAR} AND month(ts)={MONTH} AND day(ts)={DAY}"


_BM25_TERMS = ("merge", "spark", "vector")


def sql_str(term: str) -> str:
    """SQL single-quoted string literal (embedded quotes doubled) —
    the ONE sanctioned way to embed a term constant into oracle SQL.
    Engine-side predicates are Column API; oracle strings must route
    term constants through here instead of a raw f-string ``'{t}'``,
    so the no-interpolated-terms rule stays grep-enforceable: a grep
    for an equals sign followed by a quoted f-string brace over
    queries_ext/ must come back empty."""
    return "'" + term.replace("'", "''") + "'"


def _bm25_tf_sql(i: int, t: str) -> str:
    return (
        f"CAST(len(list_filter(t, x -> x = {sql_str(t)})) AS DOUBLE) AS tf{i}"
    )


def _bm25_term_sql(i: int) -> str:
    # k1=1.2, b=0.75; literals via repr() so both engines parse the
    # exact doubles the Spark side uses (queries_ext._BM25_TERMS note)
    return (
        f"CASE WHEN tf{i} > 0 THEN "
        f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* tf{i} * 2.2 / (tf{i} + 1.2 * (0.25 + 0.75 * dl / avgdl)) "
        f"ELSE 0.0 END"
    )
