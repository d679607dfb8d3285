"""Streaming/batch equivalence (SURVEY.md §2.9) + GEXF source parity."""

from __future__ import annotations

import textwrap

import pyspark.sql.functions as F

from neo4j_dynagraph_spark.operators import ingest
from neo4j_dynagraph_spark.sources import gexf
from neo4j_dynagraph_spark.streaming import (
    stream_tumbling_counts,
    streaming_frame_counts_from_parquet,
)
from tests.conftest import SF_SMALL


def test_stream_equals_batch(spark):
    raw_schema = spark.read.parquet(f"{SF_SMALL}/events.parquet").schema
    streamed = streaming_frame_counts_from_parquet(
        spark, f"{SF_SMALL}/events.parquet", raw_schema, 3600, ts_is_nanos=True
    ).collect()
    from neo4j_dynagraph_spark.sources.tables import load_table

    batch = stream_tumbling_counts(load_table(spark, SF_SMALL, "events"), 3600).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


GEXF_DOC = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">
      <graph mode="dynamic" timeformat="integer" defaultedgetype="undirected">
        <nodes>
          <node id="1" label="a"><spells><spell start="100" end="220"/></spells></node>
          <node id="2" label="b"><spells><spell start="140" end="200"/>
            <spell start="300" end="360"/></spells></node>
        </nodes>
        <edges>
          <edge source="2" target="1"><spells><spell start="150" end="190"/></spells></edge>
        </edges>
      </graph>
    </gexf>
""")


def test_gexf_roundtrip(spark, tmp_path):
    p = tmp_path / "net.gexf"
    p.write_text(GEXF_DOC)
    spells = gexf.read_gexf(spark, str(p))
    rows = spells.collect()
    assert len(rows) == 4  # 1 + 2 node spells + 1 edge spell
    edge = next(r for r in rows if r.kind == "edge")
    assert (edge.src, edge.dst) == (1, 2)  # canonicalized from source=2,target=1

    # discretize with the reference's 20s default frame width
    frames = ingest.discretize_spells(spells, 20, t_start_col="t_start", t_end_col="t_end")
    node1 = frames.where((F.col("kind") == "node") & (F.col("id") == "1"))
    # [100, 220) at delta=20 -> frames 5..10 inclusive
    assert sorted(r.frame_id for r in node1.collect()) == [5, 6, 7, 8, 9, 10]


def test_gexf_rejects_static(spark, tmp_path):
    bad = GEXF_DOC.replace('mode="dynamic"', 'mode="static"')
    p = tmp_path / "bad.gexf"
    p.write_text(bad)
    import pytest

    with pytest.raises(ValueError, match="dynamic"):
        gexf.read_gexf(spark, str(p))


def test_gexf_many(spark, tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"net{i}.gexf"
        p.write_text(GEXF_DOC)
        paths.append(str(p))
    out = gexf.read_gexf_many(spark, paths)
    assert out.count() == 12
