"""Dynamic-GEXF source: the reference's native input format (S1).

The reference parses GEXF with ElementTree and validates
mode='dynamic' + timeformat in {'integer','long','double'}
(load_gexf_to_neo4j.py:61-67); node/edge <spells> become activity
intervals (:73-93). This source reproduces those semantics and returns
a spells DataFrame ready for operators.ingest.discretize_spells:

    (kind: 'node'|'edge', id: string, src: long?, dst: long?,
     t_start: long, t_end: long)

Edge spells are canonicalized src < dst at parse time (the loader's
pair canonicalization, load_gexf_to_neo4j.py:201-202).

Scale note: GEXF is a single-document XML format — inherently
driver-parsed. For many files, `paths` fans out: each file parses
inside a mapInPandas over a one-column DataFrame of paths, so a 100 TB
corpus of many GEXF files parallelizes per-file. A single monster file
is a format limitation, not an engine one (convert upstream).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SPELL_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("id", StringType(), False),
        StructField("src", LongType(), True),
        StructField("dst", LongType(), True),
        StructField("t_start", LongType(), False),
        StructField("t_end", LongType(), False),
    ]
)

_SUPPORTED_TIMEFORMATS = {"integer", "long", "double", None}


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _spells_of(el: ET.Element) -> Iterable[tuple[int, int]]:
    own_start = el.get("start")
    own_end = el.get("end")
    found = False
    for child in el.iter():
        if _strip(child.tag) == "spell":
            found = True
            yield int(float(child.get("start"))), int(float(child.get("end")))
    if not found and own_start is not None and own_end is not None:
        yield int(float(own_start)), int(float(own_end))


def parse_gexf_spells(path: str) -> list[tuple]:
    """Driver-side parse of one GEXF file -> spell tuples.

    Validates the same preconditions as the reference loader
    (load_gexf_to_neo4j.py:64-67): dynamic mode, integer-ish timeformat.
    """
    root = ET.parse(path).getroot()
    graph = next(e for e in root.iter() if _strip(e.tag) == "graph")
    if graph.get("mode") != "dynamic":
        raise ValueError(f"GEXF graph mode must be 'dynamic', got {graph.get('mode')!r}")
    if graph.get("timeformat") not in _SUPPORTED_TIMEFORMATS:
        raise ValueError(
            f"unsupported timeformat {graph.get('timeformat')!r}; "
            "only integer POSIX time is supported (reference parity)"
        )
    out: list[tuple] = []
    for el in graph.iter():
        tag = _strip(el.tag)
        if tag == "node":
            nid = el.get("id")
            for t1, t2 in _spells_of(el):
                out.append(("node", nid, int(nid), None, t1, t2))
        elif tag == "edge":
            s, t = int(el.get("source")), int(el.get("target"))
            a, b = (s, t) if s < t else (t, s)  # canonical pair (F6)
            for t1, t2 in _spells_of(el):
                out.append(("edge", f"{a}-{b}", a, b, t1, t2))
    return out


def read_gexf(spark: SparkSession, path: str) -> DataFrame:
    """One GEXF file -> spells DataFrame (SPELL_SCHEMA)."""
    return spark.createDataFrame(parse_gexf_spells(path), SPELL_SCHEMA)


def read_gexf_many(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Many GEXF files, parsed in parallel on executors via mapInPandas
    over the path list — the scale path for file-per-deployment corpora."""
    import pandas as pd

    paths_df = spark.createDataFrame(
        [(p,) for p in paths], StructType([StructField("path", StringType(), False)])
    ).repartition(max(1, min(len(paths), 64)))

    def parse(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(parse_gexf_spells(p))
            yield pd.DataFrame(
                rows, columns=["kind", "id", "src", "dst", "t_start", "t_end"]
            )

    return paths_df.mapInPandas(parse, SPELL_SCHEMA)


def write_gexf(spells: DataFrame, path: str, timeformat: str = "long") -> None:
    """Dynamic-GEXF sink — the inverse of :func:`read_gexf`, closing
    the format round-trip (the reference only LOADS GEXF; exporting
    makes the engine a drop-in producer for any GEXF consumer).

    The per-entity spell grouping runs DISTRIBUTED (one groupBy over
    the spell facts, spells sorted for deterministic output); only the
    document assembly streams through the driver via toLocalIterator —
    GEXF is a single-document XML format, so a single file is the
    format's constraint, not the engine's (mirror of the source's
    scale note). Output satisfies read_gexf's own validation: dynamic
    mode, integer-ish timeformat, canonical src < dst edges.

    SIZE BOUND: the driver streams every entity through one process and
    one file handle — suitable up to roughly 10^6 entities / a few GB
    of XML (minutes of driver wall). Above that, use
    :func:`write_gexf_sharded`, which writes one valid GEXF document
    per partition in parallel and is the 100 TB path.
    """
    from xml.sax.saxutils import quoteattr

    import pyspark.sql.functions as F

    if timeformat not in ("integer", "long", "double"):
        raise ValueError(f"unsupported timeformat {timeformat!r}")
    grouped = (
        spells.groupBy("kind", "id", "src", "dst")
        .agg(
            F.sort_array(F.collect_list(F.struct("t_start", "t_end"))).alias("sp")
        )
        # 'node' sorts after 'edge' descending-wise: desc puts nodes first
        .orderBy(F.desc("kind"), "id")
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(
            f'  <graph mode="dynamic" defaultedgetype="undirected" '
            f'timeformat="{timeformat}">\n'
        )
        section = None
        for row in grouped.toLocalIterator():
            want = "nodes" if row.kind == "node" else "edges"
            if section != want:
                if section is not None:
                    f.write(f"    </{section}>\n")
                f.write(f"    <{want}>\n")
                section = want
            spell_xml = "".join(
                f'<spell start="{s.t_start}" end="{s.t_end}"/>'
                for s in row.sp
            )
            if row.kind == "node":
                f.write(
                    f"      <node id={quoteattr(row.id)} "
                    f"label={quoteattr(row.id)}>"
                    f"<spells>{spell_xml}</spells></node>\n"
                )
            else:
                # quoteattr on source/target too: schema says long, but
                # a caller-supplied frame with string ids must not be
                # able to emit malformed XML and break the round-trip.
                f.write(
                    f"      <edge id={quoteattr(row.id)} "
                    f"source={quoteattr(str(row.src))} "
                    f"target={quoteattr(str(row.dst))}>"
                    f"<spells>{spell_xml}</spells></edge>\n"
                )
        if section is not None:
            f.write(f"    </{section}>\n")
        f.write("  </graph>\n</gexf>\n")


def _gexf_document(rows, timeformat: str) -> str:
    """Assemble one complete GEXF document from grouped spell rows
    (kind, id, src, dst, sp) already sorted nodes-first. Shared by the
    single-file driver sink and the distributed sharded sink."""
    from xml.sax.saxutils import quoteattr

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n',
        f'  <graph mode="dynamic" defaultedgetype="undirected" '
        f'timeformat="{timeformat}">\n',
    ]
    section = None
    for row in rows:
        want = "nodes" if row.kind == "node" else "edges"
        if section != want:
            if section is not None:
                parts.append(f"    </{section}>\n")
            parts.append(f"    <{want}>\n")
            section = want
        spell_xml = "".join(
            f'<spell start="{s.t_start}" end="{s.t_end}"/>' for s in row.sp
        )
        if row.kind == "node":
            parts.append(
                f"      <node id={quoteattr(row.id)} "
                f"label={quoteattr(row.id)}>"
                f"<spells>{spell_xml}</spells></node>\n"
            )
        else:
            parts.append(
                f"      <edge id={quoteattr(row.id)} "
                f"source={quoteattr(str(row.src))} "
                f"target={quoteattr(str(row.dst))}>"
                f"<spells>{spell_xml}</spells></edge>\n"
            )
    if section is not None:
        parts.append(f"    </{section}>\n")
    parts.append("  </graph>\n</gexf>\n")
    return "".join(parts)


def write_gexf_sharded(
    spells: DataFrame,
    out_dir: str,
    partition_by: str = "run",
    timeformat: str = "long",
) -> list[str]:
    """Sharded dynamic-GEXF export: one complete, independently valid
    GEXF file per distinct value of ``partition_by`` (a run id, a time
    slice, a deployment...). Removes the single-driver-file bound of
    :func:`write_gexf` for bulk export: each shard's document is
    assembled INSIDE an applyInPandas task (grouped by the shard key,
    so assembly parallelism = number of shards and no shard ever
    transits the driver); only the (shard, path) manifest returns.

    ``spells`` needs the SPELL_SCHEMA columns plus the shard column.
    Files are written to ``{out_dir}/{partition_by}={value}.gexf``;
    each round-trips through :func:`read_gexf` on its own. Returns the
    sorted list of written paths.
    """
    import os

    import pandas as pd
    import pyspark.sql.functions as F

    if timeformat not in ("integer", "long", "double"):
        raise ValueError(f"unsupported timeformat {timeformat!r}")
    if partition_by not in spells.columns:
        raise ValueError(f"shard column {partition_by!r} not in input")
    os.makedirs(out_dir, exist_ok=True)

    grouped = (
        spells.groupBy(partition_by, "kind", "id", "src", "dst")
        .agg(
            F.sort_array(F.collect_list(F.struct("t_start", "t_end"))).alias("sp")
        )
    )

    from types import SimpleNamespace

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = pdf[partition_by].iloc[0]
        # nodes before edges, ids sorted — same deterministic layout as
        # the single-file sink's orderBy(desc(kind), id)
        pdf = pdf.sort_values(
            ["kind", "id"], ascending=[False, True], kind="mergesort"
        )
        # Arrow hands array<struct> to pandas as dicts, and nullable
        # long columns as float64 (NaN on node rows) — normalize to the
        # attribute-access rows _gexf_document expects, with src/dst
        # back to ints so edges serialize as "2", not "2.0"
        rows = [
            SimpleNamespace(
                kind=r.kind,
                id=r.id,
                src=None if pd.isna(r.src) else int(r.src),
                dst=None if pd.isna(r.dst) else int(r.dst),
                sp=[
                    SimpleNamespace(t_start=s["t_start"], t_end=s["t_end"])
                    for s in r.sp
                ],
            )
            for r in pdf.itertuples(index=False)
        ]
        path = os.path.join(out_dir, f"{partition_by}={shard}.gexf")
        with open(path, "w", encoding="utf-8") as f:
            f.write(_gexf_document(rows, timeformat))
        return pd.DataFrame({"shard": [str(shard)], "path": [path]})

    manifest = grouped.groupBy(partition_by).applyInPandas(
        write_shard, "shard string, path string"
    )
    return sorted(r.path for r in manifest.collect())
