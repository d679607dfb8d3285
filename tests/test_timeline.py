"""Timeline API semantics matched to BaseTimeline.java — especially the
EXCLUSIVE range bounds (:658,:678) and strict after/before."""

from __future__ import annotations

import pytest

from neo4j_dynagraph_spark.operators.timeline import Timeline

ROWS = [(i, ts) for i, ts in enumerate([100, 200, 200, 300, 400, 500])]


@pytest.fixture(scope="module")
def tl(spark):
    df = spark.createDataFrame(ROWS, "id long, timestamp long")
    return Timeline(df)


def _ts(df):
    return [r.timestamp for r in df.collect()]


def test_point(tl):
    assert _ts(tl.point(200)) == [200, 200]
    assert _ts(tl.point(250)) == []


def test_between_exclusive_both_ends(tl):
    # BaseTimeline.getAllNodesBetween: strictly > t1 (:678), stops at >= t2 (:658)
    assert _ts(tl.between(100, 400)) == [200, 200, 300]
    assert _ts(tl.between(99, 501)) == [100, 200, 200, 300, 400, 500]


def test_between_validates_order(tl):
    with pytest.raises(ValueError):
        tl.between(400, 100)
    with pytest.raises(ValueError):
        tl.between(400, 400)


def test_after_before_strict(tl):
    assert _ts(tl.after(300)) == [400, 500]
    assert _ts(tl.before(200)) == [100]


def test_first_last_bounds(tl):
    assert _ts(tl.first()) == [100]
    assert _ts(tl.last()) == [500]
    b = tl.bounds().collect()[0]
    assert (b.min_ts, b.max_ts) == (100, 500)


def test_by_date(tl):
    # 1970-01-01 00:05:00 UTC == epoch 300
    assert _ts(tl.by_date("1970-01-01 00:05:00")) == [300]


def test_by_date_parts(spark):
    # epoch 1705312800 = 2024-01-15 10:00:00 UTC
    df = spark.createDataFrame(
        [(1, 1705312800), (2, 1705316400), (3, 1705399200)], "id long, timestamp long"
    )
    tl = Timeline(df)
    assert _ts(tl.by_date_parts(year=2024, month=1, day=15)) == [1705312800, 1705316400]
    assert _ts(tl.by_date_parts(year=2024, month=1, day=15, hour=10)) == [1705312800]


def test_add_remove(tl, spark):
    import pyspark.sql.functions as F

    added = tl.add(spark.createDataFrame([(99, 250)], "id long, timestamp long"))
    assert _ts(added.between(200, 300)) == [250]
    removed = added.remove(F.col("timestamp") == 200)
    assert _ts(removed.all()) == [100, 250, 300, 400, 500]
