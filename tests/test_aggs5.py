"""Round-5d agg families: moving_percentiles, variable_width_histogram,
categorize_text, scripted_metric, parent agg, global agg.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.query.aggs import (
    categorize_text,
    moving_percentiles,
    scripted_metric,
    variable_width_histogram,
)
from es_indexer_spark.query.nested import parent_agg


@pytest.fixture(scope="module")
def buckets(spark):
    rows = [(i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50, 60])]
    return spark.createDataFrame(rows, "bucket int, m double")


def test_moving_percentiles_head_and_window(spark, buckets):
    out = {
        r["bucket"]: r["m_p50"]
        for r in moving_percentiles(buckets, "m", window=3, percent=50.0).collect()
    }
    # shift=0: the 3 buckets BEFORE the current one; head windows partial
    assert out[0] is None
    assert out[1] == 10.0
    assert out[2] == 15.0          # median of [10,20] interpolated
    assert out[3] == 20.0          # median of [10,20,30]
    assert out[4] == 30.0          # median of [20,30,40]


def test_moving_percentiles_interpolation_r7(spark, buckets):
    out = {
        r["bucket"]: r["m_p25"]
        for r in moving_percentiles(
            buckets, "m", window=4, percent=25.0, shift=1
        ).collect()
    }
    # window incl current, first full window [10,20,30,40]: p25 = 17.5 (R-7)
    assert out[3] == 17.5


def test_vwh_exact_partition(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    )
    out = variable_width_histogram(df, "v", buckets=4, exact=True).collect()
    assert [r["bucket_idx"] for r in out] == [0, 1, 2, 3]
    assert [r["doc_count"] for r in out] == [25, 25, 25, 25]
    assert out[0]["min"] == 1.0 and out[3]["max"] == 100.0
    # buckets tile the range without overlap
    for a, b in zip(out, out[1:]):
        assert a["max"] < b["min"]
    # centroid key is the bucket mean
    assert out[0]["key"] == pytest.approx(13.0)


def test_vwh_approx_covers_all_rows(spark):
    df = spark.createDataFrame([(float(i % 37),) for i in range(500)], "v double")
    out = variable_width_histogram(df, "v", buckets=5).collect()
    assert sum(r["doc_count"] for r in out) == 500
    assert 1 <= len(out) <= 5


def test_vwh_single_bucket_and_nulls(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    out = variable_width_histogram(df, "v", buckets=1, exact=True).collect()
    assert len(out) == 1
    assert out[0]["doc_count"] == 2 and out[0]["min"] == 1.0 and out[0]["max"] == 2.0


def test_categorize_text_collapses_variable_parts(spark):
    df = spark.createDataFrame(
        [
            ("Connection from 10.0.0.1 port 8080 failed",),
            ("Connection from 192.168.7.13 port 443 failed",),
            ("User 12 logged in at 0xDEADBEEF",),
            ("User 9981 logged in at 0xcafe1234",),
            ("totally unique message",),
        ],
        "msg string",
    )
    out = {r["key"]: r["doc_count"] for r in categorize_text(df, "msg").collect()}
    # the number pattern takes one decimal point, so an IPv4 quad collapses
    # to two <num> tokens — template still identical across addresses
    assert out["connection from <num>.<num> port <num> failed"] == 2
    assert out["user <num> logged in at <hex>"] == 2
    assert out["totally unique message"] == 1


def test_scripted_metric_grouped_and_global(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, x double"
    )
    got = scripted_metric(df, "x * 2", "total / n", group_by=["g"]).collect()
    assert [(r["g"], r["value"]) for r in got] == [("a", 4.0), ("b", 20.0)]
    tot = scripted_metric(df, "x", "total").collect()
    assert tot[0]["value"] == 14.0


def test_parent_agg_distinct_parents(spark):
    parents = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)], "pid int, amount double"
    )
    children = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "y")],
        "cpid int, tag string",
    )
    out = parent_agg(
        parents, children, parent_key="pid", child_parent_key="cpid",
        group_field="tag", parent_metric=F.avg("amount"), metric_name="avg_amt",
    ).collect()
    # tag x: parents {1,2} (parent 1 counts once despite 2 children)
    assert [(r["tag"], r["doc_count"], r["avg_amt"]) for r in out] == [
        ("x", 2, 150.0), ("y", 2, 250.0),
    ]


def test_geo_grid_query_agrees_with_grid_agg(spark):
    from es_indexer_spark.query.aggs import (
        geo_grid_query,
        geohash_grid,
        geotile_grid,
    )

    pts = spark.createDataFrame(
        [(float((i * 7) % 360 - 180), float((i * 13) % 170 - 85)) for i in range(400)],
        "lon double, lat double",
    )
    top = geotile_grid(pts, precision=3, size=1).collect()[0]
    got = geo_grid_query(pts, geotile=top["key"]).count()
    assert got == top["doc_count"]
    toph = geohash_grid(pts, precision=2, size=1).collect()[0]
    goth = geo_grid_query(pts, geohash=toph["key"]).count()
    assert goth == toph["doc_count"]
    with pytest.raises(ValueError):
        geo_grid_query(pts)
    with pytest.raises(ValueError):
        geo_grid_query(pts, geotile="3/0/0", geohash="u0")


def test_ip_range_agg_brute(spark):
    from es_indexer_spark.query.aggs import ip_range_agg

    rows = [(f"10.{i % 4}.{i % 7}.{i % 250}",) for i in range(300)] + [(None,)]
    df = spark.createDataFrame(rows, "ip string")
    ranges = [(None, "10.1.0.0"), ("10.1.0.0", "10.3.0.0"), ("10.2.0.0", None)]
    got = [(r["key"], r["doc_count"]) for r in ip_range_agg(df, "ip", ranges).collect()]

    def ip2i(s):
        a, b, c, d = map(int, s.split("."))
        return ((a * 256 + b) * 256 + c) * 256 + d

    vals = [ip2i(r[0]) for r in rows if r[0] is not None]
    exp = [
        ("*-10.1.0.0", sum(v < ip2i("10.1.0.0") for v in vals)),
        ("10.1.0.0-10.3.0.0",
         sum(ip2i("10.1.0.0") <= v < ip2i("10.3.0.0") for v in vals)),
        ("10.2.0.0-*", sum(v >= ip2i("10.2.0.0") for v in vals)),
    ]
    assert got == exp
    with pytest.raises(ValueError):
        ip_range_agg(df, "ip", [("::1", None)])


def test_random_sampler_deterministic_and_scaled(spark):
    from es_indexer_spark.query.aggs import random_sampler_agg

    df = spark.createDataFrame([(i, "t") for i in range(1000)], "id long, g string")
    a = random_sampler_agg(df, "id", 0.25, group_field="g").collect()[0]
    b = random_sampler_agg(df, "id", 0.25, group_field="g").collect()[0]
    assert a == b                       # deterministic (ES's RNG is not)
    assert a["doc_count"] == round(a["sampled_count"] / 0.25)
    assert 0.15 * 1000 < a["sampled_count"] < 0.35 * 1000
    # growth stability: adding rows never flips prior membership
    from es_indexer_spark.ops.packing import _sha_bucket
    from pyspark.sql import functions as F

    small = {r["id"] for r in df.limit(400).filter(
        _sha_bucket(F.col("id"), 1_000_000) < 250_000).collect()}
    big = {r["id"] for r in df.filter(
        _sha_bucket(F.col("id"), 1_000_000) < 250_000).collect()}
    assert small <= big
    with pytest.raises(ValueError):
        random_sampler_agg(df, "id", 0.0)


def test_change_point_step_series(spark):
    from es_indexer_spark.query.aggs import change_point_agg

    rows = [(i, 10.0) for i in range(10)] + [(i, 50.0) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "bucket int, m double")
    got = change_point_agg(df, "m").collect()[0]
    assert got["change_bucket"] == 10
    assert got["left_mean"] == 10.0 and got["right_mean"] == 50.0
    assert got["variance_reduction"] == 1.0
    # stationary series: variance reduction near zero
    flat = spark.createDataFrame(
        [(i, 10.0 + (i % 2)) for i in range(20)], "bucket int, m double"
    )
    st = change_point_agg(flat, "m").collect()[0]
    assert st["variance_reduction"] < 0.3
