"""ES aggregation family (query/aggs.py): STRICT golden cases on a tiny
hand-built frame plus sketch-vs-exact error bounds on the events table."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.query import aggs

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


@pytest.fixture(scope="module")
def tiny(spark):
    ts = datetime.datetime
    rows = [
        (1, ts(2024, 1, 10, 5), "a", 10.0),
        (2, ts(2024, 1, 20, 6), "a", 30.0),
        (3, ts(2024, 2, 1, 7), "b", -5.0),
        (4, ts(2024, 2, 15, 8), "b", 25.0),
        (5, ts(2024, 2, 28, 9), "a", 25.0),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")


def test_date_histogram_strict(tiny):
    got = [(r["bucket"], r["doc_count"]) for r in aggs.date_histogram(tiny, "ts", "month").collect()]
    ts = datetime.datetime
    assert got == [(ts(2024, 1, 1), 2), (ts(2024, 2, 1), 3)]


def test_date_histogram_min_doc_count(tiny):
    got = aggs.date_histogram(tiny, "ts", "month", min_doc_count=3).collect()
    assert [(r["bucket"], r["doc_count"]) for r in got] == [
        (datetime.datetime(2024, 2, 1), 3)
    ]


def test_date_histogram_bad_interval(tiny):
    with pytest.raises(ValueError):
        aggs.date_histogram(tiny, "ts", "fortnight")


def test_histogram_strict_negative_bucket(tiny):
    # ES bucket key floor(v/10)*10: -5 lands in -10, not 0
    got = [(r["bucket"], r["doc_count"]) for r in aggs.histogram(tiny, "v", 10.0).collect()]
    assert got == [(-10.0, 1), (10.0, 1), (20.0, 2), (30.0, 1)]


def test_stats_strict(tiny):
    r = aggs.stats_agg(tiny, "v").collect()[0]
    assert (r["count"], r["min"], r["max"], r["avg"], r["sum"]) == (5, -5.0, 30.0, 17.0, 85.0)


def test_extended_stats_population_moments(tiny):
    r = aggs.extended_stats_agg(tiny, "v").collect()[0]
    # population variance of [10,30,-5,25,25] = 830/5 = 166.0 (sample: 207.5)
    assert r["sum_of_squares"] == 2275.0
    assert r["variance"] == pytest.approx(166.0)
    assert r["std_deviation"] == pytest.approx(166.0 ** 0.5, abs=1e-4)


def test_cardinality_exact_vs_sketch(events):
    exact = aggs.cardinality_agg(events, "user_id", exact=True).collect()[0]["value"]
    approx = aggs.cardinality_agg(events, "user_id", rsd=0.05).collect()[0]["value"]
    assert exact > 0
    assert abs(approx - exact) <= max(1, 0.15 * exact)  # 3x rsd slack


def test_percentiles_exact_interpolation(tiny):
    got = {r["percent"]: r["value"] for r in aggs.percentiles_agg(tiny, "v", (50.0,), exact=True).collect()}
    assert got == {50.0: 25.0}


def test_percentiles_sketch_close_to_exact(events):
    exact = {
        r["percent"]: r["value"]
        for r in aggs.percentiles_agg(events, "value", (50.0, 95.0), exact=True).collect()
    }
    approx = {
        r["percent"]: r["value"]
        for r in aggs.percentiles_agg(events, "value", (50.0, 95.0)).collect()
    }
    for p, v in exact.items():
        assert abs(approx[p] - v) <= 0.05 * max(1.0, v)


def test_top_hits_by_bucket_strict(tiny):
    got = [
        (r["k"], r["id"], r["hit_rank"])
        for r in aggs.top_hits_by_bucket(tiny, "k", "v", n=2, tiebreak_col="id")
        .orderBy("k", "hit_rank")
        .collect()
    ]
    # bucket a: 30 (id2) then the 25-tie broken by id asc -> id5
    assert got == [("a", 2, 1), ("a", 5, 2), ("b", 4, 1), ("b", 3, 2)]


def test_date_histogram_stats_single_shuffle(tiny):
    df = aggs.date_histogram_stats(tiny, "ts", "v", "month")
    rows = [(r["bucket"].month, r["doc_count"], r["min"], r["max"], r["avg"], r["sum"]) for r in df.collect()]
    assert rows == [(1, 2, 10.0, 30.0, 20.0, 40.0), (2, 3, -5.0, 25.0, 15.0, 45.0)]
    # ES's nested agg tree must flatten to ONE aggregation exchange (AQE's
    # string repeats the pre-AQE plan after '== Initial Plan ==' — count only
    # the executed section)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_index_docs_live(spark, tmp_path):
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.index.tombstones import delete_docs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(50)
    root = str(tmp_path / "aggidx")
    build_index(spark, docs, root, content_col="text", id_col="doc_id",
                meta_cols=("lang",), tokenizer="standard", n_buckets=2,
                shard_size=32, n_ckpt_batches=1)
    before = aggs.cardinality_agg(aggs.index_docs(spark, root), "lang", exact=True).collect()[0]["value"]
    n_before = aggs.index_docs(spark, root).count()
    delete_docs(spark, root, [0, 1, 2])
    assert aggs.index_docs(spark, root).count() == n_before - 3
    assert before >= 1


def test_composite_agg_pagination_covers_all_buckets(events):
    full = [
        (r["event_type"], r["user_id"], r["doc_count"])
        for r in aggs.composite_agg(
            events, ["event_type", "user_id"], size=10_000
        ).collect()
    ]
    assert full == sorted(full)
    paged, after = [], None
    while True:
        page = [
            (r["event_type"], r["user_id"], r["doc_count"])
            for r in aggs.composite_agg(
                events, ["event_type", "user_id"], size=7, after=after
            ).collect()
        ]
        if not page:
            break
        paged.extend(page)
        after = page[-1][:2]
    assert paged == full


def test_composite_agg_validation(events):
    import pytest as _pt

    with _pt.raises(ValueError):
        aggs.composite_agg(events, [])
    with _pt.raises(ValueError):
        aggs.composite_agg(events, ["event_type"], after=("a", "b"))


def test_significant_terms_jlh_strict(spark):
    # 4 docs: 'rare' appears in every foreground doc, never in background;
    # 'common' appears everywhere (JLH score 0)
    rows = [
        (1, "common rare alpha", "en"),
        (2, "common rare beta", "en"),
        (3, "common rare gamma", "en"),
        (4, "common delta", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["term"]: (r["fg_count"], r["bg_count"], r["score"])
        for r in aggs.significant_terms(
            df, "text", F.col("lang") == "en", size=10, min_doc_count=1
        ).collect()
    }
    # rare: fg_pct = 3/3 = 1, bg_pct = 3/4 -> (1 - .75) * (1/.75) = 1/3
    assert got["rare"] == (3, 3, pytest.approx(0.33333333))
    # common: fg_pct = bg_pct = 1 -> score 0
    assert got["common"][2] == 0.0
    # min_doc_count prunes the singletons (alpha/beta/gamma at 1 < 2)
    pruned = {
        r["term"]
        for r in aggs.significant_terms(
            df, "text", F.col("lang") == "en", min_doc_count=2
        ).collect()
    }
    assert pruned == {"rare", "common"}
    # empty foreground: every fg_count is 0 -> empty result, no crash
    assert aggs.significant_terms(df, "text", F.col("lang") == "zz").collect() == []
    with pytest.raises(ValueError):
        aggs.significant_terms(df, "text", F.col("lang") == "en", min_doc_count=0)


def test_composite_agg_drops_null_keys(spark):
    rows = [(1, "a"), (2, None), (3, "b"), (4, None)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = [(r["k"], r["doc_count"]) for r in aggs.composite_agg(df, ["k"]).collect()]
    assert got == [("a", 1), ("b", 1)]  # ES missing_bucket=false


def test_histogram_rejects_bad_interval(tiny):
    with pytest.raises(ValueError):
        aggs.histogram(tiny, "v", 0.0)
    with pytest.raises(ValueError):
        aggs.histogram(tiny, "v", -5.0)


# ---- round 4: range + filters aggs ------------------------------------------


def test_range_agg_buckets_and_overlap(spark, events):
    from es_indexer_spark.query.aggs import range_agg

    out = range_agg(
        events, "value", [(None, 25.0), (25.0, 50.0), (10.0, 30.0), (50.0, None)]
    ).collect()
    rows = events.select("value").collect()
    vals = [r["value"] for r in rows if r["value"] is not None]
    want = [
        ("*-25.0", sum(1 for v in vals if v < 25)),
        ("25.0-50.0", sum(1 for v in vals if 25 <= v < 50)),
        ("10.0-30.0", sum(1 for v in vals if 10 <= v < 30)),  # overlaps both
        ("50.0-*", sum(1 for v in vals if v >= 50)),
    ]
    assert [(r["key"], r["doc_count"]) for r in out] == want
    import pytest as _pt

    with _pt.raises(ValueError):
        range_agg(events, "value", [])


def test_filters_agg_named_buckets(spark, events):
    from es_indexer_spark.query.aggs import filters_agg

    out = filters_agg(
        events,
        {"clicks": F.col("event_type") == "click", "big": F.col("value") > 50.0},
    ).collect()
    rows = events.select("event_type", "value").collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("clicks", sum(1 for r in rows if r["event_type"] == "click")),
        ("big", sum(1 for r in rows if r["value"] is not None and r["value"] > 50)),
    ]


def test_pipeline_aggs_derivative_cumsum_mavg(spark):
    """ES pipeline aggs over a parent histogram: derivative (first bucket
    NULL), cumulative_sum (running total), moving_avg (trailing window,
    partial head like ES moving_fn)."""
    from es_indexer_spark.query.aggs import cumulative_sum, derivative, moving_avg

    hist = spark.createDataFrame(
        [(1, 10), (2, 13), (3, 7), (4, 7), (5, 20)], "bucket int, doc_count long"
    )
    out = moving_avg(
        cumulative_sum(derivative(hist, "doc_count"), "doc_count"),
        "doc_count", window=3,
    ).orderBy("bucket").collect()
    assert [r["doc_count_deriv"] for r in out] == [None, 3, -6, 0, 13]
    assert [r["doc_count_cumsum"] for r in out] == [10, 23, 30, 37, 57]
    import pytest as _pytest

    assert out[0]["doc_count_mavg"] == 10.0
    assert out[1]["doc_count_mavg"] == _pytest.approx(11.5)
    assert out[2]["doc_count_mavg"] == _pytest.approx(10.0)
    assert out[4]["doc_count_mavg"] == _pytest.approx((7 + 7 + 20) / 3)


def test_pipeline_bucket_sort_pages(spark):
    from es_indexer_spark.query.aggs import bucket_sort

    hist = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1)], "key string, doc_count long"
    )
    top = bucket_sort(hist, [("doc_count", "desc"), ("key", "asc")], size=2).collect()
    assert [(r["key"], r["doc_count"]) for r in top] == [("b", 9), ("c", 9)]
    page2 = bucket_sort(
        hist, [("doc_count", "desc"), ("key", "asc")], size=2, from_=2
    ).collect()
    assert [r["key"] for r in page2] == ["a", "d"]


# ---- round-5 additions: pipeline round 2 + metric/bucket families ----------

def test_bucket_script_and_selector(tiny):
    b = aggs.date_histogram_stats(tiny, "ts", "v", "month")
    r = aggs.bucket_script(b, "sum / doc_count", name="ratio")
    got = [(x["bucket"].month, x["ratio"]) for x in r.collect()]
    assert got == [(1, 20.0), (2, 15.0)]
    kept = aggs.bucket_selector(r, "ratio > 16").collect()
    assert [x["bucket"].month for x in kept] == [1]


def test_serial_diff_head_nulls(tiny):
    b = aggs.date_histogram(tiny, "ts", "month")
    r = aggs.serial_diff(b, "doc_count", lag=1).collect()
    assert [x["doc_count_diff_1"] for x in r] == [None, 1]
    with pytest.raises(ValueError):
        aggs.serial_diff(b, "doc_count", lag=0)


def test_sibling_bucket_stats_tie_keys(spark):
    b = spark.createDataFrame(
        [("a", 5.0), ("b", 2.0), ("c", 5.0), ("d", 3.0)], "bucket string, m double")
    r = aggs.sibling_bucket_stats(b, "m", bucket_col="bucket").collect()[0]
    assert (r["count"], r["min"], r["max"], r["avg"], r["sum"]) == (4, 2.0, 5.0, 3.75, 15.0)
    assert r["min_keys"] == ["b"]
    assert r["max_keys"] == ["a", "c"]  # ES reports ALL tied keys, sorted


def test_weighted_avg_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(10.0, 1.0), (20.0, 3.0), (None, 5.0), (99.0, None)], "v double, w double")
    assert aggs.weighted_avg(df, "v", "w").collect()[0]["value"] == pytest.approx(17.5)


def test_value_count(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    assert aggs.value_count_agg(df, "v").collect()[0]["value"] == 2


def test_median_absolute_deviation_exact(spark):
    df = spark.createDataFrame([(float(x),) for x in [10, 30, 10, 50]], "v double")
    # median 20; |x-20| = [10,10,10,30] -> median 10
    assert aggs.median_absolute_deviation(df, "v").collect()[0]["value"] == 10.0
    # sketch path: percentile_approx is rank-based (no midpoint interpolation),
    # so use an odd count where rank and interpolated medians coincide
    df2 = spark.createDataFrame([(float(x),) for x in [10, 10, 30, 50, 50]], "v double")
    assert aggs.median_absolute_deviation(df2, "v").collect()[0]["value"] == 20.0
    approx = aggs.median_absolute_deviation(df2, "v", exact=False).collect()[0]["value"]
    assert approx == pytest.approx(20.0, abs=1e-9)


def test_multi_terms_order_and_null_drop(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y"), ("a", "y"), (None, "z")],
        "k string, j string")
    got = [(r["k"], r["j"], r["doc_count"]) for r in
           aggs.multi_terms(df, ["k", "j"], size=2).collect()]
    assert got == [("a", "x", 2), ("a", "y", 1)]  # count desc, keys asc


def test_adjacency_matrix_pairs_and_empty_omitted(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y")], "k string, j string")
    got = [(r["key"], r["doc_count"]) for r in aggs.adjacency_matrix(
        df, {"ka": F.col("k") == "a", "jx": F.col("j") == "x",
             "jz": F.col("j") == "z"}).collect()]
    # jz and its pairs are empty -> omitted; request order preserved
    assert got == [("ka", 2), ("jx", 2), ("ka&jx", 2)]


# ---- geo aggregations (geo_bounds / geo_centroid / geotile / geohash) ------

import math as _math
import random as _random

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_py(lon, lat, p):
    lon_rng, lat_rng = [-180.0, 180.0], [-90.0, 90.0]
    bits, even = [], True
    while len(bits) < 5 * p:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1); rng[0] = mid
        else:
            bits.append(0); rng[1] = mid
        even = not even
    return "".join(
        _B32[int("".join(map(str, bits[5 * i:5 * i + 5])), 2)] for i in range(p)
    )


def _tile_py(lon, lat, z):
    n = 1 << z
    lat = max(-85.05112878, min(85.05112878, lat))
    x = min(n - 1, max(0, _math.floor((lon + 180) / 360 * n)))
    lr = _math.radians(lat)
    y = min(n - 1, max(0, _math.floor(
        (1 - _math.log(_math.tan(lr) + 1 / _math.cos(lr)) / _math.pi) / 2 * n)))
    return f"{z}/{x}/{y}"


@pytest.fixture(scope="module")
def geo_pts(spark):
    rng = _random.Random(7)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(150)]
    pts += [(-180.0, -90.0), (179.999999, 89.999999), (0.0, 0.0), (180.0, 90.0)]
    return pts, spark.createDataFrame(pts, "lon double, lat double")


@pytest.mark.parametrize("p", [1, 5, 12])
def test_geohash_cell_reference_parity(geo_pts, p):
    pts, df = geo_pts
    got = [r[0] for r in df.select(aggs.geohash_cell(F.col("lon"), F.col("lat"), p)).collect()]
    for (lon, lat), g in zip(pts, got):
        if lon < 180 and lat < 90:  # the +180/+90 edge clamps (no reference cell)
            assert g == _gh_py(lon, lat, p), (lon, lat)
    # the degenerate edge clamps into the last cell instead of overflowing
    assert got[-1] == "z" * p


@pytest.mark.parametrize("z", [0, 7, 15])
def test_geotile_cell_reference_parity(geo_pts, z):
    pts, df = geo_pts
    got = [r[0] for r in df.select(aggs.geotile_cell(F.col("lon"), F.col("lat"), z)).collect()]
    for (lon, lat), g in zip(pts[:-1], got[:-1]):
        assert g == _tile_py(lon, lat, z), (lon, lat)


def test_geo_cell_precision_bounds():
    with pytest.raises(ValueError):
        aggs.geohash_cell(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(ValueError):
        aggs.geohash_cell(F.col("lon"), F.col("lat"), 13)
    with pytest.raises(ValueError):
        aggs.geotile_cell(F.col("lon"), F.col("lat"), 30)


def test_geo_bounds_wrap_vs_unwrapped(spark):
    # cluster around the antimeridian: wrapped box is narrower
    w = spark.createDataFrame(
        [(170.0, 0.0), (-175.0, 10.0), (160.0, -5.0)], "lon double, lat double")
    r = aggs.geo_bounds(w, wrap_longitude=True).collect()[0]
    assert (r["top"], r["bottom"], r["left"], r["right"]) == (10.0, -5.0, 160.0, -175.0)
    u = aggs.geo_bounds(w).collect()[0]
    assert (u["left"], u["right"]) == (-175.0, 170.0)
    # cluster around Greenwich: the unwrapped box stays narrower even wrapped
    g = spark.createDataFrame(
        [(-10.0, 0.0), (20.0, 5.0)], "lon double, lat double")
    r2 = aggs.geo_bounds(g, wrap_longitude=True).collect()[0]
    assert (r2["left"], r2["right"]) == (-10.0, 20.0)
    # single hemisphere: wrap can't apply
    s1 = spark.createDataFrame([(30.0, 0.0), (40.0, 1.0)], "lon double, lat double")
    r3 = aggs.geo_bounds(s1, wrap_longitude=True).collect()[0]
    assert (r3["left"], r3["right"]) == (30.0, 40.0)


def test_geo_centroid(spark):
    df = spark.createDataFrame([(0.0, 10.0), (10.0, 20.0)], "lon double, lat double")
    r = aggs.geo_centroid(df).collect()[0]
    assert (r["lon"], r["lat"], r["count"]) == (5.0, 15.0, 2)


def test_geotile_grid_ordering(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0)] * 3 + [(-170.0, -80.0)] * 2 + [(100.0, 50.0)],
        "lon double, lat double")
    got = [(r["key"], r["doc_count"]) for r in
           aggs.geotile_grid(df, precision=2, size=2).collect()]
    assert got[0][1] == 3 and got[1][1] == 2


def test_geohash_grid_counts(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0001, 1.0001), (-170.0, -80.0)], "lon double, lat double")
    got = {r["key"]: r["doc_count"] for r in
           aggs.geohash_grid(df, precision=3, size=10).collect()}
    assert got[_gh_py(1.0, 1.0, 3)] == 2
    assert got[_gh_py(-170.0, -80.0, 3)] == 1


# ---- metric aggs 2 (percentile_ranks / boxplot / string_stats / top_metrics)

def test_percentile_ranks_exact_cdf(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "v double")
    got = {r["value"]: r["percent_rank"] for r in
           aggs.percentile_ranks_agg(df, "v", [0.5, 5.0, 7.5, 10.0, 99.0]).collect()}
    assert got[0.5] == 0.0          # below min
    assert got[5.0] == 50.0         # half the values <= 5
    assert got[7.5] == 70.0
    assert got[10.0] == 100.0       # at max
    assert got[99.0] == 100.0       # above max
    with pytest.raises(ValueError):
        aggs.percentile_ranks_agg(df, "v", [])


def test_boxplot_quartiles_and_whiskers(spark):
    # 1..9 plus an outlier far beyond 1.5*IQR
    df = spark.createDataFrame([(float(v),) for v in range(1, 10)] + [(100.0,)],
                               "v double")
    r = aggs.boxplot_agg(df, "v").collect()[0]
    # exact linear-interpolation quartiles of 10 values
    assert (r["min"], r["max"]) == (1.0, 100.0)
    assert (r["q1"], r["q2"], r["q3"]) == (3.25, 5.5, 7.75)
    # fences: q1-1.5*iqr = -3.5, q3+1.5*iqr = 14.5 -> whiskers are observed 1 and 9
    assert (r["lower"], r["upper"]) == (1.0, 9.0)


def test_string_stats_entropy(spark):
    # "aabb" over two rows: 4 chars, p(a)=p(b)=0.5 -> entropy exactly 1 bit
    df = spark.createDataFrame([("aa",), ("bb",)], "s string")
    r = aggs.string_stats_agg(df, "s").collect()[0]
    assert (r["count"], r["min_length"], r["max_length"], r["avg_length"]) == (2, 2, 2, 2.0)
    assert r["entropy"] == 1.0
    # uniform 4-symbol alphabet -> 2 bits
    df4 = spark.createDataFrame([("abcd",)], "s string")
    assert aggs.string_stats_agg(df4, "s").collect()[0]["entropy"] == 2.0


def test_top_metrics_order_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(3.0, 1, "a"), (5.0, 2, "b"), (5.0, 1, "c"), (1.0, 9, "d")],
        "v double, id int, m string")
    got = [(r["v"], r["m"]) for r in
           aggs.top_metrics_agg(df, "v", ["m"], size=2, tiebreak=["id"]).collect()]
    assert got == [(5.0, "c"), (5.0, "b")]
    asc = aggs.top_metrics_agg(df, "v", ["m"], size=1, asc=True).collect()
    assert asc[0]["m"] == "d"


# ---- bucket aggs 2 (date_range / rate / auto_date_histogram / geo_distance)

def test_date_range_half_open(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-02-01 00:00:00",), ("2024-03-15 12:00:00",)],
        "t string").select(F.to_timestamp("t").alias("t"))
    got = [(r["key"], r["doc_count"]) for r in aggs.date_range_agg(
        df, "t", [(None, "2024-02-01"), ("2024-02-01", "2024-04-01"), ("2024-01-01", None)]
    ).collect()]
    # from inclusive, to exclusive: the 02-01 row is NOT in the first bucket
    assert got == [("*-2024-02-01", 1), ("2024-02-01-2024-04-01", 2),
                   ("2024-01-01-*", 3)]


def test_rate_calendar_divisor(spark):
    # 62 events in Jan-2024 (31 d) and 29 in Feb-2024 (29 d, leap year)
    rows = [(f"2024-01-{d:02d} 01:00:00",) for d in range(1, 32) for _ in range(2)]
    rows += [(f"2024-02-{d:02d} 01:00:00",) for d in range(1, 30)]
    df = spark.createDataFrame(rows, "t string").select(F.to_timestamp("t").alias("t"))
    got = {str(r["bucket"])[:7]: r["rate"] for r in
           aggs.rate_agg(df, "t", interval="month", unit="day").collect()}
    assert got["2024-01"] == 2.0   # 62 / 31
    assert got["2024-02"] == 1.0   # 29 / 29
    # sum-field variant, weekly unit
    df2 = df.withColumn("v", F.lit(31.0))
    got2 = {str(r["bucket"])[:7]: r["rate"] for r in
            aggs.rate_agg(df2, "t", interval="month", unit="week", field="v").collect()}
    assert got2["2024-01"] == round(62 * 31.0 / (31 / 7.0), 6)


def test_auto_date_histogram_picks_finest_fitting(spark):
    # 3 distinct days x 4 distinct hours each = 12 hours > 10 -> day wins
    rows = [(f"2024-01-{d:02d} {h:02d}:{m:02d}:00",)
            for d in (1, 2, 3) for h in (0, 3, 6, 9) for m in range(10)]
    df = spark.createDataFrame(rows, "t string").select(F.to_timestamp("t").alias("t"))
    out = aggs.auto_date_histogram(df, "t", buckets=10).collect()
    assert out[0]["interval"] == "day" and len(out) == 3
    assert all(r["doc_count"] == 40 for r in out)
    hour = aggs.auto_date_histogram(df, "t", buckets=60).collect()
    assert hour[0]["interval"] == "hour" and len(hour) == 12
    # a single month of data collapses to one month bucket at target 1
    assert aggs.auto_date_histogram(df, "t", buckets=1).collect()[0]["interval"] == "month"


def test_geo_distance_rings(spark):
    # origin, ~111.2 km north (1 deg lat), antipode-ish far point
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 1.0), (90.0, 0.0)], "lon double, lat double")
    got = [(r["key"], r["doc_count"]) for r in aggs.geo_distance_agg(
        df, 0.0, 0.0, [(None, 1.0), (1.0, 200.0), (200.0, None), (None, None)]
    ).collect()]
    assert got == [("*-1.0", 1), ("1.0-200.0", 1), ("200.0-*", 1), ("*-*", 3)]


def test_haversine_known_distance(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    d = df.select(aggs.haversine_km(
        F.col("lon"), F.col("lat"), F.lit(0.0), F.lit(1.0)).alias("d")).collect()[0]["d"]
    assert abs(d - 111.195) < 0.01  # 1 degree of latitude on the IUGG sphere
