"""Round-5 aggs-body completion: the remaining ES aggregation families
wired through the JSON dispatch (``filter`` / ``global`` / ``composite`` /
``rare_terms`` / ``date_range`` / ``adjacency_matrix`` /
``auto_date_histogram`` / ``significant_terms`` / ``sampler`` /
``diversified_sampler``, the single-pass metric additions
``percentile_ranks`` / ``top_metrics`` / ``geo_bounds`` / ``geo_centroid``,
the frame metrics ``boxplot`` / ``string_stats`` /
``median_absolute_deviation`` / ``t_test`` / ``matrix_stats``, and the
sibling pipelines ``*_bucket`` / ``percentiles_bucket`` /
``extended_stats_bucket`` / ``normalize``).

Every test replays the JSON path against either pandas over the same match
set or the already-oracle-checked direct function in query/aggs.py — the
dispatch layer must hold NO aggregation logic of its own."""

from __future__ import annotations

import os

import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl_aggs import aggregations, match_docids

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# runtime timestamp/geo columns: documents.parquet has no date or geo_point
# column, so the date/geo families are driven through runtime_mappings —
# which also exercises that runtime fields reach every new family
RT = {
    "ts": {"type": "date",
           "script": "timestamp'2024-01-01' + make_interval(0,0,0,n_chars % 28,0,0,0)"},
    "lon": {"type": "double", "script": "(n_chars % 360) - 180.0"},
    "lat": {"type": "double", "script": "(n_chars % 160) - 80.0"},
}


@pytest.fixture(scope="module")
def agg_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_dsl_aggs3"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


def _pdf(spark, root, qnode=None):
    from es_indexer_spark.query.aggs import index_docs

    docs = index_docs(spark, root)
    if qnode is not None:
        ms = match_docids(spark, root, qnode)
        if ms is not None:
            docs = docs.join(ms, "docid", "left_semi")
    return docs.toPandas()


def test_filter_bucket_metrics_and_nested(spark, agg_index):
    body = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"en_only": {
            "filter": {"term": {"lang": "en"}},
            "aggs": {"avg_len": {"avg": {"field": "n_chars"}}},
        }},
    }
    out = aggregations(spark, agg_index, body)["en_only"].collect()[0]
    pdf = _pdf(spark, agg_index, {"match": {"text": "data"}})
    sub = pdf[pdf["lang"] == "en"]
    assert out["doc_count"] == len(sub)
    assert abs(out["avg_len"] - sub["n_chars"].mean()) < 1e-6
    # nested bucket child: terms over the filtered subset
    body2 = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"en_only": {
            "filter": {"range": {"n_chars": {"gte": 300}}},
            "aggs": {"langs": {"terms": {"field": "lang", "size": 10}}},
        }},
    }
    out2 = aggregations(spark, agg_index, body2)["en_only"].toPandas()
    sub2 = pdf[pdf["n_chars"] >= 300]
    want = (
        sub2.groupby("lang").size().reset_index(name="n")
        .sort_values(["n", "lang"], ascending=[False, True])
    )
    assert list(out2["key"]) == list(want["lang"])
    assert list(out2["doc_count"]) == list(want["n"])


def test_global_ignores_query(spark, agg_index, documents):
    body = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"all_docs": {
            "global": {},
            "aggs": {"total_len": {"sum": {"field": "n_chars"}}},
        }},
    }
    out = aggregations(spark, agg_index, body)["all_docs"].collect()[0]
    assert out["doc_count"] == documents.count()
    import pyspark.sql.functions as F

    want = documents.agg(F.sum("n_chars")).collect()[0][0]
    assert abs(out["total_len"] - want) < 1e-6


def test_composite_json_paginates(spark, agg_index):
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.aggs import index_docs

    body = {
        "size": 0,
        "aggs": {"pairs": {"composite": {
            "size": 5,
            "sources": [{"by_lang": {"terms": {"field": "lang"}}},
                        {"by_src": {"terms": {"field": "source"}}}],
        }}},
    }
    p1 = aggregations(spark, agg_index, body)["pairs"].collect()
    docs = index_docs(spark, agg_index)
    want1 = A.composite_agg(docs, ["lang", "source"], size=5).collect()
    assert [tuple(r) for r in p1] == [tuple(r) for r in want1] and len(p1) == 5
    # after = the last page-1 key, keyed by SOURCE NAME
    last = p1[-1]
    body["aggs"]["pairs"]["composite"]["after"] = {
        "by_lang": last["lang"], "by_src": last["source"],
    }
    p2 = aggregations(spark, agg_index, body)["pairs"].collect()
    want2 = A.composite_agg(
        docs, ["lang", "source"], size=5,
        after=[last["lang"], last["source"]],
    ).collect()
    assert [tuple(r) for r in p2] == [tuple(r) for r in want2]
    assert not (set((r["lang"], r["source"]) for r in p1)
                & set((r["lang"], r["source"]) for r in p2))


def test_rare_terms_stored_field(spark, agg_index):
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "tail": {"rare_terms": {"field": "n_chars", "max_doc_count": 1}},
    }})["tail"].toPandas()
    pdf = _pdf(spark, agg_index)
    vc = pdf["n_chars"].value_counts()
    want = sorted(vc[vc <= 1].index)
    assert list(out["key"]) == want and (out["doc_count"] == 1).all()


def test_date_range_and_auto_date_histogram_runtime(spark, agg_index):
    body = {
        "size": 0,
        "runtime_mappings": RT,
        "aggs": {"eras": {"date_range": {
            "field": "ts",
            "ranges": [{"to": "2024-01-10"},
                       {"from": "2024-01-10", "to": "2024-01-20"},
                       {"from": "2024-01-20"}],
        }}},
    }
    out = aggregations(spark, agg_index, body)["eras"].toPandas()
    pdf = _pdf(spark, agg_index)
    day = pdf["n_chars"] % 28 + 1  # make_interval days offset from Jan 1
    want = [
        int((day < 10).sum()), int(((day >= 10) & (day < 20)).sum()),
        int((day >= 20).sum()),
    ]
    assert list(out["doc_count"]) == want and len(out) == 3
    # auto_date_histogram picks the finest calendar unit fitting the target
    adh = aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
        "aggs": {"auto": {"auto_date_histogram": {"field": "ts", "buckets": 5}}},
    })["auto"].toPandas()
    assert len(adh) <= 5 and adh["interval"].iloc[0] in (
        "month", "year")  # 28 distinct days never fit 5 day-buckets
    assert int(adh["doc_count"].sum()) == len(pdf)


def test_adjacency_matrix_json(spark, agg_index):
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "adj": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "long": {"range": {"n_chars": {"gte": 300}}},
        }}},
    }})["adj"].toPandas()
    pdf = _pdf(spark, agg_index)
    en = pdf["lang"] == "en"
    lg = pdf["n_chars"] >= 300
    want = {"en": int(en.sum()), "long": int(lg.sum()),
            "en&long": int((en & lg).sum())}
    got = dict(zip(out["key"], out["doc_count"]))
    assert got == {k: v for k, v in want.items() if v > 0}


def test_significant_terms_keyword_jlh(spark, agg_index):
    """significant_terms over a STORED keyword field: JLH replayed in
    pandas over the same match set (text fields are significant_text —
    the direct aggs.significant_terms over the raw corpus)."""
    body = {
        "query": {"range": {"n_chars": {"gte": 400}}},
        "size": 0,
        "aggs": {"sig": {"significant_terms": {
            "field": "source", "size": 5, "min_doc_count": 3}}},
    }
    out = [(r["term"], r["fg_count"], r["bg_count"], r["score"])
           for r in aggregations(spark, agg_index, body)["sig"].collect()]
    pdf = _pdf(spark, agg_index)
    fg = pdf[pdf["n_chars"] >= 400]
    nf, na = float(len(fg)), float(len(pdf))
    rows = []
    for val, bg_n in pdf["source"].value_counts().items():
        fg_n = int((fg["source"] == val).sum())
        if fg_n < 3:
            continue
        fp, bp = fg_n / nf, bg_n / na
        rows.append((val, fg_n, int(bg_n), round((fp - bp) * (fp / bp), 8)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    assert out == rows[:5] and out
    with pytest.raises(ValueError, match="restrictive query"):
        aggregations(spark, agg_index, {"size": 0, "aggs": {
            "sig": {"significant_terms": {"field": "source"}}}})


def test_sampler_json_equals_direct(spark, agg_index):
    from es_indexer_spark.query import aggs as A

    body = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"s": {
            "sampler": {"shard_size": 25},
            "aggs": {"langs": {"terms": {"field": "lang", "size": 10}}},
        }},
    }
    out = aggregations(spark, agg_index, body)["s"].collect()
    want = A.sampler_terms(spark, agg_index, "data", "lang", shard_size=25)
    # sampler_terms caps at size=10 default; JSON terms size 10 matches
    assert [tuple(r) for r in out] == [tuple(r) for r in want.collect()]
    # diversified: at most 1 doc per source value in the sample
    body2 = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"s": {"diversified_sampler": {
            "shard_size": 25, "field": "source", "max_docs_per_value": 1}}},
    }
    hits = aggregations(spark, agg_index, body2)["s"]
    want2 = A.sampler_hits(spark, agg_index, "data", 25,
                           diversify_field="source", max_docs_per_value=1)
    assert [tuple(r) for r in hits.collect()] == [
        tuple(r) for r in want2.collect()]
    with pytest.raises(ValueError, match="match query to sample"):
        aggregations(spark, agg_index, {"size": 0, "aggs": {
            "s": {"sampler": {"shard_size": 5}}}})


def test_percentile_ranks_and_top_metrics(spark, agg_index):
    body = {"size": 0, "aggs": {
        "pr": {"percentile_ranks": {"field": "n_chars", "values": [200, 500]}},
        "tm": {"top_metrics": {"metrics": [{"field": "n_chars"}],
                                "sort": {"n_chars": "desc"}}},
    }}
    res = aggregations(spark, agg_index, body)
    pr = res["pr"].collect()[0]
    pdf = _pdf(spark, agg_index)
    for v, col in ((200, "pr_200"), (500, "pr_500")):
        want = 100.0 * (pdf["n_chars"] <= v).sum() / len(pdf)
        assert abs(pr[col] - round(want, 6)) < 1e-6
    tm = res["tm"].collect()[0]
    assert tm["tm_n_chars"] == pdf["n_chars"].max()
    # under a terms bucket: per-lang empirical CDF
    nested = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "langs": {"terms": {"field": "lang", "size": 10},
                  "aggs": {"pr": {"percentile_ranks": {
                      "field": "n_chars", "values": [300]}}}},
    }})["langs"].toPandas()
    for _i, row in nested.iterrows():
        sub = pdf[pdf["lang"] == row["key"]]
        want = round(100.0 * (sub["n_chars"] <= 300).sum() / len(sub), 6)
        assert abs(row["pr_300"] - want) < 1e-6


def test_geo_metrics_runtime(spark, agg_index):
    body = {"size": 0, "runtime_mappings": RT, "aggs": {
        "box": {"geo_bounds": {"lon_field": "lon", "lat_field": "lat"}},
        "ctr": {"geo_centroid": {"lon_field": "lon", "lat_field": "lat"}},
    }}
    res = aggregations(spark, agg_index, body)
    pdf = _pdf(spark, agg_index)
    lon = (pdf["n_chars"] % 360) - 180.0
    lat = (pdf["n_chars"] % 160) - 80.0
    box = res["box"].collect()[0]
    assert (box["box_top"], box["box_bottom"]) == (lat.max(), lat.min())
    assert (box["box_left"], box["box_right"]) == (lon.min(), lon.max())
    ctr = res["ctr"].collect()[0]
    assert abs(ctr["ctr_lon"] - round(lon.mean(), 6)) < 1e-6
    assert ctr["ctr_count"] == len(pdf)


def test_frame_metrics_json(spark, agg_index):
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.aggs import index_docs

    docs = index_docs(spark, agg_index)
    res = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "bp": {"boxplot": {"field": "n_chars"}},
        "ss": {"string_stats": {"field": "lang"}},
        "mad": {"median_absolute_deviation": {"field": "n_chars"}},
        "tt": {"t_test": {"field": "n_chars", "group_field": "lang",
                           "a": "en", "b": "fr"}},
        "mx": {"matrix_stats": {"fields": ["n_chars", "docid"]}},
    }}, exact=True)
    assert res["bp"].collect() == A.boxplot_agg(docs, "n_chars").collect()
    assert res["ss"].collect() == A.string_stats_agg(docs, "lang").collect()
    assert res["mad"].collect() == A.median_absolute_deviation(
        docs, "n_chars", exact=True).collect()
    assert res["tt"].collect() == A.t_test_agg(
        docs, "n_chars", "lang", "en", "fr").collect()
    assert res["mx"].collect() == A.matrix_stats_agg(
        docs, ["n_chars", "docid"]).collect()


def test_sibling_pipelines(spark, agg_index):
    import math

    body = {"size": 0, "runtime_mappings": RT, "aggs": {
        "per_day": {"date_histogram": {"field": "ts", "calendar_interval": "day"},
                     "aggs": {"mean_len": {"avg": {"field": "n_chars"}}}},
        "best": {"max_bucket": {"buckets_path": "per_day>_count"}},
        "avg_all": {"avg_bucket": {"buckets_path": "per_day>mean_len"}},
        "spread": {"stats_bucket": {"buckets_path": "per_day>_count"}},
        "pct": {"percentiles_bucket": {"buckets_path": "per_day>_count",
                                        "percents": [50]}},
        "norm": {"normalize": {"buckets_path": "per_day>_count",
                                "method": "percent_of_sum"}},
    }}
    res = aggregations(spark, agg_index, body)
    days = res["per_day"].toPandas()
    best = res["best"].collect()[0]
    assert best["value"] == days["doc_count"].max()
    top_keys = sorted(
        str(b) for b, c in zip(days["bucket"], days["doc_count"])
        if c == days["doc_count"].max()
    )
    assert list(best["keys"]) == top_keys
    avg_all = res["avg_all"].collect()[0]["value"]
    assert abs(avg_all - round(days["mean_len"].mean(), 6)) < 1e-6
    st = res["spread"].collect()[0]
    assert st["count"] == len(days) and st["sum"] == days["doc_count"].sum()
    pct = res["pct"].collect()[0]
    assert abs(pct["p50"] - days["doc_count"].median()) < 1e-9
    norm = res["norm"].toPandas()
    assert math.isclose(norm["doc_count_norm"].sum(), 1.0, rel_tol=1e-9)
    with pytest.raises(ValueError, match="not a sibling"):
        aggregations(spark, agg_index, {"size": 0, "aggs": {
            "b": {"max_bucket": {"buckets_path": "nope>_count"}}}})


def test_terms_order_include_exclude(spark, agg_index):
    pdf = _pdf(spark, agg_index)
    # order by a metric sub-agg asc
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "langs": {"terms": {"field": "lang", "size": 3,
                            "order": {"avg_len": "asc"}},
                  "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}},
    }})["langs"].toPandas()
    want = (
        pdf.groupby("lang")["n_chars"].mean().round(6)
        .reset_index(name="avg_len").sort_values(["avg_len", "lang"]).head(3)
    )
    assert list(out["key"]) == list(want["lang"])
    # order by _key desc
    out2 = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "langs": {"terms": {"field": "lang", "size": 2,
                            "order": {"_key": "desc"}}},
    }})["langs"].toPandas()
    assert list(out2["key"]) == sorted(pdf["lang"].unique())[::-1][:2]
    # include regex (full match) + exclude list
    out3 = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "langs": {"terms": {"field": "lang", "size": 10,
                            "include": "e.*", "exclude": ["es"]}},
    }})["langs"].toPandas()
    assert set(out3["key"]) == {
        v for v in pdf["lang"].unique() if v.startswith("e") and v != "es"}
    with pytest.raises(ValueError, match="order path"):
        aggregations(spark, agg_index, {"size": 0, "aggs": {
            "langs": {"terms": {"field": "lang", "order": {"nope": "asc"}}}}})


def test_top_hits_under_terms(spark, agg_index):
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.aggs import index_docs

    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "by_lang": {"terms": {"field": "lang"},
                    "aggs": {"best": {"top_hits": {
                        "size": 2, "sort": [{"n_chars": "desc"}]}}}},
    }})["by_lang"]
    want = A.top_hits_by_bucket(
        index_docs(spark, agg_index), "lang", "n_chars",
        n=2, descending=True, tiebreak_col="docid",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())) and out.count() > 0


def test_date_histogram_fixed_interval_and_empty_fill(spark, agg_index):
    # fixed_interval: epoch-aligned 12h buckets over the runtime ts
    out = aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
        "aggs": {"h12": {"date_histogram": {
            "field": "ts", "fixed_interval": "12h"}}},
    })["h12"].toPandas()
    pdf = _pdf(spark, agg_index)
    days = pdf["n_chars"] % 28
    # ts = Jan 1 + d days exactly at midnight → every 12h bucket is the
    # day's first half; bucket count == distinct days
    assert len(out) == days.nunique()
    assert int(out["doc_count"].sum()) == len(pdf)
    # min_doc_count 0 + extended_bounds fills the gaps (every second 12h
    # bucket is empty) and extends past the data range
    filled = aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
        "aggs": {"h12": {"date_histogram": {
            "field": "ts", "fixed_interval": "12h", "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-01 00:00:00",
                                 "max": "2024-01-30 00:00:00"}}}},
    })["h12"].toPandas()
    assert len(filled) == 59  # 29 days * 2 + the final midnight bucket
    assert int(filled["doc_count"].sum()) == len(pdf)
    assert (filled["doc_count"] == 0).sum() == 59 - days.nunique()
    with pytest.raises(ValueError, match="extended_bounds"):
        aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
            "aggs": {"h": {"date_histogram": {
                "field": "ts", "fixed_interval": "12h",
                "min_doc_count": 0}}}})


def test_numeric_histogram_empty_fill(spark, agg_index):
    pdf = _pdf(spark, agg_index)
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "h": {"histogram": {"field": "n_chars", "interval": 100,
                            "min_doc_count": 0,
                            "extended_bounds": {"min": 0, "max": 1500}}},
    }})["h"].toPandas()
    assert len(out) == 16  # 0..1500 step 100
    got = dict(zip(out["bucket"], out["doc_count"]))
    for b in range(0, 1600, 100):
        assert got[float(b)] == int(((pdf["n_chars"] // 100) * 100 == b).sum())


def test_histogram_offset_grids(spark, agg_index):
    pdf = _pdf(spark, agg_index)
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "h": {"histogram": {"field": "n_chars", "interval": 100,
                            "offset": 50}},
    }})["h"].toPandas()
    want = ((pdf["n_chars"] - 50) // 100 * 100 + 50).value_counts().sort_index()
    assert list(out["bucket"]) == [float(b) for b in want.index]
    assert list(out["doc_count"]) == list(want.values)
    # date offset: +6h shifts the 12h grid
    out2 = aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
        "aggs": {"h": {"date_histogram": {
            "field": "ts", "fixed_interval": "1d", "offset": "+6h"}}},
    })["h"].toPandas()
    # every ts is at midnight -> lands in the PREVIOUS day's 06:00 bucket
    assert all(str(b).endswith("06:00:00") for b in out2["bucket"])
    assert int(out2["doc_count"].sum()) == len(pdf)
    with pytest.raises(ValueError, match="offset"):
        aggregations(spark, agg_index, {"size": 0, "runtime_mappings": RT,
            "aggs": {"h": {"date_histogram": {
                "field": "ts", "fixed_interval": "1d", "offset": "+6x"}}}})


def test_geo_grid_buckets_json(spark, agg_index):
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.aggs import index_docs
    from es_indexer_spark.query.dsl_aggs import with_runtime_fields

    docs = with_runtime_fields(index_docs(spark, agg_index), RT)
    base = {"size": 0, "runtime_mappings": RT}
    got = aggregations(spark, agg_index, {**base, "aggs": {
        "tiles": {"geotile_grid": {"lon_field": "lon", "lat_field": "lat",
                                    "precision": 4}}}})["tiles"]
    want = A.geotile_grid(docs, "lon", "lat", precision=4)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    got2 = aggregations(spark, agg_index, {**base, "aggs": {
        "gh": {"geohash_grid": {"lon_field": "lon", "lat_field": "lat",
                                 "precision": 2}}}})["gh"]
    want2 = A.geohash_grid(docs, "lon", "lat", precision=2)
    assert [tuple(r) for r in got2.collect()] == [tuple(r) for r in want2.collect()]
    got3 = aggregations(spark, agg_index, {**base, "aggs": {
        "rings": {"geo_distance": {
            "lon_field": "lon", "lat_field": "lat",
            "origin": {"lon": 0.0, "lat": 0.0},
            "ranges": [{"to": 5000}, {"from": 5000}]}}}})["rings"]
    want3 = A.geo_distance_agg(docs, 0.0, 0.0, [(None, 5000), (5000, None)],
                                lon_col="lon", lat_col="lat")
    assert [tuple(r) for r in got3.collect()] == [tuple(r) for r in want3.collect()]


def test_source_includes_excludes(spark, agg_index):
    from es_indexer_spark.query.dsl import search

    out = search(spark, agg_index, {
        "query": {"match": {"text": "data"}},
        "size": 5,
        "_source": {"includes": ["lang", "n_*"], "excludes": ["n_chars"]},
    })
    cols = set(out.columns)
    assert "lang" in cols and "n_chars" not in cols
    assert "source" not in cols  # not included
    assert out.count() == 5


def test_post_filter_and_docvalue_fields(spark, agg_index):
    from es_indexer_spark.query.dsl import search

    base = {"query": {"match": {"text": "data"}}, "size": 1000}
    plain = search(spark, agg_index, base)
    pf = search(spark, agg_index, {
        **base,
        "post_filter": {"term": {"lang": "en"}},
        "docvalue_fields": ["lang"],
    })
    rows = pf.collect()
    assert all(r["lang"] == "en" for r in rows) and rows
    # scores untouched: post_filter is filter context
    base_scores = {r["docid"]: r["score"] for r in plain.collect()}
    assert all(abs(r["score"] - base_scores[r["docid"]]) < 1e-9 for r in rows)
    assert len(rows) < len(base_scores)
    # post_filter alone (match_all hits, filtered)
    only = search(spark, agg_index, {
        "post_filter": {"range": {"n_chars": {"gte": 900}}}, "size": 10000,
        "docvalue_fields": ["n_chars"],
    })
    pdf = _pdf(spark, agg_index)
    assert only.count() == int((pdf["n_chars"] >= 900).sum())


def test_terms_min_doc_count(spark, agg_index):
    pdf = _pdf(spark, agg_index)
    vc = pdf["source"].value_counts()
    thresh = int(vc.median())
    out = aggregations(spark, agg_index, {"size": 0, "aggs": {
        "src": {"terms": {"field": "source", "size": 100,
                          "min_doc_count": thresh + 1}}},
    })["src"].toPandas()
    assert set(out["key"]) == set(vc[vc > thresh].index)


def test_script_fields_and_stored_fields(spark, agg_index):
    from es_indexer_spark.query.dsl import search

    out = search(spark, agg_index, {
        "query": {"match": {"text": "data"}},
        "size": 5,
        "stored_fields": ["lang"],
        "script_fields": {"kchars": {"script": {
            "source": "round(cast(n_chars as double) / 1000.0, 3)"}}},
    })
    rows = out.collect()
    assert {"lang", "kchars"} <= set(out.columns) and len(rows) == 5
    # script field computed from a doc column NOT otherwise requested
    full = search(spark, agg_index, {
        "query": {"match": {"text": "data"}}, "size": 5,
        "_source": ["n_chars"],
    }).collect()
    by_id = {r["docid"]: r["n_chars"] for r in full}
    assert all(abs(r["kchars"] - round(by_id[r["docid"]] / 1000.0, 3)) < 1e-9
               for r in rows)
    with pytest.raises(ValueError, match="script.source"):
        search(spark, agg_index, {"query": {"match": {"text": "data"}},
                                   "script_fields": {"x": {}}})


def test_unknown_and_unsupported_body_keys_raise(spark, agg_index):
    from es_indexer_spark.query.dsl import search

    with pytest.raises(ValueError, match="unknown body key"):
        search(spark, agg_index, {"query": {"match_all": {}}, "sizee": 5})
    with pytest.raises(ValueError, match="plan IS the profile"):
        search(spark, agg_index, {"query": {"match_all": {}}, "profile": True})
    with pytest.raises(ValueError, match="terminate_after"):
        search(spark, agg_index,
               {"query": {"match_all": {}}, "terminate_after": 100})
