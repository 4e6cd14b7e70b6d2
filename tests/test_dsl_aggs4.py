"""Round-5 continuation: the last deliberate aggs-body edges, closed.

- a bucket child under a ``terms`` parent (``terms``>``terms`` — ES's
  everyday two-level facet — and ``terms``>``histogram``/
  ``date_histogram``), flattened to one row per (parent, child) bucket;
- ``composite`` with metric sub-aggregations (they ride the same
  partial+final hash agg as the paginated buckets);
- top-level ``top_metrics`` with ``size > 1`` (TakeOrdered) and
  ``geo_bounds`` with ``wrap_longitude`` (the 6-extreme antimeridian pick);
- ``min_doc_count: 0`` empty-bucket spines on OFFSET grids (histogram,
  fixed_interval and calendar date_histogram).

Same contract as test_dsl_aggs3: every result replays against pandas over
the identical match frame or against the already-oracle-checked direct
function — the dispatch layer holds no aggregation logic of its own."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl_aggs import aggregations

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

RT = {
    "ts": {"type": "date",
           "script": "timestamp'2024-01-01' + make_interval(0,0,0,n_chars % 28,0,0,0)"},
    "lon": {"type": "double", "script": "(n_chars % 360) - 180.0"},
    "lat": {"type": "double", "script": "(n_chars % 160) - 80.0"},
}


@pytest.fixture(scope="module")
def agg_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_dsl_aggs4"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


def _pdf(spark, root, runtime=None):
    from es_indexer_spark.query.aggs import index_docs
    from es_indexer_spark.query.dsl_aggs import with_runtime_fields

    docs = index_docs(spark, root)
    if runtime:
        docs = with_runtime_fields(docs, runtime)
    return docs.toPandas()


# ------------------------------------------------- bucket child under terms


def test_terms_under_terms_vs_pandas(spark, agg_index):
    body = {"aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 3},
        "aggs": {
            "chars": {"sum": {"field": "n_chars"}},
            "by_src": {"terms": {"field": "source", "size": 2},
                       "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}},
        },
    }}}
    got = aggregations(spark, agg_index, body)["by_lang"].toPandas()
    assert list(got.columns) == [
        "key", "parent_doc_count", "chars", "child_key", "doc_count",
        "avg_chars",
    ]

    pdf = _pdf(spark, agg_index)
    parents = (
        pdf[pdf.lang.notna()].groupby("lang")
        .agg(parent_doc_count=("docid", "size"), chars=("n_chars", "sum"))
        .reset_index()
        .sort_values(["parent_doc_count", "lang"], ascending=[False, True])
        .head(3)
    )
    rows = []
    for _, p in parents.iterrows():
        sub = pdf[(pdf.lang == p.lang) & pdf.source.notna()]
        kids = (
            sub.groupby("source")
            .agg(doc_count=("docid", "size"), avg_chars=("n_chars", "mean"))
            .reset_index()
            .sort_values(["doc_count", "source"], ascending=[False, True])
            .head(2)
        )
        for _, k in kids.iterrows():
            rows.append((p.lang, p.parent_doc_count, p.chars, k.source,
                         k.doc_count, round(k.avg_chars, 6)))
    want = sorted(rows, key=lambda r: (-r[1], r[0], -r[4], r[3]))
    got_rows = [
        (r.key, r.parent_doc_count, r.chars, r.child_key, r.doc_count,
         round(r.avg_chars, 6))
        for r in got.itertuples()
    ]
    assert got_rows == want


def test_terms_under_terms_respects_parent_order_and_mdc(spark, agg_index):
    body = {"aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 2, "order": {"_key": "asc"}},
        "aggs": {"by_src": {"terms": {"field": "source", "size": 50,
                                      "min_doc_count": 5}}},
    }}}
    got = aggregations(spark, agg_index, body)["by_lang"].toPandas()
    pdf = _pdf(spark, agg_index)
    langs = sorted(pdf.lang.dropna().unique())[:2]
    assert sorted(got.key.unique()) == langs
    assert list(got.key) == sorted(got.key)  # _key asc parent order
    assert (got.doc_count >= 5).all()
    for lang in langs:
        sub = pdf[(pdf.lang == lang) & pdf.source.notna()]
        counts = sub.groupby("source").size()
        want = set(counts[counts >= 5].index)
        assert set(got[got.key == lang].child_key) == want


def test_terms_under_date_histogram_child_vs_pandas(spark, agg_index):
    body = {
        "runtime_mappings": RT,
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 2},
            "aggs": {"weekly": {"date_histogram": {"field": "ts",
                                                   "fixed_interval": "7d"}}},
        }},
    }
    got = aggregations(spark, agg_index, body)["by_lang"].toPandas()
    assert list(got.columns) == ["key", "parent_doc_count", "bucket",
                                 "doc_count"]
    pdf = _pdf(spark, agg_index, runtime=RT)
    top2 = (
        pdf[pdf.lang.notna()].groupby("lang").size()
        .sort_values(ascending=False).index[:2]
    )
    secs = 7 * 86400
    for lang in top2:
        sub = pdf[pdf.lang == lang].copy()
        b = (sub.ts.astype("int64") // 10**9 // secs * secs)
        want = b.value_counts().sort_index()
        g = got[got.key == lang]
        assert list(g.bucket.astype("int64") // 10**9) == list(want.index)
        assert list(g.doc_count) == list(want.values)
    # parent order (count desc) then bucket asc within parent
    assert list(got.key) == sorted(got.key, key=lambda x: list(top2).index(x))


def test_terms_bucket_child_error_paths(spark, agg_index):
    with pytest.raises(ValueError, match="metric sub-aggs only"):
        aggregations(spark, agg_index, {"aggs": {"a": {
            "terms": {"field": "lang"},
            "aggs": {"b": {"terms": {"field": "source"},
                           "aggs": {"c": {"terms": {"field": "lang"}}}}},
        }}})
    with pytest.raises(ValueError, match="min_doc_count: 0 under a terms"):
        aggregations(spark, agg_index, {
            "runtime_mappings": RT,
            "aggs": {"a": {
                "terms": {"field": "lang"},
                "aggs": {"b": {"histogram": {
                    "field": "n_chars", "interval": 100, "min_doc_count": 0,
                    "extended_bounds": {"min": 0, "max": 1000}}}},
            }},
        })
    with pytest.raises(ValueError, match="histogram child under a histogram"):
        aggregations(spark, agg_index, {"aggs": {"a": {
            "histogram": {"field": "n_chars", "interval": 100},
            "aggs": {"b": {"histogram": {"field": "n_chars",
                                         "interval": 500}}},
        }}})


# ------------------------------------------------- composite metric children


def test_composite_with_metric_children(spark, agg_index):
    body = {"aggs": {"pairs": {
        "composite": {
            "size": 6,
            "sources": [{"by_lang": {"terms": {"field": "lang"}}},
                        {"by_src": {"terms": {"field": "source"}}}],
        },
        "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                 "max_chars": {"max": {"field": "n_chars"}}},
    }}}
    got = aggregations(spark, agg_index, body)["pairs"].toPandas()
    assert list(got.columns) == ["lang", "source", "doc_count", "avg_chars",
                                 "max_chars"]
    pdf = _pdf(spark, agg_index)
    want = (
        pdf[pdf.lang.notna() & pdf.source.notna()]
        .groupby(["lang", "source"])
        .agg(doc_count=("docid", "size"), avg_chars=("n_chars", "mean"),
             max_chars=("n_chars", "max"))
        .reset_index()
        .sort_values(["lang", "source"])
        .head(6)
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        (r.lang, r.source, r.doc_count, round(r.avg_chars, 6), r.max_chars)
        for r in want.itertuples(index=False)
    ]


# ------------------------------------- top-level top_metrics / geo_bounds


def test_top_metrics_size_gt1_top_level(spark, agg_index):
    body = {"aggs": {"longest": {"top_metrics": {
        "metrics": [{"field": "n_chars"}, {"field": "lang"}],
        "sort": {"n_chars": "desc"}, "size": 5,
    }}}}
    got = aggregations(spark, agg_index, body)["longest"].toPandas()
    assert list(got.columns) == ["n_chars", "lang"]
    pdf = _pdf(spark, agg_index).sort_values(
        ["n_chars", "docid"], ascending=[False, True]).head(5)
    assert list(got.n_chars) == list(pdf.n_chars)
    assert list(got.lang) == list(pdf.lang)


def test_geo_bounds_wrap_longitude_body(spark, agg_index):
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.aggs import index_docs
    from es_indexer_spark.query.dsl_aggs import with_runtime_fields

    body = {
        "runtime_mappings": RT,
        "aggs": {"box": {"geo_bounds": {
            "lon_field": "lon", "lat_field": "lat", "wrap_longitude": True,
        }}},
    }
    got = aggregations(spark, agg_index, body)["box"].collect()[0]
    docs = with_runtime_fields(index_docs(spark, agg_index), RT)
    want = A.geo_bounds(docs, "lon", "lat", wrap_longitude=True).collect()[0]
    assert (got["box_top"], got["box_bottom"], got["box_left"],
            got["box_right"]) == tuple(want)
    # still raises inside a bucket context, by name
    with pytest.raises(ValueError, match="wrap_longitude rides top-level"):
        aggregations(spark, agg_index, {
            "runtime_mappings": RT,
            "aggs": {"a": {"terms": {"field": "lang"},
                           "aggs": {"b": {"geo_bounds": {
                               "wrap_longitude": True}}}}},
        })


# --------------------------------------------- offset grids, min_doc_count 0


def test_histogram_offset_empty_fill(spark, agg_index):
    body = {"aggs": {"h": {"histogram": {
        "field": "n_chars", "interval": 500, "offset": 130,
        "min_doc_count": 0,
        "extended_bounds": {"min": 0, "max": 4000},
    }}}}
    got = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _pdf(spark, agg_index)
    bucket = (pdf.n_chars - 130) // 500 * 500 + 130
    counts = bucket.value_counts()
    lo = (0 - 130) // 500 * 500 + 130        # -370: grid floor of min bound
    grid = [lo + i * 500 for i in range(int(((4000 - 130) // 500 * 500 + 130 - lo) / 500) + 1)]
    assert list(got.bucket) == sorted(set(grid) | set(counts.index))[:len(got)]
    for b, n in zip(got.bucket, got.doc_count):
        assert n == counts.get(b, 0)
    assert (got.doc_count == 0).any()  # the spine actually fills


def test_date_histogram_fixed_offset_empty_fill(spark, agg_index):
    body = {
        "runtime_mappings": RT,
        "aggs": {"h": {"date_histogram": {
            "field": "ts", "fixed_interval": "7d", "offset": "8h",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2023-12-01", "max": "2024-02-15"},
        }}},
    }
    got = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _pdf(spark, agg_index, runtime=RT)
    secs, off = 7 * 86400, 8 * 3600
    epochs = pdf.ts.astype("int64") // 10**9
    b = (epochs - off) // secs * secs + off
    counts = b.value_counts()
    gb = got.bucket.astype("int64") // 10**9
    assert list(gb) == sorted(gb)
    assert all(int(x - off) % secs == 0 for x in gb)  # shifted grid
    for x, n in zip(gb, got.doc_count):
        assert n == counts.get(x, 0)
    assert (got.doc_count == 0).any()
    # every data bucket inside the bounds appears
    inside = counts[(counts.index >= gb.iloc[0]) & (counts.index <= gb.iloc[-1])]
    assert set(inside.index) <= set(gb)


def test_date_histogram_calendar_offset_empty_fill(spark, agg_index):
    body = {
        "runtime_mappings": RT,
        "aggs": {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "week", "offset": "1d",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2023-12-15", "max": "2024-02-10"},
        }}},
    }
    got = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _pdf(spark, agg_index, runtime=RT)
    off = 86400
    shifted = pd.to_datetime((pdf.ts.astype("int64") // 10**9 - off) * 10**9)
    trunc = shifted.dt.to_period("W-SUN").dt.start_time  # Monday trunc
    b = trunc.astype("int64") // 10**9 + off
    counts = b.value_counts()
    gb = got.bucket.astype("int64") // 10**9
    assert (got.doc_count == 0).any()
    for x, n in zip(gb, got.doc_count):
        assert n == counts.get(x, 0)
    # offset grid: every bucket is a Monday + 1d = Tuesday 00:00 UTC
    assert all(pd.Timestamp(x * 10**9).dayofweek == 1 for x in gb)
