"""ES request-body ``aggs`` section — translation-only layer over the docs
store: every compiled aggregation must equal a pandas replay over the same
match set (and the match set must equal the direct engine call)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl_aggs import aggregations, match_docids

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def agg_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_dsl_aggs"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


def _match_pdf(spark, root, qnode) -> pd.DataFrame:
    """The docs-store rows of the query's full match set, as pandas."""
    from es_indexer_spark.query.aggs import index_docs

    docs = index_docs(spark, root)
    ms = match_docids(spark, root, qnode)
    if ms is not None:
        docs = docs.join(ms, "docid", "left_semi")
    return docs.toPandas()


def test_match_set_is_full_not_topk(spark, agg_index):
    """Aggs run over EVERY match (ES: aggs ignore size) — the match set for
    a one-term match equals the k=None bool disjunction, not the size page."""
    from es_indexer_spark.query.boolean import bool_query

    got = sorted(
        r.docid for r in
        match_docids(spark, agg_index, {"match": {"text": "data"}}).collect()
    )
    want = sorted(
        r.docid for r in
        bool_query(spark, agg_index, should=["data"], k=None).collect()
    )
    assert got == want and len(got) > 10


def test_terms_with_metric_subaggs(spark, agg_index):
    body = {
        "query": {"match": {"text": "data"}},
        "size": 0,
        "aggs": {"langs": {
            "terms": {"field": "lang", "size": 10},
            "aggs": {
                "avg_len": {"avg": {"field": "n_chars"}},
                "max_len": {"max": {"field": "n_chars"}},
            },
        }},
    }
    out = aggregations(spark, agg_index, body)["langs"].toPandas()
    pdf = _match_pdf(spark, agg_index, {"match": {"text": "data"}})
    want = (
        pdf.groupby("lang")
        .agg(doc_count=("docid", "size"), avg_len=("n_chars", "mean"),
             max_len=("n_chars", "max"))
        .reset_index()
        .sort_values(["doc_count", "lang"], ascending=[False, True])
        .head(10)
    )
    assert list(out["key"]) == list(want["lang"])
    assert list(out["doc_count"]) == list(want["doc_count"])
    assert [round(v, 6) for v in want["avg_len"]] == pytest.approx(
        list(out["avg_len"]))
    assert list(out["max_len"]) == list(want["max_len"])


def test_range_buckets_overlap_and_metrics(spark, agg_index):
    body = {
        "query": {"term": {"lang": "en"}},
        "aggs": {"len": {
            "range": {"field": "n_chars", "ranges": [
                {"to": 200}, {"from": 150, "to": 400}, {"from": 300},
            ]},
            "aggs": {"avg_len": {"avg": {"field": "n_chars"}}},
        }},
    }
    out = aggregations(spark, agg_index, body)["len"].toPandas()
    pdf = _match_pdf(spark, agg_index, {"term": {"lang": "en"}})
    assert list(out["key"]) == ["*-200", "150-400", "300-*"]
    bounds = [(None, 200), (150, 400), (300, None)]
    for i, (lo, hi) in enumerate(bounds):
        m = pd.Series(True, index=pdf.index)
        if lo is not None:
            m &= pdf["n_chars"] >= lo
        if hi is not None:
            m &= pdf["n_chars"] < hi
        assert out["doc_count"][i] == int(m.sum())
        if m.sum() == 0:  # empty bucket: ES reports a null metric
            assert pd.isna(out["avg_len"][i])
        else:
            assert out["avg_len"][i] == pytest.approx(
                round(pdf.loc[m, "n_chars"].mean(), 6))
    # overlap: totals exceed the match set (union-of-filters, not partition)
    assert out["doc_count"].sum() > len(pdf)


def test_filters_buckets(spark, agg_index):
    body = {"aggs": {"f": {
        "filters": {"filters": {
            "en": {"term": {"lang": "en"}},
            "big": {"range": {"n_chars": {"gte": 400}}},
        }},
        "aggs": {"n": {"value_count": {"field": "n_chars"}}},
    }}}
    out = aggregations(spark, agg_index, body)["f"].toPandas()
    pdf = _match_pdf(spark, agg_index, None)
    assert list(out["key"]) == ["en", "big"]
    assert out["doc_count"][0] == int((pdf["lang"] == "en").sum())
    assert out["doc_count"][1] == int((pdf["n_chars"] >= 400).sum())
    assert list(out["n"]) == list(out["doc_count"])  # n_chars never null


def test_histogram_pipeline_chain(spark, agg_index):
    body = {"aggs": {"h": {
        "histogram": {"field": "n_chars", "interval": 100},
        "aggs": {
            "avg_len": {"avg": {"field": "n_chars"}},
            "d": {"derivative": {"buckets_path": "_count"}},
            "cs": {"cumulative_sum": {"buckets_path": "_count"}},
            "ratio": {"bucket_script": {
                "buckets_path": {"c": "_count", "t": "cs"},
                "script": "params.c / params.t",
            }},
        },
    }}}
    out = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _match_pdf(spark, agg_index, None)
    grp = (pdf["n_chars"] // 100 * 100).value_counts().sort_index()
    assert list(out["bucket"]) == [float(k) for k in grp.index]
    assert list(out["doc_count"]) == list(grp.values)
    # ES head semantics: first derivative NULL, cumsum = running total
    assert pd.isna(out["d"].iloc[0])
    assert list(out["d"].iloc[1:]) == list(
        grp.values[1:].astype(float) - grp.values[:-1].astype(float))
    assert list(out["cs"]) == list(grp.values.cumsum())
    assert out["ratio"].iloc[0] == pytest.approx(1.0)


def test_bucket_selector_and_sort(spark, agg_index):
    body = {"aggs": {"h": {
        "histogram": {"field": "n_chars", "interval": 50},
        "aggs": {
            "keep": {"bucket_selector": {
                "buckets_path": {"c": "_count"}, "script": "params.c >= 5"}},
            "top": {"bucket_sort": {
                "sort": [{"doc_count": {"order": "desc"}}], "size": 3}},
        },
    }}}
    out = aggregations(spark, agg_index, body)["h"].toPandas()
    assert len(out) <= 3
    assert (out["doc_count"] >= 5).all()
    assert list(out["doc_count"]) == sorted(out["doc_count"], reverse=True)


def test_nested_terms_under_histogram(spark, agg_index):
    body = {"aggs": {"h": {
        "histogram": {"field": "n_chars", "interval": 200},
        "aggs": {"langs": {"terms": {"field": "lang", "size": 2}}},
    }}}
    out = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _match_pdf(spark, agg_index, None)
    pdf = pdf.assign(bucket=(pdf["n_chars"] // 200 * 200).astype(float))
    for b, grp in pdf.groupby("bucket"):
        want = (
            grp.groupby("lang").size().reset_index(name="n")
            .sort_values(["n", "lang"], ascending=[False, True]).head(2)
        )
        got = out[out["bucket"] == b]
        assert list(got["key"]) == list(want["lang"])
        assert list(got["doc_count"]) == list(want["n"])


def test_global_metric_families(spark, agg_index):
    body = {
        "query": {"range": {"n_chars": {"gte": 300}}},
        "aggs": {
            "st": {"stats": {"field": "n_chars"}},
            "card": {"cardinality": {"field": "lang"}},
            "pct": {"percentiles": {"field": "n_chars", "percents": [50, 95]}},
        },
    }
    res = aggregations(spark, agg_index, body, exact=True)
    pdf = _match_pdf(spark, agg_index, {"range": {"n_chars": {"gte": 300}}})
    st = res["st"].collect()[0]
    assert st["st_count"] == len(pdf)
    assert st["st_min"] == pdf["n_chars"].min()
    assert st["st_max"] == pdf["n_chars"].max()
    assert st["st_avg"] == pytest.approx(round(pdf["n_chars"].mean(), 6))
    assert res["card"].collect()[0]["card"] == pdf["lang"].nunique()
    pct = res["pct"].collect()[0]
    assert pct["pct_p50"] == pytest.approx(
        pdf["n_chars"].quantile(0.5, interpolation="linear"))
    assert pct["pct_p95"] == pytest.approx(
        pdf["n_chars"].quantile(0.95, interpolation="linear"), rel=1e-6)


def test_missing_agg(spark, agg_index):
    out = aggregations(
        spark, agg_index, {"aggs": {"m": {"missing": {"field": "lang"}}}}
    )["m"].collect()[0]
    pdf = _match_pdf(spark, agg_index, None)
    assert out["doc_count"] == int(pdf["lang"].isna().sum())


def test_unsupported_shapes_raise(spark, agg_index):
    with pytest.raises(ValueError, match="pipeline aggregation"):
        aggregations(spark, agg_index, {"aggs": {
            "d": {"derivative": {"buckets_path": "_count"}}}})
    with pytest.raises(ValueError, match="unsupported aggregation family"):
        aggregations(spark, agg_index, {"aggs": {
            "x": {"geo_line": {"field": "p"}}}})
    with pytest.raises(ValueError, match="no aggs section"):
        aggregations(spark, agg_index, {"query": {"match_all": {}}})
    with pytest.raises(ValueError, match="histogram/date_histogram parent"):
        aggregations(spark, agg_index, {"aggs": {"t": {
            "terms": {"field": "lang"},
            "aggs": {"d": {"derivative": {"buckets_path": "_count"}}}}}})


def test_runtime_field_agg_and_query(spark, agg_index):
    """ES runtime_mappings: a computed keyword field buckets a terms agg and
    serves a term query — all query-time, no reindex."""
    body = {
        "runtime_mappings": {"len_class": {
            "type": "keyword",
            "script": {"source":
                       "CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END"},
        }},
        "query": {"term": {"len_class": "long"}},
        "aggs": {
            "langs": {"terms": {"field": "lang", "size": 10}},
            "st": {"stats": {"field": "n_chars"}},
        },
    }
    res = aggregations(spark, agg_index, body)
    pdf = _match_pdf(spark, agg_index, None)
    pdf = pdf[pdf["n_chars"] >= 300]
    out = res["langs"].toPandas()
    want = (
        pdf.groupby("lang").size().reset_index(name="n")
        .sort_values(["n", "lang"], ascending=[False, True])
    )
    assert list(out["key"]) == list(want["lang"])
    assert list(out["doc_count"]) == list(want["n"])
    st = res["st"].collect()[0]
    assert st["st_count"] == len(pdf) and st["st_min"] >= 300


def test_runtime_numeric_histogram(spark, agg_index):
    body = {
        "runtime_mappings": {"mod": {
            "type": "long", "script": "n_chars % 100"}},
        "aggs": {"h": {"histogram": {"field": "mod", "interval": 25}}},
    }
    out = aggregations(spark, agg_index, body)["h"].toPandas()
    pdf = _match_pdf(spark, agg_index, None)
    grp = ((pdf["n_chars"] % 100) // 25 * 25).value_counts().sort_index()
    assert list(out["bucket"]) == [float(k) for k in grp.index]
    assert list(out["doc_count"]) == list(grp.values)


def test_runtime_field_errors(spark, agg_index):
    with pytest.raises(ValueError, match="needs a type"):
        aggregations(spark, agg_index, {
            "runtime_mappings": {"x": {"script": "1"}},
            "aggs": {"m": {"missing": {"field": "lang"}}}})
    with pytest.raises(ValueError, match="not supported"):
        aggregations(spark, agg_index, {
            "runtime_mappings": {"x": {"type": "geo_point", "script": "1"}},
            "aggs": {"m": {"missing": {"field": "lang"}}}})
    with pytest.raises(ValueError, match="script.source"):
        aggregations(spark, agg_index, {
            "runtime_mappings": {"x": {"type": "long"}},
            "aggs": {"m": {"missing": {"field": "lang"}}}})


def test_count_query_full_match_set(spark, agg_index):
    from es_indexer_spark.query.dsl_aggs import count_query

    got = count_query(
        spark, agg_index, {"query": {"match": {"text": "data"}}}
    ).collect()[0]["count"]
    assert got == len(_match_pdf(spark, agg_index, {"match": {"text": "data"}}))
    # match_all / no body
    assert count_query(spark, agg_index).collect()[0]["count"] == len(
        _match_pdf(spark, agg_index, None))
    # runtime predicate path
    body = {
        "runtime_mappings": {"big": {
            "type": "boolean", "script": "n_chars >= 300"}},
        "query": {"term": {"big": True}},
    }
    pdf = _match_pdf(spark, agg_index, None)
    assert count_query(spark, agg_index, body).collect()[0]["count"] == int(
        (pdf["n_chars"] >= 300).sum())


def test_field_caps_surface(spark, agg_index):
    from es_indexer_spark.query.dsl_aggs import field_caps

    rows = {r["field"]: r for r in field_caps(spark, agg_index).collect()}
    assert rows["content"]["type"] == "text" and not rows["content"]["aggregatable"]
    assert rows["lang"]["type"] == "keyword" and rows["lang"]["aggregatable"]
    assert rows["n_chars"]["type"] == "long"
    assert "docid" not in rows and "sha256" not in rows
