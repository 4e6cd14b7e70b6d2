"""ES request-body DSL layer — every dispatch must equal the direct engine
call it translates to (the layer holds no matching logic of its own).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl import search

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def dsl_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_dsl"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


def _ids(df):
    col = next(c for c in ("docid", "doc_id", "vec_id") if c in df.columns)
    return [r[col] for r in df.collect()]


def _same(a, b):
    assert _ids(a) == _ids(b) and _ids(a)


def test_match_default_or(spark, dsl_index):
    from es_indexer_spark.query.boolean import bool_query

    _same(
        search(spark, dsl_index, {"query": {"match": {"text": "data stream"}}}),
        bool_query(spark, dsl_index, should=[("data stream", 1.0)], k=10),
    )


def test_match_operator_and_boost(spark, dsl_index):
    from es_indexer_spark.query.boolean import bool_query

    body = {"query": {"match": {"text": {"query": "data stream",
                                         "operator": "and", "boost": 2.0}}},
            "size": 5}
    _same(
        search(spark, dsl_index, body),
        bool_query(spark, dsl_index, must=[("data stream", 2.0)], k=5),
    )


def test_bool_full_shape(spark, dsl_index):
    from es_indexer_spark.query.boolean import bool_query

    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"match": {"text": {"query": "batch", "boost": 2.0}}},
                   {"prefix": {"text": {"value": "stre"}}}],
        "must_not": [{"match": {"text": "key"}}],
        "filter": [{"term": {"lang": "en"}},
                   {"range": {"n_chars": {"gte": 200, "lte": 20000}}},
                   {"exists": {"field": "lang"}},
                   {"match_phrase": {"text": {"query": "data stream", "slop": 1}}}],
    }}}
    _same(
        search(spark, dsl_index, body),
        bool_query(
            spark, dsl_index,
            must=[("data", 1.0)], should=[("batch", 2.0)],
            should_prefix=[("stre", 1.0)], must_not=["key"],
            filter_fields=[("lang", "en")],
            filter_range=[("n_chars", {"gte": 200, "lte": 20000})],
            filter_exists=["lang"],
            filter_phrase="data stream", filter_phrase_slop=1, k=10,
        ),
    )


def test_match_phrase_and_prefix(spark, dsl_index):
    from es_indexer_spark.query.phrase import match_phrase_prefix, phrase_match

    _same(
        search(spark, dsl_index,
               {"query": {"match_phrase": {"text": {"query": "data stream", "slop": 2}}}}),
        phrase_match(spark, dsl_index, "data stream", k=10, slop=2),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"match_phrase_prefix": {"text": "data stre"}}}),
        match_phrase_prefix(spark, dsl_index, "data stre", k=10),
    )


def test_leaf_lookups(spark, dsl_index):
    from es_indexer_spark.query.lookup import range_query, term_query

    _same(
        search(spark, dsl_index, {"query": {"term": {"lang": "de"}}, "size": 500}),
        term_query(spark, dsl_index, "lang", "de", size=500),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"range": {"n_chars": {"gte": 100, "lt": 300}}}, "size": 500}),
        range_query(spark, dsl_index, "n_chars", {"gte": 100, "lt": 300}, size=500),
    )


def test_query_strings(spark, dsl_index):
    from es_indexer_spark.query.classic import query_string
    from es_indexer_spark.query.querystring import simple_query_string

    _same(
        search(spark, dsl_index,
               {"query": {"simple_query_string": {"query": "+data -key batch"}}}),
        simple_query_string(spark, dsl_index, "+data -key batch", k=10),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"query_string": {"query": "data AND stre* lang:en"}}}),
        query_string(spark, dsl_index, "data AND stre* lang:en", k=10),
    )


def test_knn_section_and_hybrid(spark, dsl_index):
    from es_indexer_spark.ops.similarity import knn_hybrid_topk, knn_search

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    body = {"knn": {"query_vector": qvec, "k": 5,
                    "filter": {"range": {"label": {"gte": 2}}}}}
    _same(
        search(spark, dsl_index, body, emb_df=emb),
        knn_search(emb, "vec_id", "embedding", qvec, k=5,
                   filter_expr="label >= 2"),
    )
    hybrid = {"query": {"match": {"text": "data stream"}},
              "knn": {"query_vector": qvec, "k": 5, "boost": 2.0}, "size": 10}
    _same(
        search(spark, dsl_index, hybrid, emb_df=emb),
        knn_hybrid_topk(spark, dsl_index, "data stream", emb, "vec_id",
                        "embedding", qvec, k=10, knn_k=5, knn_boost=2.0),
    )


def test_sort_and_from(spark, dsl_index):
    from es_indexer_spark.query.engine import topk_sorted

    body = {"query": {"match": {"text": "data stream"}},
            "sort": [{"n_chars": {"order": "desc"}}, "_score"],
            "size": 10, "from": 5}
    got = search(spark, dsl_index, body)
    exp = topk_sorted(
        spark, dsl_index, "data stream",
        sort=[("n_chars", "desc"), "_score"], k=15,
    ).offset(5)
    _same(got, exp)


def test_compound_and_feature_queries(spark, dsl_index):
    from es_indexer_spark.query.compound import boosting, constant_score
    from es_indexer_spark.query.engine import function_score_topk, script_score_topk

    _same(
        search(spark, dsl_index,
               {"query": {"constant_score": {"filter": {"match": {"text": "data"}},
                                             "boost": 1.5}, }}),
        constant_score(spark, dsl_index, filter_terms=["data"], boost=1.5, k=10),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"boosting": {"positive": {"match": {"text": "data"}},
                                       "negative": {"match": {"text": "key"}},
                                       "negative_boost": 0.3}}}),
        boosting(spark, dsl_index, positive="data", negative="key",
                 negative_boost=0.3, k=10),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"function_score": {
                   "query": {"match": {"text": "data stream"}},
                   "field_value_factor": {"field": "n_chars", "modifier": "ln1p"}}}}),
        function_score_topk(spark, dsl_index, "data stream", "n_chars", k=10),
    )
    _same(
        search(spark, dsl_index,
               {"query": {"script_score": {
                   "query": {"match": {"text": "data stream"}},
                   "script": {"source": "_score * 2"}}}}),
        script_score_topk(spark, dsl_index, "data stream", "_score * 2", k=10),
    )


def test_match_all_and_min_score(spark, dsl_index, documents):
    n = documents.count()
    assert search(spark, dsl_index, {"query": {"match_all": {}},
                                     "size": 10_000}).count() == n
    scored = search(spark, dsl_index,
                    {"query": {"match": {"text": "data stream"}}, "size": 500})
    floor = scored.collect()[4]["score"]
    kept = search(spark, dsl_index,
                  {"query": {"match": {"text": "data stream"}},
                   "size": 500, "min_score": floor})
    assert 0 < kept.count() < scored.count() or kept.count() == 5


@pytest.mark.parametrize(
    "body",
    [
        {"query": {"frankenquery": {}}},
        # SCORING nested bools compose since round 5h — but an unsupported
        # leaf inside the composed tree still raises by name
        {"query": {"bool": {"must": [{"bool": {
            "should": [{"match": {"content": "a"}},
                       {"more_like_this": {"like": "b"}}],
            "minimum_should_match": 2,
        }}]}}},
        {"query": {"bool": {"must": [{"ids": {"values": [1]}}]}}},
        {"query": {"more_like_this": {"like": [{"_id": 3}]}}},
    ],
)
def test_unsupported_raise_by_name(spark, dsl_index, body):
    with pytest.raises(ValueError):
        search(spark, dsl_index, body)


def test_sparse_vector_dispatch(spark, dsl_index):
    from es_indexer_spark.query.sparsevec import sparse_vector_topk

    body = {"query": {"sparse_vector": {
        "field": "text",
        "query_vector": {"data": 1.5, "stream": 0.7},
    }}, "size": 8}
    _same(
        search(spark, dsl_index, body),
        sparse_vector_topk(spark, dsl_index, {"data": 1.5, "stream": 0.7}, k=8),
    )


def test_text_expansion_raises_by_name(spark, dsl_index):
    with pytest.raises(ValueError, match="sparse_vector.query_vector"):
        search(spark, dsl_index, {"query": {"text_expansion": {
            "text": {"model_id": "elser", "model_text": "q"}}}})


def test_wrapper_and_match_none(spark, dsl_index):
    import base64
    import json

    inner = {"match": {"text": "data stream"}}  # the QUERY node, per ES docs
    wrapped = {"query": {"wrapper": {
        "query": base64.b64encode(json.dumps(inner).encode()).decode()}}}
    _same(search(spark, dsl_index, wrapped),
          search(spark, dsl_index, {"query": inner}))
    assert search(spark, dsl_index, {"query": {"match_none": {}}}).count() == 0


def test_source_fields_retrieval(spark, dsl_index):
    body = {"query": {"match": {"text": "data stream"}}, "size": 5,
            "_source": ["lang", "n_chars"]}
    out = search(spark, dsl_index, body)
    assert set(out.columns) == {"docid", "score", "lang", "n_chars"}
    assert out.count() == 5
    # _source: true -> every stored column
    all_cols = search(spark, dsl_index, {**body, "_source": True}).columns
    assert {"doc_len", "lang", "n_chars", "sha256"} <= set(all_cols)
    # fields form; unknown fields silently absent (ES semantics)
    out2 = search(spark, dsl_index, {
        "query": {"match": {"text": "data"}}, "size": 3,
        "fields": ["lang", {"field": "nope"}]})
    assert set(out2.columns) == {"docid", "score", "lang"}


def test_highlight_section(spark, dsl_index, documents):
    body = {"query": {"match": {"text": "data stream"}}, "size": 5,
            "highlight": {"fields": {"text": {}}, "fragment_size": 80,
                          "pre_tags": ["<b>"], "post_tags": ["</b>"]}}
    out = search(spark, dsl_index, body, src_df=documents)
    rows = out.collect()
    assert len(rows) == 5 and all("<b>" in r["fragment"] for r in rows)
    # parity with the direct engine call
    from es_indexer_spark.query.highlight import highlight

    want = highlight(spark, dsl_index, documents, "doc_id", "text",
                     "data stream", k=5, fragment_size=80,
                     pre_tag="<b>", post_tag="</b>").collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in want]
    with pytest.raises(ValueError, match="needs src_df"):
        search(spark, dsl_index, body)


def test_terms_lookup(spark, dsl_index):
    from es_indexer_spark.query.lookup import doc_lookup, terms_query

    lang42 = doc_lookup(spark, dsl_index, [42]).collect()[0]["lang"]
    _same(
        search(spark, dsl_index, {
            "query": {"terms": {"lang": {"id": 42, "path": "lang"}}},
            "size": 500}),
        terms_query(spark, dsl_index, "lang", [lang42], size=500),
    )
    with pytest.raises(ValueError, match="not found"):
        search(spark, dsl_index, {
            "query": {"terms": {"lang": {"id": 10**9}}}})
