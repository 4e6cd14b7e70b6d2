"""Round-5f DSL dispatch completion: the remaining ES query kinds now reachable
from the request-body layer — each dispatch must equal the direct engine call
it lowers to (the layer holds no matching logic of its own), and the
DataFrame-backed kinds (nested / percolate / geo) take their backing through
the named search() parameters.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl import search

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def d2_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_dsl2"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


@pytest.fixture(scope="module")
def d2_multi(spark, documents, tmp_path_factory):
    from es_indexer_spark.query.multifield import build_multi_index

    root = str(tmp_path_factory.mktemp("idx_dsl2_multi"))
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    docs = documents.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))
    build_multi_index(
        spark, docs, root, fields={"title": "title", "text": "text"},
        id_col="doc_id", shard_size=100, n_buckets=8, n_ckpt_batches=2,
    )
    return root


def _rows(df):
    cols = [c for c in ("docid", "doc_id", "query_id", "phrase_tf") if c in df.columns]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _same(a, b):
    ra, rb = _rows(a), _rows(b)
    assert ra == rb and ra


def test_span_or_dispatch(spark, d2_index):
    from es_indexer_spark.query.phrase import span_or

    body = {"query": {"span_or": {"clauses": [
        {"span_term": {"text": "spark"}}, {"span_term": {"text": "flink"}},
    ]}}, "size": 10}
    _same(search(spark, d2_index, body), span_or(spark, d2_index, ["spark", "flink"], k=10))


def test_span_not_dispatch(spark, d2_index):
    from es_indexer_spark.query.phrase import span_not

    body = {"query": {"span_not": {
        "include": {"span_term": {"text": "data"}},
        "exclude": {"span_term": {"text": "stream"}}, "post": 1,
    }}, "size": 10}
    _same(
        search(spark, d2_index, body),
        span_not(spark, d2_index, "data", "stream", post=1, k=10),
    )


def test_span_first_with_near_match(spark, d2_index):
    from es_indexer_spark.query.phrase import span_first

    body = {"query": {"span_first": {
        "match": {"span_near": {"clauses": [
            {"span_term": {"text": "the"}}, {"span_term": {"text": "data"}},
        ], "slop": 2}},
        "end": 10,
    }}, "size": 10}
    _same(
        search(spark, d2_index, body),
        span_first(spark, d2_index, ["the", "data"], 10, slop=2, k=10),
    )


def test_span_near_span_multi_clause(spark, d2_index):
    from es_indexer_spark.query.phrase import span_multi_near

    body = {"query": {"span_near": {"clauses": [
        {"span_term": {"text": "data"}},
        {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
    ], "slop": 1}}, "size": 10}
    _same(
        search(spark, d2_index, body),
        span_multi_near(spark, d2_index, ["data", "s*"], slop=1, k=10),
    )


def test_span_containing_within_dispatch(spark, d2_index):
    from es_indexer_spark.query.intervals import span_containing, span_within

    big = {"span_near": {"clauses": [
        {"span_term": {"text": "the"}}, {"span_term": {"text": "stream"}},
    ], "slop": 3}}
    body_c = {"query": {"span_containing": {
        "big": big, "little": {"span_term": {"text": "data"}}}}, "size": 10}
    _same(
        search(spark, d2_index, body_c),
        span_containing(spark, d2_index, ["the", "stream"], "data", slop=3, k=10),
    )
    body_w = {"query": {"span_within": {
        "little": {"span_term": {"text": "data"}}, "big": big}}, "size": 10}
    _same(
        search(spark, d2_index, body_w),
        span_within(spark, d2_index, "data", ["the", "stream"], slop=3, k=10),
    )


def test_terms_set_dispatch(spark, d2_index):
    from es_indexer_spark.query.compound import terms_set

    body = {"query": {"terms_set": {"text": {
        "terms": ["spark", "join", "window"],
        "minimum_should_match_script": {"source": "2"},
    }}}, "size": 10}
    _same(
        search(spark, d2_index, body),
        terms_set(spark, d2_index, ["spark", "join", "window"],
                  minimum_should_match_expr="2", k=10),
    )


def test_match_bool_prefix_dispatch(spark, d2_index):
    from es_indexer_spark.query.compound import match_bool_prefix

    body = {"query": {"match_bool_prefix": {"text": "data str"}}, "size": 10}
    _same(
        search(spark, d2_index, body),
        match_bool_prefix(spark, d2_index, "data str", k=10),
    )


def test_multi_match_dispatch_types(spark, d2_multi):
    from es_indexer_spark.query.multifield import multi_match

    for mt, tie in (("most_fields", 0.0), ("best_fields", 0.3)):
        body = {"query": {"multi_match": {
            "query": "data stream", "fields": ["title^2", "text"],
            "type": mt, "tie_breaker": tie,
        }}, "size": 10}
        _same(
            search(spark, d2_multi, body),
            multi_match(spark, d2_multi, "data stream",
                        boosts={"title": 2.0, "text": 1.0}, k=10,
                        match_type=mt, tie_breaker=tie),
        )


def test_combined_fields_dispatch(spark, d2_multi):
    from es_indexer_spark.query.multifield import combined_fields

    body = {"query": {"combined_fields": {
        "query": "data stream", "fields": ["title^2", "text"],
    }}, "size": 10}
    _same(
        search(spark, d2_multi, body),
        combined_fields(spark, d2_multi, "data stream",
                        weights={"title": 2.0, "text": 1.0}, k=10),
    )


def test_nested_dispatch_same_object_semantics(spark, d2_index):
    users = spark.createDataFrame([
        Row(user_id=1, evs=[Row(kind="click", v=10.0), Row(kind="view", v=500.0)]),
        Row(user_id=2, evs=[Row(kind="click", v=500.0)]),
        Row(user_id=3, evs=[Row(kind="view", v=1.0)]),
    ])
    body = {"query": {"nested": {"path": "evs", "query": {"bool": {
        "must": [{"term": {"evs.kind": "click"}},
                 {"range": {"evs.v": {"gt": 100}}}],
    }}}}}
    got = search(spark, d2_index, body, nested_df=users)
    # user 1 has a click AND a v>100 in DIFFERENT elements — must not match
    assert [r["user_id"] for r in got.collect()] == [2]


def test_nested_dispatch_requires_df(spark, d2_index):
    with pytest.raises(ValueError, match="nested_df"):
        search(spark, d2_index, {"query": {"nested": {
            "path": "evs", "query": {"term": {"evs.kind": "x"}}}}})


def test_percolate_dispatch_inline_document(spark, d2_index):
    from es_indexer_spark.query.percolate import percolate

    queries = spark.createDataFrame(
        [
            (10, ["alpha", "beta"], None, None, None),
            (11, None, ["gamma", "delta"], None, 1),
            (12, ["beta"], None, ["alpha"], None),
        ],
        "query_id long, must array<string>, should array<string>, "
        "must_not array<string>, minimum_should_match int",
    )
    body = {"query": {"percolate": {
        "field": "text", "document": {"text": "alpha beta gamma"},
    }}}
    got = search(spark, d2_index, body, queries_df=queries)
    assert sorted(r["query_id"] for r in got.collect()) == [10, 11]


def test_geo_bbox_dispatch(spark, tmp_path_factory):
    from es_indexer_spark.ops.geoindex import geo_bbox_query, write_geo_index

    import datetime as dt

    pts = spark.createDataFrame(
        [("c1", dt.datetime(2024, 1, 5), 10.0, 10.0),
         ("c1", dt.datetime(2024, 1, 6), 100.0, 50.0),
         ("c2", dt.datetime(2024, 2, 7), -20.0, -20.0)],
        "collection string, ts timestamp, lon double, lat double",
    )
    path = str(tmp_path_factory.mktemp("geoidx2"))
    write_geo_index(pts, path)
    body = {"query": {"geo_bounding_box": {"pt": {
        "top_left": {"lon": -30.0, "lat": 30.0},
        "bottom_right": {"lon": 30.0, "lat": -30.0},
    }}}, "size": 10}
    got = search(spark, "unused-index-root", body, geo_root=path)
    ref = geo_bbox_query(spark, path, (-30.0, -30.0, 30.0, 30.0))
    assert sorted((r["collection"], r["lon"], r["lat"]) for r in got.collect()) == \
        sorted((r["collection"], r["lon"], r["lat"]) for r in ref.collect())
    assert got.count() == 2


def test_geo_shape_dispatch_envelope(spark, d2_index):
    from es_indexer_spark.ops.geoshape import assemble_shapes

    geoms = spark.createDataFrame(
        [
            (1, 0, "Polygon", 0, 0, 0.0, 0.0), (1, 0, "Polygon", 0, 1, 4.0, 0.0),
            (1, 0, "Polygon", 0, 2, 4.0, 4.0), (1, 0, "Polygon", 0, 3, 0.0, 4.0),
            (1, 0, "Polygon", 0, 4, 0.0, 0.0),
            (2, 0, "Polygon", 0, 0, 50.0, 50.0), (2, 0, "Polygon", 0, 1, 54.0, 50.0),
            (2, 0, "Polygon", 0, 2, 54.0, 54.0), (2, 0, "Polygon", 0, 3, 50.0, 54.0),
            (2, 0, "Polygon", 0, 4, 50.0, 50.0),
        ],
        "doc_id long, geom_idx int, geom_type string, ring_idx int, "
        "pt_idx int, lon double, lat double",
    )
    shapes = assemble_shapes(geoms)
    body = {"query": {"geo_shape": {"geom": {
        "shape": {"type": "envelope", "coordinates": [[-1.0, 10.0], [10.0, -1.0]]},
        "relation": "intersects",
    }}}, "size": 10}
    got = search(spark, d2_index, body, shape_df=shapes)
    assert [r["doc_id"] for r in got.collect()] == [1]


def test_has_child_raises_by_name(spark, d2_index):
    with pytest.raises(ValueError, match="has_child"):
        search(spark, d2_index, {"query": {"has_child": {"type": "x"}}})


def test_sort_over_bool_query(spark, d2_index):
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.engine import topk_sorted

    body = {"query": {"bool": {"must": [{"match": {"text": "data"}}],
                               "filter": [{"range": {"n_chars": {"gte": 200}}}]}},
            "sort": [{"n_chars": {"order": "desc"}}], "size": 6}
    got = search(spark, d2_index, body)
    matches = bool_query(spark, d2_index, must=["data"],
                         filter_range=("n_chars", {"gte": 200}), k=None)
    ref = topk_sorted(spark, d2_index, "", sort=[("n_chars", "desc")], k=6,
                      matches=matches)
    assert [(r["docid"], r["n_chars"]) for r in got.collect()] == \
        [(r["docid"], r["n_chars"]) for r in ref.collect()]
    assert got.count() == 6
    vals = [r["n_chars"] for r in got.collect()]
    assert vals == sorted(vals, reverse=True)


def test_sort_over_term_and_range(spark, d2_index, documents):
    body = {"query": {"range": {"n_chars": {"lt": 400}}},
            "sort": [{"n_chars": {"order": "asc"}}], "size": 5}
    got = [(r["docid"], r["n_chars"]) for r in search(spark, d2_index, body).collect()]
    exp = [
        (r["doc_id"], r["n_chars"])
        for r in documents.filter("n_chars < 400")
        .orderBy("n_chars", "doc_id").limit(5).collect()
    ]
    assert got == exp

    body2 = {"query": {"term": {"text": "spark"}},
             "sort": [{"n_chars": {"order": "asc"}}], "size": 5}
    got2 = [r["docid"] for r in search(spark, d2_index, body2).collect()]
    assert len(got2) == 5


def test_sort_over_phrase(spark, d2_index):
    from es_indexer_spark.query.phrase import phrase_match

    body = {"query": {"match_phrase": {"text": "data stream"}},
            "sort": [{"n_chars": {"order": "asc"}}], "size": 100}
    got = {r["docid"] for r in search(spark, d2_index, body).collect()}
    exp = {r["docid"] for r in phrase_match(spark, d2_index, "data stream", k=None).collect()}
    assert got == exp and got


def test_highlight_over_bool(spark, d2_index, documents):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"term": {"text": "stream"}}],
    }}, "size": 5, "highlight": {"fields": {"text": {}}}}
    got = search(spark, d2_index, body, src_df=documents).collect()
    assert got and all("<em>" in r["fragment"] for r in got)
    # both the must term and the should term get tagged when present
    assert any("<em>stream</em>" in r["fragment"] or "<em>data</em>" in r["fragment"]
               for r in got)


def test_validate_query_api(spark, d2_index):
    from es_indexer_spark.query.dsl import validate_query

    ok = validate_query(spark, d2_index, {"query": {"match": {"text": "data"}}})
    assert ok == {"valid": True, "error": None}
    bad = validate_query(spark, d2_index, {"query": {"frankenquery": {}}})
    assert bad["valid"] is False and "frankenquery" in bad["error"]
    missing = validate_query(spark, d2_index, {"query": {"nested": {
        "path": "evs", "query": {"term": {"evs.k": "x"}}}}})
    assert missing["valid"] is False and "nested_df" in missing["error"]


def test_rescore_body_lowers_to_rescore_phrase(spark, d2_index):
    from es_indexer_spark.query.engine import rescore_phrase

    body = {"query": {"match": {"text": "data stream"}},
            "rescore": {"window_size": 30, "query": {
                "rescore_query": {"match_phrase": {"text": {"query": "data stream", "slop": 1}}},
                "query_weight": 0.7, "rescore_query_weight": 1.2}},
            "size": 8}
    got = [(r["docid"], round(r["score"], 6))
           for r in search(spark, d2_index, body).collect()]
    ref = [(r["docid"], round(r["score"], 6))
           for r in rescore_phrase(spark, d2_index, "data stream", "data stream",
                                   k=8, window_size=30, query_weight=0.7,
                                   rescore_query_weight=1.2, slop=1).collect()]
    assert got == ref and got


def test_rescore_body_unsupported_shape_raises(spark, d2_index):
    # a missing rescore_query still raises by name; non-match MAIN queries
    # are supported since round 5k (composed-sub-query window)
    with pytest.raises(ValueError, match="rescore_query"):
        search(spark, d2_index, {"query": {"match": {"text": "data"}},
                                 "rescore": {"query": {}}})
    with pytest.raises(ValueError, match="match_phrase"):
        search(spark, d2_index, {"query": {"match": {"text": "data"}},
                                 "rescore": {"query": {"rescore_query": {
                                     "term": {"text": "x"}}}}})


def test_msearch_batch_path_rank_identical(spark, d2_index):
    from es_indexer_spark.query.dsl import msearch
    from es_indexer_spark.query.engine import topk

    bodies = [
        {"query": {"match": {"text": "data stream"}}, "size": 5},
        {"query": {"match": {"text": "spark window"}}, "size": 3},
    ]
    outs = msearch(spark, d2_index, bodies)
    assert len(outs) == 2
    for body, out in zip(bodies, outs):
        qtext = body["query"]["match"]["text"]
        ref = topk(spark, d2_index, qtext, k=body["size"], use_blockmax=False)
        assert [(r["docid"], round(r["score"], 6)) for r in out.collect()] == \
            [(r["docid"], round(r["score"], 6)) for r in ref.collect()]


def test_msearch_heterogeneous_fallback(spark, d2_index):
    from es_indexer_spark.query.dsl import msearch

    bodies = [
        {"query": {"match": {"text": "data"}}, "size": 4},
        {"query": {"match_phrase": {"text": "data stream"}}, "size": 4},
    ]
    outs = msearch(spark, d2_index, bodies)
    assert len(outs) == 2
    a = search(spark, d2_index, bodies[0]).collect()
    b = search(spark, d2_index, bodies[1]).collect()
    assert [r["docid"] for r in outs[0].collect()] == [r["docid"] for r in a]
    assert [r["docid"] for r in outs[1].collect()] == [r["docid"] for r in b]


# ---------------------------------------------------------------- round 5g
def _scored(df):
    return [(r["docid"], round(r["score"], 6)) for r in df.collect()]


def test_nested_bool_filter_flattens(spark, d2_index):
    """filter: [{bool: {filter/must/must_not}}] — the ubiquitous client
    wrapper — must be score- and rank-identical to the flat form."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data stream"}}],
        "filter": [{"bool": {
            "filter": [{"term": {"lang": "en"}}],
            "must": [{"range": {"n_chars": {"gte": 200}}}],
            "must_not": [{"match": {"content": "error"}}],
        }}],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data stream"}}],
        "filter": [{"term": {"lang": "en"}},
                   {"range": {"n_chars": {"gte": 200}}}],
        "must_not": [{"match": {"content": "error"}}],
    }}, "size": 10})
    assert _scored(nested) == _scored(flat) and nested.count()


def test_nested_nonscoring_bool_in_must(spark, d2_index):
    """must: [{bool: {filter: [...]}}] scores 0 in ES — identical to the
    parent-filter form."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data stream"}},
                 {"bool": {"filter": [{"term": {"lang": "en"}}]}}],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data stream"}}],
        "filter": [{"term": {"lang": "en"}}],
    }}, "size": 10})
    assert _scored(nested) == _scored(flat) and nested.count()


def test_nested_wrapper_bool_unwraps(spark, d2_index):
    """{bool: {must: [X]}} with nothing else is query-builder noise: X."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "should": [{"bool": {"must": [{"match": {"content": "stream"}}]}},
                   {"match": {"content": "vector"}}],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "should": [{"match": {"content": "stream"}},
                   {"match": {"content": "vector"}}],
    }}, "size": 10})
    assert _scored(nested) == _scored(flat) and nested.count()


def test_nested_must_not_single_clause_unwraps(spark, d2_index):
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "must_not": [{"bool": {"filter": [{"match": {"content": "error"}}]}}],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "must_not": [{"match": {"content": "error"}}],
    }}, "size": 10})
    assert _scored(nested) == _scored(flat) and nested.count()


def test_nested_scoring_bool_composes_msm(spark, d2_index):
    """Shapes that can't flatten exactly now run through the compositional
    evaluator (query/composebool.py). A should group with msm=2 inside a
    must is score- and rank-identical to requiring both clauses flat."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"bool": {
            "should": [{"match": {"content": "data"}},
                       {"match": {"content": "stream"}}],
            "minimum_should_match": 2,
        }}],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}},
                 {"match": {"content": "stream"}}],
    }}, "size": 10})
    assert _scored(nested) == _scored(flat) and nested.count()


def test_nested_bool_de_morgan_must_not(spark, d2_index):
    """must_not over a CONJUNCTION (De Morgan shape): the child bool's
    match set is the exclusion set — base matches minus docs matching both
    conjuncts, scores untouched for survivors."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "must_not": [{"bool": {"filter": [
            {"match": {"content": "error"}},
            {"term": {"lang": "en"}},
        ]}}],
    }}, "size": 1000})
    base = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}]}}, "size": 1000})
    both = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "filter": [{"match": {"content": "error"}},
                   {"term": {"lang": "en"}}]}}, "size": 1000})
    got = dict(_scored(nested))
    want = {d: s for d, s in _scored(base)}
    for d, _s in _scored(both):
        want.pop(d, None)
    assert got == want and got


def test_nested_boosted_bool_in_should(spark, d2_index):
    """A BOOSTED nested bool in should: boost multiplies the subtree sum
    (Lucene BoostQuery). With one inner must clause, the composed result
    equals the flat form with the boost on the clause itself."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "should": [
            {"bool": {"must": [{"match": {"content": "data"}}],
                      "boost": 2.0}},
            {"match": {"content": "batch"}},
        ],
    }}, "size": 10})
    flat = search(spark, d2_index, {"query": {"bool": {
        "should": [{"match": {"content": {"query": "data", "boost": 2.0}}},
                   {"match": {"content": "batch"}}],
    }}, "size": 10})
    assert [(d, round(s, 4)) for d, s in _scored(nested)] == \
           [(d, round(s, 4)) for d, s in _scored(flat)] and nested.count()


def test_nested_should_group_in_filter_composes(spark, d2_index):
    """A should group inside FILTER context is a non-scoring disjunction:
    survivors = docs matching either term, scores = the must clause only."""
    nested = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "filter": [{"bool": {"should": [{"term": {"lang": "en"}},
                                        {"term": {"lang": "fr"}}]}}],
    }}, "size": 1000})
    en = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "filter": [{"term": {"lang": "en"}}]}}, "size": 1000})
    fr = search(spark, d2_index, {"query": {"bool": {
        "must": [{"match": {"content": "data"}}],
        "filter": [{"term": {"lang": "fr"}}]}}, "size": 1000})
    want = dict(_scored(en)); want.update(dict(_scored(fr)))
    assert dict(_scored(nested)) == want and nested.count()


def test_composed_bool_still_raises_on_unsupported(spark, d2_index):
    # a genuinely unsupported leaf inside the composed tree raises by name
    with pytest.raises(ValueError, match="ids|supports"):
        search(spark, d2_index, {"query": {"bool": {
            "must": [{"bool": {"should": [{"match": {"content": "a"}},
                                          {"ids": {"values": [1]}}],
                               "minimum_should_match": 2}}],
        }}, "size": 5})
    # a composed level with ONLY must_not children (pure-negative) raises
    # by name instead of materializing a corpus-sized complement
    with pytest.raises(ValueError, match="positive"):
        search(spark, d2_index, {"query": {"bool": {
            "must_not": [{"bool": {"filter": [
                {"match": {"content": "error"}},
                {"term": {"lang": "en"}},
            ]}}],
        }}, "size": 5})


def test_collapse_section_dispatch(spark, d2_index):
    from es_indexer_spark.query.engine import collapse_topk

    body = {"query": {"match": {"content": "data stream"}},
            "collapse": {"field": "lang"}, "size": 5}
    got = search(spark, d2_index, body)
    want = collapse_topk(spark, d2_index, "data stream", "lang", k=5)
    assert [(r["docid"], r["lang"], round(r["score"], 6)) for r in got.collect()] == \
           [(r["docid"], r["lang"], round(r["score"], 6)) for r in want.collect()]
    # one hit per lang
    langs = [r["lang"] for r in got.collect()]
    assert len(langs) == len(set(langs)) and langs
    # round 5k: non-match main queries collapse too (composed-sub-query
    # seam) — a range query collapses its match set to one winner per lang
    t = search(spark, d2_index, {"query": {"range": {"n_chars": {"gte": 300}}},
                                 "collapse": {"field": "lang"}}).collect()
    tl = [r["lang"] for r in t]
    assert tl and len(tl) == len(set(tl))


def test_suggest_section_dispatch(spark, d2_index):
    from es_indexer_spark.query.dsl import suggest
    from es_indexer_spark.query.suggest import (
        suggest_fuzzy,
        suggest_prefix,
        suggest_terms,
    )

    body = {"suggest": {
        "typo": {"text": "strem", "term": {"field": "content", "size": 3}},
        "comp": {"prefix": "da", "completion": {"size": 4}},
        "comp_fz": {"prefix": "dta", "completion": {
            "size": 3, "fuzzy": {"fuzziness": 1}}},
    }}
    got = suggest(spark, d2_index, body)
    assert set(got) == {"typo", "comp", "comp_fz"}
    assert [r.asDict() for r in got["typo"].collect()] == \
           [r.asDict() for r in suggest_terms(
               spark, d2_index, "strem", size=3).collect()]
    assert [r.asDict() for r in got["comp"].collect()] == \
           [r.asDict() for r in suggest_prefix(spark, d2_index, "da", k=4).collect()]
    assert [r.asDict() for r in got["comp_fz"].collect()] == \
           [r.asDict() for r in suggest_fuzzy(
               spark, d2_index, "dta", fuzziness=1, k=3).collect()]
    assert got["comp"].count() > 0
    # the phrase suggester dispatches since round 5h (see
    # test_suggest_phrase_dsl_dispatch); an unknown suggester kind raises
    with pytest.raises(ValueError, match="term/completion/phrase"):
        suggest(spark, d2_index, {"suggest": {"p": {"text": "x", "frob": {}}}})


def test_validate_query_catches_analysis_errors(spark, d2_index):
    from es_indexer_spark.query.dsl import validate_query

    out = validate_query(spark, d2_index, {"query": {"script": {"script": {
        "source": "no_such_column > 3"}}}})
    assert out["valid"] is False and "no_such_column" in out["error"]
    out = validate_query(spark, d2_index, {"query": {"script": {"script": {
        "source": "n_chars > 3"}}}})
    assert out == {"valid": True, "error": None}


# ------------------------------- round 5h: composed sub-queries in wrappers

def test_wrappers_accept_composed_subqueries(spark, d2_index):
    """dis_max / constant_score / boosting / function_score / script_score /
    pinned take any bool-expressible sub-query through the compositional
    frame seam. A `{bool: {must: [match x]}}` sub-query must equal the
    plain-match text path exactly (same frame, same scores)."""
    wrap = {"bool": {"must": [{"match": {"content": "data"}}]}}
    flat = {"match": {"content": "data"}}

    pairs = [
        ({"dis_max": {"queries": [wrap, {"match": {"content": "batch"}}],
                      "tie_breaker": 0.3}},
         {"dis_max": {"queries": [flat, {"match": {"content": "batch"}}],
                      "tie_breaker": 0.3}}),
        ({"boosting": {"positive": wrap, "negative": flat,
                       "negative_boost": 0.2}},
         {"boosting": {"positive": flat, "negative": flat,
                       "negative_boost": 0.2}}),
        ({"function_score": {"query": wrap,
                             "field_value_factor": {"field": "n_chars"}}},
         {"function_score": {"query": flat,
                             "field_value_factor": {"field": "n_chars"}}}),
        ({"script_score": {"query": wrap,
                           "script": {"source": "_score * 2"}}},
         {"script_score": {"query": flat,
                           "script": {"source": "_score * 2"}}}),
        ({"pinned": {"ids": [7, 3], "organic": wrap}},
         {"pinned": {"ids": [7, 3], "organic": flat}}),
    ]
    for composed, plain in pairs:
        got = _scored(search(spark, d2_index, {"query": composed, "size": 10}))
        want = _scored(search(spark, d2_index, {"query": plain, "size": 10}))
        assert got == want and got, next(iter(composed))


def test_constant_score_bool_filter(spark, d2_index):
    """constant_score over a bool filter: the match set equals the bool's
    own filter-context match set, every score exactly boost."""
    inner = {"bool": {"filter": [{"term": {"lang": "en"}},
                                 {"range": {"n_chars": {"gte": 200}}}]}}
    got = search(spark, d2_index, {"query": {"constant_score": {
        "filter": inner, "boost": 3.0}}, "size": 10000})
    want = search(spark, d2_index, {"query": inner, "size": 10000})
    assert {r["docid"] for r in got.collect()} == \
           {r["docid"] for r in want.collect()}
    assert {round(r["score"], 6) for r in got.collect()} == {3.0}
    assert got.count()


def test_dis_max_phrase_leg_vs_table(spark, d2_index):
    """dis_max with a match_phrase leg: best + tie*(sum-best) over the
    phrase frame and the match frame, replayed in pandas."""
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.phrase import phrase_match

    tie = 0.3
    m = dict(_scored(bool_query(spark, d2_index, should=["customer"], k=None)))
    p = {r["docid"]: round(r["score"], 6)
         for r in phrase_match(spark, d2_index, "data stream", k=None).collect()}
    want = {}
    for d in set(m) | set(p):
        s1, s2 = m.get(d, 0.0), p.get(d, 0.0)
        present = [s for s in (s1, s2) if d in (set(m) if s is s1 else set(p))]
        best = max(m.get(d, float("-inf")), p.get(d, float("-inf")))
        tot = m.get(d, 0.0) + p.get(d, 0.0)
        want[d] = best + tie * (tot - best)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _scored(search(spark, d2_index, {"query": {"dis_max": {
        "queries": [{"match": {"content": "customer"}},
                    {"match_phrase": {"content": "data stream"}}],
        "tie_breaker": tie}}, "size": 10}))
    assert [d for d, _ in got] == [d for d, _ in top]
    for (gd, gs), (wd, ws) in zip(got, top):
        assert gs == pytest.approx(ws, abs=2e-6)


def test_collapse_inner_hits(spark, d2_index):
    """collapse.inner_hits: each top-k group winner expands with up to
    `size` further hits of its group, hit_rank 1 = the winner; the winner
    rows must equal the plain collapse result."""
    from es_indexer_spark.query.dsl import search
    from es_indexer_spark.query.engine import collapse_topk

    body = {"query": {"match": {"text": "data stream"}},
            "collapse": {"field": "lang", "inner_hits": {"size": 2}},
            "size": 4}
    out = search(spark, d2_index, body).collect()
    assert {"docid", "lang", "score", "hit_rank"} <= set(out[0].asDict())
    assert all(1 <= r["hit_rank"] <= 3 for r in out)
    winners = [(r["docid"], r["lang"], r["score"]) for r in out
               if r["hit_rank"] == 1]
    plain = [
        (r["docid"], r["lang"], r["score"])
        for r in collapse_topk(spark, d2_index, "data stream", "lang",
                               k=4).collect()
    ]
    assert winners == plain
    # within each group ranks are contiguous from 1 and scores non-increasing
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["lang"], []).append((r["hit_rank"], r["score"]))
    for rows in by_group.values():
        ranks = [x for x, _ in rows]
        assert ranks == list(range(1, len(rows) + 1))
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_collapse_bool_main_query(spark, d2_index):
    """collapse over a NON-match main query (bool): the full match frame
    feeds the rank window through the composed-sub-query seam."""
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.dsl import search
    from es_indexer_spark.query.engine import collapse_topk

    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"match": {"text": "stream"}}],
    }}, "collapse": {"field": "lang"}, "size": 5}
    got = [(r["docid"], r["lang"], r["score"])
           for r in search(spark, d2_index, body).collect()]
    frame = bool_query(spark, d2_index, must=["data"], should=["stream"],
                       k=None)
    want = [(r["docid"], r["lang"], r["score"])
            for r in collapse_topk(spark, d2_index, frame, "lang",
                                   k=5).collect()]
    assert got == want and got


def test_rescore_bool_main_query(spark, d2_index):
    """rescore over a NON-match main query: the bool frame supplies the
    window through the composed-sub-query seam."""
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.dsl import search
    from es_indexer_spark.query.engine import rescore_phrase

    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"match": {"text": "stream"}}],
    }}, "rescore": {
        "window_size": 20,
        "query": {"rescore_query": {"match_phrase": {"text": "data stream"}},
                  "rescore_query_weight": 2.0},
    }, "size": 8}
    got = [(r["docid"], r["score"])
           for r in search(spark, d2_index, body).collect()]
    frame = bool_query(spark, d2_index, must=["data"], should=["stream"],
                       k=None)
    want = [(r["docid"], r["score"])
            for r in rescore_phrase(spark, d2_index, frame, "data stream",
                                    k=8, window_size=20,
                                    rescore_query_weight=2.0).collect()]
    assert got == want and got


def test_highlight_phrase_prefix_and_multi_kinds(spark, d2_index, documents):
    """highlight collects the query text of match_phrase_prefix (and the
    multi_match shape) — every analyzed term tags."""
    from es_indexer_spark.query.dsl import search

    body = {"query": {"match_phrase_prefix": {"text": "data str"}},
            "size": 4,
            "highlight": {"fragment_size": 80}}
    out = search(spark, d2_index, body, src_df=documents).collect()
    assert out and all("<em>" in r["fragment"] for r in out)


def test_sort_over_wildcard_main_query(spark, d2_index):
    """sort over a previously-rejected main-query kind (wildcard): the
    full match frame feeds the sort selection through the composed-
    sub-query seam."""
    from es_indexer_spark.index import catalog
    from es_indexer_spark.query.dsl import _subquery_scores, search

    qnode = {"wildcard": {"text": {"value": "stre*"}}}
    body = {"query": qnode, "sort": [{"n_chars": "desc"}], "size": 6}
    got = [(r["docid"], r["n_chars"]) for r in
           search(spark, d2_index, body).collect()]
    frame = _subquery_scores(spark, d2_index, qnode, None)
    docs = spark.read.parquet(catalog.resolve(d2_index) + "/docs")
    j = frame.join(docs.select("docid", "n_chars"), "docid")
    want = [(r["docid"], r["n_chars"]) for r in
            j.orderBy(F.desc("n_chars"), F.asc("docid")).limit(6).collect()]
    assert got == want and len(got) == 6
