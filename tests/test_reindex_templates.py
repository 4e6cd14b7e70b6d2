"""Round-5g surfaces: ``_reindex`` / ``_update_by_query`` (index/reindex.py),
``_search/template`` (query/templates.py), ``_mget`` (query/lookup.py), and
nested ``inner_hits`` (query/nested.py).

Reference anchors: re-index-all is IndexerController.java:240-257 (the
operator surface these APIs batch); per-UUID overwrite semantics are
IndexerMetadataServiceImpl.java:430-435 (`_id = uuid`).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.reindex import match_docids, reindex, update_by_query
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.lookup import mget, term_count
from es_indexer_spark.query.templates import (
    cat_templates,
    delete_template,
    get_template,
    put_template,
    render_template,
    search_template,
)

QUERY = "spark join window"


def _build(spark, df, root, **kw):
    base = dict(
        content_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True, resume=False,
    )
    base.update(kw)
    build_index(spark, df, root, **base)


@pytest.fixture(scope="module")
def src_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_reix_src"))
    _build(spark, documents, root)
    return root


# ------------------------------------------------------------ templates
def test_render_scalars_and_sections():
    src = (
        '{"query": {"match": {"content": {"query": "{{q}}", '
        '"boost": {{boost}}}}}, "size": {{size}}{{^size}}10{{/size}}}'
    )
    body = render_template(src, {"q": "hello world", "boost": 2.5, "size": 3})
    assert body == {
        "query": {"match": {"content": {"query": "hello world", "boost": 2.5}}},
        "size": 3,
    }
    # falsy section supplies the default
    body = render_template(src.replace("{{size}}{{^size}}10{{/size}}", "{{#size}}{{size}}{{/size}}{{^size}}10{{/size}}"),
                           {"q": "x", "boost": 1})
    assert body["size"] == 10


def test_render_tojson_dotted_and_escaping():
    src = '{"ids": {{#toJson}}filt.values{{/toJson}}, "tag": "{{filt.name}}"}'
    body = render_template(
        src, {"filt": {"values": [1, 2, 3], "name": 'a"b\\c'}}
    )
    assert body == {"ids": [1, 2, 3], "tag": 'a"b\\c'}


def test_render_errors():
    with pytest.raises(ValueError, match="unclosed"):
        render_template('{"a": {{#x}}1}', {"x": 1})
    with pytest.raises(ValueError, match="unbalanced"):
        render_template('{"a": 1{{/x}}}', {})
    with pytest.raises(ValueError, match="not valid JSON"):
        render_template('{"a": {{q}}}', {})  # unknown var renders empty


def test_stored_template_roundtrip_and_search(spark, src_index):
    tid = "by-lang"
    src = (
        '{"query": {"term": {"lang": {"value": "{{lang}}"}}}, '
        '"size": {{size}}{{^size}}10{{/size}}}'
    )
    put_template(src_index, tid, src)
    assert get_template(src_index, tid) == src
    assert cat_templates(src_index) == [tid]
    out = search_template(
        spark, src_index, template_id=tid, params={"lang": "fr", "size": 5}
    ).collect()
    assert len(out) == 5
    assert all(r["lang"] == "fr" for r in out)
    # inline source form, match query — same hits as the direct body
    hits = search_template(
        spark, src_index,
        source='{"query": {"match": {"content": "{{q}}"}}, "size": 4}',
        params={"q": QUERY},
    ).collect()
    from es_indexer_spark.query.dsl import search

    direct = search(
        spark, src_index, {"query": {"match": {"content": QUERY}}, "size": 4}
    ).collect()
    assert [(r["docid"], r["score"]) for r in hits] == [
        (r["docid"], r["score"]) for r in direct
    ]
    assert delete_template(src_index, tid) is True
    assert delete_template(src_index, tid) is False
    assert cat_templates(src_index) == []
    with pytest.raises(FileNotFoundError):
        get_template(src_index, tid)
    with pytest.raises(ValueError, match="exactly one"):
        search_template(spark, src_index, source="{}", template_id="x")


# ------------------------------------------------------------------ mget
def test_mget_order_found_and_deleted(spark, documents, tmp_path_factory):
    from es_indexer_spark.index.tombstones import delete_docs

    root = str(tmp_path_factory.mktemp("idx_mget"))
    _build(spark, documents, root)
    ids = [r["doc_id"] for r in documents.orderBy("doc_id").limit(3).collect()]
    delete_docs(spark, root, [ids[1]])
    req = [ids[2], 10**9, ids[1], ids[0]]  # out of order + missing + deleted
    rows = mget(spark, root, req).collect()
    assert [r["docid"] for r in rows] == req
    assert [r["found"] for r in rows] == [True, False, False, True]
    assert rows[0]["lang"] is not None and rows[1]["lang"] is None


# ------------------------------------------------------------ inner_hits
def test_inner_hits_filter_and_size(spark):
    from es_indexer_spark.query.nested import inner_hits

    df = spark.createDataFrame(
        [
            (1, [("click", 150), ("view", 10), ("click", 300), ("click", 200)]),
            (2, [("click", 50), ("view", 500)]),
            (3, []),
        ],
        "id long, events array<struct<event_type string, value long>>",
    )
    out = inner_hits(
        df, "events",
        lambda e: (e.event_type == "click") & (e.value > 100),
        size=2,
    ).collect()
    got = {r["id"]: (r["inner_hit_count"], [h["value"] for h in r["inner_hits"]])
           for r in out}
    # parent 2 has a click and a big value in DIFFERENT elements -> no match
    assert got == {1: (3, [150, 300])}
    with pytest.raises(ValueError, match="size"):
        inner_hits(df, "events", lambda e: e.value > 0, size=-1)


# ---------------------------------------------------------------- reindex
def test_match_docids_kinds(spark, src_index, documents):
    n_fr = documents.filter(F.col("lang") == "fr").count()
    assert match_docids(spark, src_index, {"match_all": {}}) is None
    assert match_docids(spark, src_index, None) is None
    assert match_docids(
        spark, src_index, {"term": {"lang": {"value": "fr"}}}
    ).count() == n_fr
    # n_chars isn't a stored meta col in this build -> the docs scan fails
    with pytest.raises(Exception):
        match_docids(
            spark, src_index, {"range": {"n_chars": {"gte": 0}}}
        ).count()
    with pytest.raises(ValueError, match="not a bulk-selector"):
        match_docids(spark, src_index, {"knn": {}})


def test_reindex_filtered_matches_fresh_build(
    spark, documents, src_index, tmp_path_factory
):
    dst = str(tmp_path_factory.mktemp("idx_reix_dst"))
    res = reindex(
        spark, documents, src_index, dst,
        query={"term": {"lang": {"value": "en"}}},
        content_col="text", id_col="doc_id", meta_cols=("lang", "source"),
    )
    n_en = documents.filter(F.col("lang") == "en").count()
    assert res["created"] == n_en
    # rank/score-identical to a fresh build over the filtered corpus
    fresh = str(tmp_path_factory.mktemp("idx_reix_fresh"))
    _build(spark, documents.filter(F.col("lang") == "en"), fresh)
    a = [(r["docid"], r["score"]) for r in topk(spark, dst, QUERY, k=10).collect()]
    b = [(r["docid"], r["score"]) for r in topk(spark, fresh, QUERY, k=10).collect()]
    assert a == b
    # shape params inherited from the source index
    st = catalog.read_stats(catalog.resolve(dst))
    assert (st["n_buckets"], st["shard_size"], st["positions"]) == (8, 100, True)


def test_reindex_skips_deleted_and_applies_script(
    spark, documents, tmp_path_factory
):
    from es_indexer_spark.index.tombstones import delete_docs

    src = str(tmp_path_factory.mktemp("idx_reix_src2"))
    _build(spark, documents, src)
    dead = [r["doc_id"] for r in documents.orderBy("doc_id").limit(7).collect()]
    delete_docs(spark, src, dead)
    dst = str(tmp_path_factory.mktemp("idx_reix_dst2"))
    res = reindex(
        spark, documents, src, dst,
        script={"source": "upper(source)"},
        content_col="text", id_col="doc_id", meta_cols=("lang", "source"),
    )
    assert res["created"] == documents.count() - len(dead)
    docs = spark.read.parquet(
        os.path.join(catalog.resolve(dst), "docs")
    )
    assert docs.filter(F.col("docid").isin(dead)).count() == 0
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    assert srcs and all(s == s.upper() for s in srcs)


def test_reindex_query_without_id_col_raises(spark, documents, src_index, tmp_path_factory):
    with pytest.raises(ValueError, match="id_col"):
        reindex(
            spark, documents, src_index,
            str(tmp_path_factory.mktemp("idx_reix_dst3")),
            query={"term": {"lang": {"value": "en"}}},
            content_col="text",
        )


# --------------------------------------------------------- update_by_query
def test_update_by_query_twice_keyed_on_stored_id(
    spark, documents, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("idx_ubq"))
    # store the external id as metadata: identity survives docid remapping
    _build(spark, documents, root, meta_cols=("doc_id", "lang", "source"))
    n_docs = documents.count()
    n_fr = documents.filter(F.col("lang") == "fr").count()

    res = update_by_query(
        spark, documents, root,
        query={"term": {"lang": {"value": "fr"}}},
        script={"lang": "'fra'", "text": "concat(text, ' actualise')"},
        content_col="text", id_col="doc_id",
        meta_cols=("doc_id", "lang", "source"),
    )
    assert res["updated"] == n_fr
    assert term_count(spark, root, "lang", "fra").collect()[0]["doc_count"] == n_fr
    assert term_count(spark, root, "lang", "fr").collect()[0]["doc_count"] == 0
    # the transform reached the postings: the appended token is searchable
    hits = topk(spark, root, "actualise", k=None, use_blockmax=False)
    assert hits.count() == n_fr
    # exactly one LIVE copy per external id
    from es_indexer_spark.index.tombstones import filter_live

    vdir = catalog.resolve(root)
    live = filter_live(
        spark, vdir, spark.read.parquet(os.path.join(vdir, "docs"))
    )
    assert live.count() == n_docs
    assert live.select("doc_id").distinct().count() == n_docs

    # second update over the ALREADY-REPLACED docs: stored-id keying finds them
    res2 = update_by_query(
        spark, documents, root,
        query={"term": {"lang": {"value": "fra"}}},
        script={"lang": "'fr2'"},
        content_col="text", id_col="doc_id",
        meta_cols=("doc_id", "lang", "source"),
    )
    assert res2["updated"] == n_fr
    assert term_count(spark, root, "lang", "fr2").collect()[0]["doc_count"] == n_fr
    vdir = catalog.resolve(root)
    live = filter_live(
        spark, vdir, spark.read.parquet(os.path.join(vdir, "docs"))
    )
    assert live.count() == n_docs
    assert live.select("doc_id").distinct().count() == n_docs


def test_update_by_query_requires_id_col(spark, documents, src_index):
    with pytest.raises(ValueError, match="id_col"):
        update_by_query(
            spark, documents, src_index, script={"lang": "'x'"},
            content_col="text",
        )


def test_msearch_template_batches(spark, src_index):
    from es_indexer_spark.query.dsl import search
    from es_indexer_spark.query.templates import msearch_template, put_template

    put_template(src_index, "m1", '{"query": {"match": {"content": "{{q}}"}}, "size": 3}')
    frames = msearch_template(spark, src_index, [
        {"id": "m1", "params": {"q": QUERY}},
        {"source": '{"query": {"match": {"content": "{{q}}"}}, "size": 2}',
         "params": {"q": "data stream"}},
    ])
    assert len(frames) == 2
    d1 = search(spark, src_index,
                {"query": {"match": {"content": QUERY}}, "size": 3}).collect()
    got1 = frames[0].collect()
    assert [(r["docid"], r["score"]) for r in got1] == \
           [(r["docid"], r["score"]) for r in d1]
    assert frames[1].count() == 2
    with pytest.raises(ValueError, match="exactly one of source/id"):
        msearch_template(spark, src_index, [{"params": {}}])
