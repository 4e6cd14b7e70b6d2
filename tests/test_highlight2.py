"""ES highlight fragment-count options (round-5 continuation):
``number_of_fragments`` (>1 → ``fragments`` array; 0 → whole field),
``no_match_size``, and per-field option merge in the DSL body.

Every multi-fragment result replays against a pure-Python reimplementation
of the same window rule over the collected source text — the column
expressions must hold no logic the replay doesn't."""

from __future__ import annotations

import re

import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl import search
from es_indexer_spark.query.highlight import highlight_hits


@pytest.fixture(scope="module")
def hl_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_hl2"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


def _py_fragments(text, terms, fragment_size, nf, pre="<em>", post="</em>"):
    """Reference replay of the iterated window rule."""
    body = r"\b(" + "|".join(sorted(set(terms))) + r")\b"
    pat = re.compile(body, re.I)
    frags, rem = [], text
    for _ in range(nf):
        m = pat.search(rem)
        if not m:
            break
        start = max(0, m.start() - fragment_size // 2)  # 0-based
        window = rem[start:start + fragment_size]
        frags.append(pat.sub(lambda mm: pre + mm.group(1) + post, window))
        rem = rem[start + fragment_size:]
    return frags


def test_multi_fragments_vs_python(spark, hl_index, documents):
    from es_indexer_spark.query.engine import topk

    hits = topk(spark, hl_index, "data stream", k=8)
    out = highlight_hits(
        hits, documents, "doc_id", "text", ["data", "stream"],
        fragment_size=60, number_of_fragments=3,
    ).collect()
    assert out and all(isinstance(r["fragments"], list) for r in out)
    texts = {r["doc_id"]: r["text"]
             for r in documents.filter(
                 documents.doc_id.isin([r["docid"] for r in out])).collect()}
    for r in out:
        want = _py_fragments(texts[r["docid"]], ["data", "stream"], 60, 3)
        assert r["fragments"] == want
        assert 1 <= len(r["fragments"]) <= 3


def test_zero_fragments_whole_field(spark, hl_index, documents):
    from es_indexer_spark.query.engine import topk

    hits = topk(spark, hl_index, "data", k=3)
    out = highlight_hits(
        hits, documents, "doc_id", "text", ["data"],
        number_of_fragments=0,
    ).collect()
    texts = {r["doc_id"]: r["text"]
             for r in documents.filter(
                 documents.doc_id.isin([r["docid"] for r in out])).collect()}
    pat = re.compile(r"\b(data)\b", re.I)
    for r in out:
        assert r["fragment"] == pat.sub(r"<em>\1</em>", texts[r["docid"]])
        # whole field: length grows by exactly the injected tags
        n = len(pat.findall(texts[r["docid"]]))
        assert len(r["fragment"]) == len(texts[r["docid"]]) + n * len("<em></em>")


def test_no_match_size(spark, documents):
    # hits that do NOT match the highlight terms (a filter/knn leg shape):
    # default yields an untagged head window; no_match_size trims it
    ids = [r["doc_id"] for r in documents.limit(2).collect()]
    hits = documents.sparkSession.createDataFrame(
        [(i, 1.0) for i in ids], "docid long, score double")
    zz = ["zzzznotaterm"]
    got = highlight_hits(hits, documents, "doc_id", "text", zz,
                         no_match_size=30).collect()
    texts = {r["doc_id"]: r["text"] for r in documents.limit(2).collect()}
    for r in got:
        assert r["fragment"] == texts[r["docid"]][:30]
    got_multi = highlight_hits(hits, documents, "doc_id", "text", zz,
                               number_of_fragments=3,
                               no_match_size=25).collect()
    for r in got_multi:
        assert r["fragments"] == [texts[r["docid"]][:25]]
    # no_match_size unset: multi-fragment path compacts to an empty array
    got_empty = highlight_hits(hits, documents, "doc_id", "text", zz,
                               number_of_fragments=2).collect()
    assert all(r["fragments"] == [] for r in got_empty)


def test_dsl_per_field_options(spark, hl_index, documents):
    body = {"query": {"match": {"text": "data stream"}}, "size": 4,
            "highlight": {"fields": {"text": {
                "fragment_size": 60, "number_of_fragments": 2,
                "pre_tags": ["<b>"], "post_tags": ["</b>"]}}}}
    out = search(spark, hl_index, body, src_df=documents).collect()
    assert len(out) == 4
    for r in out:
        assert 1 <= len(r["fragments"]) <= 2
        assert all("<b>" in f for f in r["fragments"])
    with pytest.raises(ValueError, match="exactly one field"):
        search(spark, hl_index, {
            "query": {"match": {"text": "data"}},
            "highlight": {"fields": {"a": {}, "b": {}}},
        }, src_df=documents)
    with pytest.raises(ValueError, match="capped at 10"):
        search(spark, hl_index, {
            "query": {"match": {"text": "data"}},
            "highlight": {"fields": {"text": {"number_of_fragments": 11}}},
        }, src_df=documents)
