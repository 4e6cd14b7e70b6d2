"""§3.3 `term` exact-keyword query (count + size(1) first-id,
ElasticSearchIndexService.java:54-78), the `_analyze` tokenization service
(IndexerMetadataServiceImpl.java:177-195), ES `terms` facet aggregation, and
ranked `search_after` pagination — as native operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.tombstones import delete_docs
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.lookup import (
    analyze_df,
    facet_counts,
    term_count,
    term_query,
)


@pytest.fixture(scope="module")
def term_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_term"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100, n_ckpt_batches=2,
    )
    return root


def test_term_query_exact_match_ordered(spark, documents, term_index):
    exp = sorted(
        r["doc_id"] for r in documents.filter("lang = 'en'").collect()
    )
    got = [r["docid"] for r in term_query(spark, term_index, "lang", "en").collect()]
    assert got == exp
    # size(1): the reference's first-id probe
    first = term_query(spark, term_index, "lang", "en", size=1).collect()
    assert [r["docid"] for r in first] == exp[:1]


def test_term_count(spark, documents, term_index):
    exp = documents.filter("source = 'src3'").count()
    row = term_count(spark, term_index, "source", "src3").collect()
    assert row[0]["doc_count"] == exp


def test_term_query_no_match(spark, term_index):
    assert term_query(spark, term_index, "lang", "xx").count() == 0
    assert term_count(spark, term_index, "lang", "xx").collect()[0]["doc_count"] == 0


def test_term_query_respects_tombstones(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_term_tomb"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=8, shard_size=100, n_ckpt_batches=2,
    )
    before = [r["docid"] for r in term_query(spark, root, "lang", "en").collect()]
    delete_docs(spark, root, before[:2])
    after = [r["docid"] for r in term_query(spark, root, "lang", "en").collect()]
    assert after == before[2:]
    assert (
        term_count(spark, root, "lang", "en").collect()[0]["doc_count"]
        == len(before) - 2
    )
    # facet buckets shrink with the tombstones too
    facets = {
        r["lang"]: r["doc_count"]
        for r in facet_counts(spark, root, "lang", size=10).collect()
    }
    assert facets["en"] == len(before) - 2
    # a tombstoned doc explains to zero rows (gone from every read surface)
    from es_indexer_spark.query.engine import explain

    assert explain(spark, root, "spark join window", before[0]).collect() == []


def test_facet_counts_terms_agg(spark, documents, term_index):
    exp = sorted(
        (
            (r["lang"], r["count"])
            for r in documents.groupBy("lang").count().collect()
        ),
        key=lambda x: (-x[1], x[0]),
    )
    got = [
        (r["lang"], r["doc_count"])
        for r in facet_counts(spark, term_index, "lang", size=10).collect()
    ]
    assert got == exp[:10]
    # size caps the bucket list
    assert facet_counts(spark, term_index, "source", size=3).count() == 3


def test_ranked_search_after_pages_concatenate(spark, term_index):
    """Three k=10 pages via (score, docid) cursors == one k=30 ranking."""
    full = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, "spark join window", k=30).collect()
    ]
    pages, after = [], None
    for _ in range(3):
        page = [
            (r["docid"], r["score"])
            for r in topk(
                spark, term_index, "spark join window", k=10, after=after
            ).collect()
        ]
        pages.extend(page)
        after = (page[-1][1], page[-1][0])  # ES sort-values order: (score, docid)
    assert [d for d, _ in pages] == [d for d, _ in full]
    assert [s for _, s in pages] == pytest.approx([s for _, s in full])


def test_ranked_search_after_ties_and_end(spark, term_index):
    # tie-heavy query: the == leg of the cursor comparison must hold exactly
    full = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, "the a key", k=40).collect()
    ]
    mid = (full[19][1], full[19][0])
    rest = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, "the a key", k=20, after=mid).collect()
    ]
    assert [d for d, _ in rest] == [d for d, _ in full[20:40]]
    # cursor past the last hit -> empty page
    tail = topk(
        spark, term_index, "zzz dup", k=10,
        after=(-1.0, 1 << 40),
    ).collect()
    assert tail == []


def test_explain_breakdown_sums_to_topk_score(spark, documents, term_index):
    """_explain: per-term rows reproduce tf/df exactly and sum to the ranked
    score bit-identically (same float64 expression as the scorer)."""
    from es_indexer_spark.query.engine import explain

    hits = topk(spark, term_index, "spark join window", k=3).collect()
    top = hits[0]
    rows = explain(spark, term_index, "spark join window", top["docid"]).collect()
    assert sum(r["contribution"] for r in rows) == pytest.approx(
        top["score"], abs=1e-12
    )
    doc = documents.filter(f"doc_id = {top['docid']}").collect()[0]
    toks = tokenize_one(doc["text"], "standard")
    for r in rows:
        assert r["tf"] == toks.count(r["term"])
        assert r["doc_len"] == len(toks)
    # df is the corpus-wide document frequency
    all_toks = {
        d["doc_id"]: set(tokenize_one(d["text"], "standard"))
        for d in documents.collect()
    }
    for r in rows:
        assert r["df"] == sum(1 for s in all_toks.values() if r["term"] in s)
    # absent query -> no rows
    from es_indexer_spark.query.engine import explain as _e

    assert _e(spark, term_index, "zzznope", top["docid"]).collect() == []


def test_analyze_standard_matches_python_chain(spark, documents):
    sample = documents.filter("doc_id < 20")
    got = {}
    for r in analyze_df(sample, "text", "doc_id").collect():
        got.setdefault(r["doc_id"], []).append((r["position"], r["token"]))
    for r in sample.collect():
        exp = list(enumerate(tokenize_one(r["text"], "standard")))
        assert sorted(got.get(r["doc_id"], [])) == exp


def test_analyze_code_tokenizer_chain(spark):
    df = spark.createDataFrame(
        [(1, "parseHttpRequest snake_case_id x9", "java")], "id long, s string, lang string"
    )
    toks = [
        r["token"]
        for r in analyze_df(df, "s", "id", tokenizer="code", lang_col="lang")
        .orderBy("position")
        .collect()
    ]
    assert toks == tokenize_one("parseHttpRequest snake_case_id x9", "code", lang="java")
    assert "parse" in toks and "http" in toks  # camelCase split happened

def test_fuzzy_topk_single_edit(spark, term_index):
    """'strea' expands (within 1 edit, prefix 's') to exactly 'stream': same
    ranking as topk('stream'), scores damped by the boost 1 - 1/6."""
    from es_indexer_spark.query.engine import fuzzy_topk

    got = [
        (r["docid"], r["score"])
        for r in fuzzy_topk(spark, term_index, "strea", k=10).collect()
    ]
    exact = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, "stream", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exact]
    boost = 1.0 - 1.0 / 6.0
    assert [s for _, s in got] == pytest.approx([boost * s for _, s in exact])


def test_fuzzy_topk_exact_and_edges(spark, term_index):
    from es_indexer_spark.query.engine import fuzzy_topk

    got = [
        (r["docid"], r["score"])
        for r in fuzzy_topk(spark, term_index, "stream", fuzziness=0).collect()
    ]
    exact = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, "stream", k=10).collect()
    ]
    assert got == exact
    assert fuzzy_topk(spark, term_index, "zzzz").collect() == []
    with pytest.raises(ValueError, match="single"):
        fuzzy_topk(spark, term_index, "two words")


def test_highlight_fragments_match_python(spark, documents, term_index):
    """Highlight: fragment window + tag injection replicate a python re
    reference exactly; ranking order preserved."""
    import re

    from es_indexer_spark.query.highlight import highlight

    got = highlight(
        spark, term_index, documents, "doc_id", "text", "spark join window", k=5
    ).collect()
    exact = topk(spark, term_index, "spark join window", k=5).collect()
    assert [r["docid"] for r in got] == [r["docid"] for r in exact]
    texts = {
        r["doc_id"]: r["text"]
        for r in documents.filter(
            documents.doc_id.isin([r["docid"] for r in got])
        ).collect()
    }
    pat = re.compile(r"\b(join|spark|window)\b")
    for r in got:
        text = texts[r["docid"]]
        m = pat.search(text)
        start = max(1, (m.start() + 1) - 80)
        frag = text[start - 1 : start - 1 + 160]
        assert r["fragment"] == pat.sub(r"<em>\1</em>", frag)
        assert "<em>" in r["fragment"]


def test_highlight_no_hits_empty(spark, documents, term_index):
    from es_indexer_spark.query.highlight import highlight

    assert (
        highlight(
            spark, term_index, documents, "doc_id", "text", "zzznope", k=5
        ).collect()
        == []
    )


def test_catalog_lifecycle_cat_exists_delete(spark, documents, tmp_path):
    """ES index-lifecycle analogs: exists, _cat/indices, delete-index."""
    import shutil

    from es_indexer_spark.index import catalog
    from es_indexer_spark.index.tombstones import compact_index, delete_docs

    root = str(tmp_path / "idx_cat")
    assert not catalog.index_exists(root)
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=2,
    )
    assert catalog.index_exists(root)
    rows = catalog.cat_indices(root)
    assert len(rows) == 1 and rows[0]["published"] and rows[0]["n_docs"] == 500
    assert rows[0]["bytes"] > 0 and rows[0]["n_tombstone_files"] == 0

    delete_docs(spark, root, [1, 2, 3])
    compact_index(spark, root)
    rows = {r["version"]: r for r in catalog.cat_indices(root)}
    assert len(rows) == 2
    assert rows["v1"]["n_tombstone_files"] > 0 and not rows["v1"]["published"]
    assert rows["v2"]["published"] and rows["v2"]["n_docs"] == 497

    catalog.delete_index(root)
    assert not catalog.index_exists(root)
    assert catalog.cat_indices(root) == []


def test_highlight_case_insensitive_and_ambiguous_src(spark):
    """ES highlighters are analysis-aware: 'Spark' tags for term 'spark';
    a source table carrying its own docid/score columns must not break."""
    from es_indexer_spark.query.highlight import highlight_hits

    src = spark.createDataFrame(
        [(1, 0.5, "Spark joins the Window stage of the plan")],
        "docid long, score double, text string",
    )
    hits = spark.createDataFrame([(1, 2.5)], "docid long, score double")
    rows = highlight_hits(hits, src, "docid", "text", ["spark", "window"]).collect()
    assert len(rows) == 1
    assert rows[0]["score"] == 2.5  # the HIT score, not the src column
    assert "<em>Spark</em>" in rows[0]["fragment"]
    assert "<em>Window</em>" in rows[0]["fragment"]


def test_dict_cache_survives_delete_and_rebuild(spark, documents, tmp_path):
    """delete_index + rebuild reuses version path v1 — the engine's dict
    cache must key on more than the path or it serves the stale dictionary."""
    from es_indexer_spark.index import catalog

    root = str(tmp_path / "idx_rebuild")
    build_index(
        spark, documents.filter("doc_id < 50"), root,
        content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=2,
    )
    first = topk(spark, root, "data", k=5, use_blockmax=False).collect()
    assert first
    catalog.delete_index(root)
    build_index(
        spark, documents.filter("doc_id >= 400"), root,
        content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=2,
    )
    again = topk(spark, root, "data", k=500, use_blockmax=False).collect()
    assert again and all(r["docid"] >= 400 for r in again)


def test_more_like_this_matches_manual_selection(spark, documents, term_index):
    """MLT term selection (tf>=min_tf, df>=min_df, top max_query_terms by
    tf*(ln(n/(df+1))+1)) replicated in Python; ranked result must equal
    topk over the same selected terms."""
    import math

    from es_indexer_spark.query.engine import more_like_this

    rows = documents.collect()
    like = next(r["text"] for r in rows if r["doc_id"] == 42)
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    n = len(toks)
    lt = tokenize_one(like, "standard")
    tf = {t: lt.count(t) for t in set(lt)}
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in tf}
    cands = [t for t in tf if tf[t] >= 2 and dfs[t] >= 5]
    cands.sort(key=lambda t: (-tf[t] * (math.log(n / (dfs[t] + 1)) + 1.0), t))
    sel = sorted(cands[:5])
    assert sel  # the corpus makes a non-trivial selection

    got = [
        (r["docid"], r["score"])
        for r in more_like_this(
            spark, term_index, like, k=10,
            max_query_terms=5, min_term_freq=2, min_doc_freq=5,
        ).collect()
    ]
    exp = [
        (r["docid"], r["score"])
        for r in topk(spark, term_index, " ".join(sel), k=10).collect()
    ]
    assert got == exp


def test_more_like_this_edges(spark, term_index):
    from es_indexer_spark.query.engine import more_like_this

    # empty like-text and nothing-passes-thresholds both return empty
    assert more_like_this(spark, term_index, "").collect() == []
    assert more_like_this(
        spark, term_index, "data stream", min_term_freq=99
    ).collect() == []
    # min_doc_freq filters rare terms: 'dup' (df ~ 2% of docs) must not drive
    # the query when min_doc_freq exceeds its df
    rare_only = more_like_this(
        spark, term_index, "dup dup dup", min_doc_freq=10_000
    )
    assert rare_only.collect() == []


def test_terms_query_multi_value(spark, documents, term_index):
    from es_indexer_spark.query.lookup import term_query, terms_query

    got = [r["docid"] for r in terms_query(spark, term_index, "lang", ["en", "fr"]).collect()]
    exp = sorted(
        r["doc_id"] for r in documents.collect() if r["lang"] in ("en", "fr")
    )
    assert got == exp
    # single-value terms == term
    one = [r["docid"] for r in terms_query(spark, term_index, "lang", ["en"]).collect()]
    assert one == [r["docid"] for r in term_query(spark, term_index, "lang", "en").collect()]
    assert terms_query(spark, term_index, "lang", ["zz"]).collect() == []


def test_exists_query_nulls(spark, documents, tmp_path):
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.lookup import exists_query

    # null out 'source' for every third doc, rebuild, exists must drop them
    docs = documents.limit(60).withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("source")),
    )
    root = str(tmp_path / "existsidx")
    build_index(spark, docs, root, content_col="text", id_col="doc_id",
                meta_cols=("lang", "source"), tokenizer="standard",
                n_buckets=2, shard_size=32, n_ckpt_batches=1)
    got = {r["docid"] for r in exists_query(spark, root, "source").collect()}
    exp = {r["doc_id"] for r in docs.collect() if r["source"] is not None}
    assert got == exp and len(got) < 60


def test_parse_simple_query():
    from es_indexer_spark.query.querystring import parse_simple_query

    c = parse_simple_query('+data -key batch "data stream" other')
    assert c == {
        "must": ["data"], "should": ["batch", "other"],
        "must_not": ["key"], "filter_phrase": "data stream",
    }
    # default_operator=and promotes bare terms to must
    c2 = parse_simple_query("a b", default_operator="and")
    assert c2["must"] == ["a", "b"] and c2["should"] == []
    # empty quoted phrase and dangling +/- are dropped, not crashes
    c3 = parse_simple_query('"" + - x')
    assert c3 == {"must": [], "should": ["x"], "must_not": [], "filter_phrase": None}
    import pytest as _pt

    with _pt.raises(ValueError):
        parse_simple_query("a | b")
    with _pt.raises(ValueError):
        parse_simple_query('"a" "b"')


def test_simple_query_string_equals_bool(spark, documents, term_index):
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.querystring import simple_query_string

    got = [
        (r["docid"], r["score"])
        for r in simple_query_string(spark, term_index, "+data -key batch", k=10).collect()
    ]
    exp = [
        (r["docid"], r["score"])
        for r in bool_query(
            spark, term_index, must=["data"], should=["batch"], must_not=["key"], k=10
        ).collect()
    ]
    assert got == exp


def test_rescore_phrase_semantics(spark, documents, tmp_path_factory):
    """Rescore = query_weight*original + rescore_weight*phrase for docs in
    the window; zero-weight rescore is a no-op; weights scale linearly."""
    from es_indexer_spark.query.engine import rescore_phrase
    from es_indexer_spark.query.phrase import phrase_match

    root = str(tmp_path_factory.mktemp("idx_rescore"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=4, shard_size=100,
        n_ckpt_batches=1, store_positions=True,
    )
    base = {
        r["docid"]: r["score"]
        for r in topk(spark, root, "spark join window", k=30).collect()
    }
    ph = {
        r["docid"]: r["score"]
        for r in phrase_match(spark, root, "data stream", k=None).collect()
    }
    got = {
        r["docid"]: r["score"]
        for r in rescore_phrase(
            spark, root, "spark join window", "data stream",
            k=30, window_size=30, rescore_query_weight=2.0,
        ).collect()
    }
    exp = {d: s + 2.0 * ph.get(d, 0.0) for d, s in base.items()}
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d])
    # zero rescore weight reproduces the original ranking exactly
    noop = [
        (r["docid"], r["score"])
        for r in rescore_phrase(
            spark, root, "spark join window", "data stream",
            k=10, window_size=30, rescore_query_weight=0.0,
        ).collect()
    ]
    orig = [
        (r["docid"], r["score"])
        for r in topk(spark, root, "spark join window", k=30).collect()
    ][:10]
    assert [d for d, _ in noop] == [d for d, _ in orig]
    assert [s for _, s in noop] == pytest.approx([s for _, s in orig])


def test_collapse_topk_best_per_group(spark, documents, term_index):
    from es_indexer_spark.query.engine import collapse_topk

    got = [
        (r["docid"], r["lang"], r["score"])
        for r in collapse_topk(spark, term_index, "spark join window", "lang", k=50).collect()
    ]
    langs = [g[1] for g in got]
    assert len(langs) == len(set(langs))  # one hit per collapse value
    # each winner is the top-ranked doc of its lang in the full ranking
    full = topk(spark, term_index, "spark join window", k=100_000, use_blockmax=False)
    meta = {r["doc_id"]: r["lang"] for r in documents.collect()}
    best: dict[str, int] = {}
    for r in full.collect():  # already (score desc, docid asc)
        l = meta[r["docid"]]
        if l not in best:
            best[l] = r["docid"]
    assert {g[1]: g[0] for g in got} == best


def test_function_score_field_value_factor(spark, documents, term_index):
    import math

    from es_indexer_spark.query.engine import function_score_topk

    nch = {r["doc_id"]: r["n_chars"] for r in documents.collect()}
    base = {
        r["docid"]: r["score"]
        for r in topk(spark, term_index, "spark join window", k=100_000,
                      use_blockmax=False).collect()
    }
    got = [
        (r["docid"], r["score"])
        for r in function_score_topk(
            spark, term_index, "spark join window", "n_chars", k=10
        ).collect()
    ]
    exp = sorted(
        ((d, round(s * math.log(1.0 + nch[d]), 6)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert [s for _, s in got] == pytest.approx([s for _, s in exp])
    # boost_mode=sum and modifier=none compose differently
    got_sum = function_score_topk(
        spark, term_index, "spark join window", "n_chars", k=5,
        modifier="none", boost_mode="sum", factor=0.001,
    ).collect()
    exp_sum = sorted(
        ((d, round(s + 0.001 * nch[d], 6)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [(r["docid"], r["score"]) for r in got_sum] == [
        (d, pytest.approx(s)) for d, s in exp_sum
    ]
    with pytest.raises(ValueError):
        function_score_topk(spark, term_index, "x", "n_chars", modifier="cube")
    with pytest.raises(ValueError):
        function_score_topk(spark, term_index, "x", "n_chars", boost_mode="max")


def test_rank_feature_saturation_and_log(spark, documents, term_index):
    import math

    from es_indexer_spark.query.engine import rank_feature_topk

    nch = {r["doc_id"]: r["n_chars"] for r in documents.collect()}
    base = {
        r["docid"]: r["score"]
        for r in topk(spark, term_index, "spark join window", k=100_000,
                      use_blockmax=False).collect()
    }
    # default pivot = exact geometric mean of the feature over the docs store
    gm = math.exp(sum(math.log(v) for v in nch.values()) / len(nch))
    got = [
        (r["docid"], r["score"])
        for r in rank_feature_topk(
            spark, term_index, "spark join window", "n_chars", k=10, boost=2.0
        ).collect()
    ]
    exp = sorted(
        ((d, round(s + 2.0 * (nch[d] / (nch[d] + gm)), 6)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert [s for _, s in got] == pytest.approx([s for _, s in exp])
    # log function with explicit scaling factor
    got_log = rank_feature_topk(
        spark, term_index, "spark join window", "n_chars", k=5,
        function="log", scaling_factor=3.0,
    ).collect()
    exp_log = sorted(
        ((d, round(s + math.log(3.0 + nch[d]), 6)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [(r["docid"], r["score"]) for r in got_log] == [
        (d, pytest.approx(s)) for d, s in exp_log
    ]
    # sigmoid at exponent 1 with pivot p equals saturation with that pivot
    sat = rank_feature_topk(spark, term_index, "spark join window", "n_chars",
                            k=5, pivot=100.0).collect()
    sig = rank_feature_topk(spark, term_index, "spark join window", "n_chars",
                            k=5, function="sigmoid", pivot=100.0, exponent=1.0).collect()
    assert [(r["docid"], r["score"]) for r in sat] == [
        (r["docid"], r["score"]) for r in sig
    ]
    with pytest.raises(ValueError):
        rank_feature_topk(spark, term_index, "x", "n_chars", function="linear")


def test_distance_feature_decay(spark, documents, term_index):
    from es_indexer_spark.query.engine import distance_feature_topk

    nch = {r["doc_id"]: r["n_chars"] for r in documents.collect()}
    base = {
        r["docid"]: r["score"]
        for r in topk(spark, term_index, "spark join window", k=100_000,
                      use_blockmax=False).collect()
    }
    got = [
        (r["docid"], r["score"])
        for r in distance_feature_topk(
            spark, term_index, "spark join window", "n_chars",
            origin=150.0, pivot=50.0, k=10,
        ).collect()
    ]
    exp = sorted(
        ((d, round(s + 50.0 / (50.0 + abs(nch[d] - 150.0)), 6)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == [(d, pytest.approx(s)) for d, s in exp]
    with pytest.raises(ValueError):
        distance_feature_topk(spark, term_index, "x", "n_chars", 0.0, 0.0)


def test_pinned_query_order_and_exclusion(spark, documents, term_index):
    from es_indexer_spark.query.engine import pinned_topk

    organic = [
        r["docid"]
        for r in topk(spark, term_index, "spark join window", k=10,
                      use_blockmax=False).collect()
    ]
    # pin two real docs (one of them an organic hit) + one nonexistent id
    pins = [organic[3], 0, 10_000_000]
    got = [r["docid"] for r in pinned_topk(
        spark, term_index, pins, "spark join window", k=10).collect()]
    # pins first in request order (nonexistent dropped), then organic minus pins
    assert got[:2] == [organic[3], 0]
    rest = [d for d in organic if d not in pins]
    assert got[2:] == rest[: 10 - 2]
    with pytest.raises(ValueError):
        pinned_topk(spark, term_index, list(range(101)), "x")
