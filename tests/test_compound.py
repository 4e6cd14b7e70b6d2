"""ES compound queries (query/compound.py: dis_max / constant_score /
boosting), the regexp query, and the rare_terms / missing aggregations,
against an independent Python brute-force reference.

These close out the ES query-DSL compound family the reference's read
surface inherits (SURVEY.md §3.3; the DSL enters at
geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120). Lucene semantics
verified here:

- dis_max: score = best sub-score + tie_breaker * (sum - best)
  (DisjunctionMaxQuery); tie_breaker=0 degenerates to pure max.
- constant_score: every filter match scores exactly ``boost``.
- boosting: negative matches are demoted (score * negative_boost), never
  excluded — the defining difference from must_not.
- regexp: Lucene RegExp syntax, implicitly anchored, top-``max_expansions``
  by df, constant-score rewrite.
"""

from __future__ import annotations

import math
import re

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.compound import boosting, constant_score, dis_max
from es_indexer_spark.query.suggest import lucene_regexp_to_java, regexp_query

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def cidx(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_compound"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    return root, toks


def _clause_scores(toks: dict, query: str) -> dict:
    """Brute BM25 OR-match scores for one analyzed clause (the pure-should
    single-clause bool the engine scores), doc -> sum of per-term factors."""
    terms = sorted(set(tokenize_one(query, "standard")))
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for doc, t in toks.items():
        dl = float(len(t))
        s = 0.0
        for term in terms:
            tf = float(t.count(term))
            if tf:
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        if s > 0:
            out[doc] = s
    return out


def _topk(scored: dict, k: int) -> list:
    return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


QUERIES = ["data stream", "batch window", "slow scan merge"]


def test_dis_max_parity(spark, cidx):
    root, toks = cidx
    got = [
        (r["docid"], r["score"])
        for r in dis_max(spark, root, QUERIES, tie_breaker=0.35, k=12).collect()
    ]
    clause = [_clause_scores(toks, q) for q in QUERIES]
    brute = {}
    for doc in set().union(*clause):
        ss = [c.get(doc, 0.0) for c in clause if doc in c]
        brute[doc] = max(ss) + 0.35 * (sum(ss) - max(ss))
    want = _topk(brute, 12)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_dis_max_tie_zero_is_pure_max(spark, cidx):
    root, toks = cidx
    got = {r["docid"]: r["score"] for r in dis_max(spark, root, QUERIES, tie_breaker=0.0, k=8).collect()}
    clause = [_clause_scores(toks, q) for q in QUERIES]
    for doc, s in got.items():
        assert s == pytest.approx(max(c.get(doc, 0.0) for c in clause), rel=1e-9)


def test_dis_max_empty_queries(spark, cidx):
    root, _ = cidx
    assert dis_max(spark, root, [], k=5).count() == 0


def test_constant_score(spark, cidx):
    root, toks = cidx
    got = [(r["docid"], r["score"]) for r in constant_score(
        spark, root, filter_terms=["dup"], boost=3.25, k=None).collect()]
    want = sorted(d for d, t in toks.items() if "dup" in t)
    assert sorted(d for d, _ in got) == want
    assert all(s == 3.25 for _, s in got)


def test_constant_score_k_docid_order(spark, cidx):
    root, toks = cidx
    got = [r["docid"] for r in constant_score(
        spark, root, filter_terms=["data"], boost=1.0, k=7).collect()]
    want = sorted(d for d, t in toks.items() if "data" in t)[:7]
    assert got == want


def test_boosting_demotes_never_drops(spark, cidx):
    root, toks = cidx
    nb = 0.4
    got = {r["docid"]: r["score"] for r in boosting(
        spark, root, positive="data stream", negative="slow",
        negative_boost=nb, k=None).collect()}
    pos = _clause_scores(toks, "data stream")
    neg = set(_clause_scores(toks, "slow"))
    # every positive match present — including the demoted ones
    assert set(got) == set(pos)
    demoted = [d for d in got if d in neg]
    assert demoted, "fixture must exercise the demotion branch"
    for d, s in got.items():
        want = pos[d] * nb if d in neg else pos[d]
        assert s == pytest.approx(want, rel=1e-9)


def test_boosting_topk_order(spark, cidx):
    root, toks = cidx
    got = [r["docid"] for r in boosting(
        spark, root, positive="data stream", negative="slow",
        negative_boost=0.4, k=10).collect()]
    pos = _clause_scores(toks, "data stream")
    neg = set(_clause_scores(toks, "slow"))
    brute = {d: (s * 0.4 if d in neg else s) for d, s in pos.items()}
    assert got == [d for d, _ in _topk(brute, 10)]


# ---- Lucene RegExp translation --------------------------------------------

def test_regexp_translation_passthrough():
    assert lucene_regexp_to_java("s[pt].*") == "^s[pt].*$"
    assert lucene_regexp_to_java("a{2,3}b?") == "^a{2,3}b?$"
    assert lucene_regexp_to_java("foo|bar") == "^foo|bar$"


def test_regexp_translation_anystring():
    assert lucene_regexp_to_java("a@b") == "^a.*b$"


def test_regexp_translation_escapes():
    assert lucene_regexp_to_java(r"a\.b") == r"^a\.b$"
    # escaped Lucene operators are literals, not errors
    assert lucene_regexp_to_java(r"a\~b") == r"^a\~b$"


@pytest.mark.parametrize("bad", ["a~b", "a&b", "<1-9>", "a#", "trail\\"])
def test_regexp_translation_unsupported_raise(bad):
    with pytest.raises(ValueError):
        lucene_regexp_to_java(bad)


def test_regexp_query_parity(spark, cidx):
    root, toks = cidx
    got = sorted(r["docid"] for r in regexp_query(spark, root, "s[pt].*", k=10**6).collect())
    rx = re.compile(r"^s[pt].*$")
    want = sorted(d for d, t in toks.items() if any(rx.match(x) for x in t))
    assert got == want


def test_regexp_query_max_expansions_highest_df(spark, cidx):
    root, toks = cidx
    # cap at 1 expansion: only the highest-df matching term survives
    dfs = {}
    rx = re.compile(r"^s.*$")
    for t in set().union(*[set(v) for v in toks.values()]):
        if rx.match(t):
            dfs[t] = sum(1 for v in toks.values() if t in v)
    # deterministic: ties broken by term asc in the engine's orderBy
    top_df = max(dfs.values())
    best = min(t for t, d in dfs.items() if d == top_df)
    got = sorted(r["docid"] for r in regexp_query(
        spark, root, "s.*", k=10**6, max_expansions=1).collect())
    want = sorted(d for d, t in toks.items() if best in t)
    assert got == want


# ---- rare_terms / missing aggregations -------------------------------------

def test_rare_terms_parity(spark, cidx):
    from es_indexer_spark.query.aggs import rare_terms

    root, toks = cidx
    dfs = {}
    for t in set().union(*[set(v) for v in toks.values()]):
        dfs[t] = sum(1 for v in toks.values() if t in v)
    cut = sorted(dfs.values())[len(dfs) // 2]  # interior threshold
    got = [(r["term"], r["doc_count"]) for r in rare_terms(
        spark, root, max_doc_count=cut).collect()]
    want = sorted(((t, d) for t, d in dfs.items() if d <= cut),
                  key=lambda kv: (kv[1], kv[0]))
    assert got == want


def test_missing_agg(spark):
    from es_indexer_spark.query.aggs import missing_agg

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, v string")
    assert missing_agg(df, "v").collect()[0]["doc_count"] == 2


# ---- terms_set / match_bool_prefix -----------------------------------------

@pytest.fixture(scope="module")
def nchars(documents):
    return {r["doc_id"]: r["n_chars"]
            for r in documents.select("doc_id", "n_chars").collect()}


def test_terms_set_per_doc_threshold(spark, cidx, nchars):
    from es_indexer_spark.query.compound import terms_set

    root, toks = cidx
    terms = ["data", "stream", "batch"]
    got = {r["docid"]: r["score"] for r in terms_set(
        spark, root, terms,
        minimum_should_match_expr="CASE WHEN n_chars >= 300 THEN 3 ELSE 2 END",
        k=None).collect()}
    scores = _clause_scores(toks, " ".join(terms))
    brute = {}
    for d, t in toks.items():
        matched = sum(1 for x in terms if x in t)
        req = 3 if nchars[d] >= 300 else 2
        if matched >= req:
            brute[d] = scores[d]
    assert set(got) == set(brute)
    # both threshold branches must be exercised by the fixture
    assert {3 if nchars[d] >= 300 else 2 for d in brute} == {2, 3}
    for d, s in got.items():
        assert s == pytest.approx(brute[d], rel=1e-9)


def test_terms_set_unclamped_impossible_threshold(spark, cidx):
    from es_indexer_spark.query.compound import terms_set

    root, _ = cidx
    # ES does not clamp M to len(terms): M=5 over 2 terms matches nothing
    assert terms_set(spark, root, ["data", "stream"],
                     minimum_should_match_expr="5", k=None).count() == 0


def test_match_bool_prefix_parity(spark, cidx):
    from es_indexer_spark.query.compound import match_bool_prefix

    root, toks = cidx
    got = [(r["docid"], r["score"]) for r in
           match_bool_prefix(spark, root, "data str", k=15).collect()]
    full = _clause_scores(toks, "data")
    pref = {d for d, t in toks.items() if any(x.startswith("str") for x in t)}
    brute = {}
    for d in set(full) | pref:
        brute[d] = full.get(d, 0.0) + (1.0 if d in pref else 0.0)
    want = _topk(brute, 15)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_match_bool_prefix_single_token_is_prefix_only(spark, cidx):
    from es_indexer_spark.query.compound import match_bool_prefix

    root, toks = cidx
    got = {r["docid"]: r["score"] for r in
           match_bool_prefix(spark, root, "str", k=None).collect()}
    want = {d for d, t in toks.items() if any(x.startswith("str") for x in t)}
    assert set(got) == want
    assert all(s == 1.0 for s in got.values())


def test_match_bool_prefix_empty(spark, cidx):
    from es_indexer_spark.query.compound import match_bool_prefix

    root, _ = cidx
    assert match_bool_prefix(spark, root, "  ", k=5).count() == 0
