"""Round-5 bool clause broadening: the remaining ES bool leaf kinds
(`term` / `terms` / `wildcard` / scored `match_phrase` in must/should,
`must_not: term`, `filter(terms)`), verified against an independent Python
brute-force reference and against the standalone query paths they must be
rank-identical to.

Reference behavior spec: the portal's search layers arbitrary ES bool bodies
over the index (SURVEY.md §3.3); Lucene semantics reproduced:

- `term` leaf in scoring context = TermQuery: raw index term (NO analysis
  chain), scored with the standard BM25 factor;
- `terms` leaf = TermInSetQuery under the constant_score rewrite: a doc
  containing ANY of the values contributes boost flat (required in must,
  msm-counted in should);
- `wildcard` leaf = constant_score multi-term rewrite over the dictionary
  expansion (same expansion as the standalone wildcard_query);
- `match_phrase` in must/should = PhraseQuery: scored
  boost x sum(idf) x BM25-saturated phrase_tf, required when must,
  msm-counted when should; per-clause slop (ordered greedy-chain);
- `must_not: {term: ...}` = raw exclusion; `filter(terms)` = stored-field
  membership pushed into the docs scan.
"""

from __future__ import annotations

import math

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.boolean import bool_query
from es_indexer_spark.query.dsl import search
from es_indexer_spark.query.phrase import phrase_match
from es_indexer_spark.query.suggest import wildcard_query

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def leaf_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_bool_leaves"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text", "lang").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    langs = {r["doc_id"]: r["lang"] for r in rows}
    return root, toks, langs


def _idf(toks, term):
    n = len(toks)
    df = sum(1 for t in toks.values() if term in t)
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _sat(tf, dl, avgdl):
    return tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def _phrase_tf(t, terms, slop=0):
    """Independent ordered-slop phrase counter: a start at i matches when a
    strictly-increasing greedy chain of the remaining terms exists with total
    displacement <= slop (O(n*m) scan — fine at test scale)."""
    cnt = 0
    for i, tok in enumerate(t):
        if tok != terms[0]:
            continue
        pos = i
        ok = True
        for term in terms[1:]:
            nxt = next((j for j in range(pos + 1, len(t)) if t[j] == term), None)
            if nxt is None or (nxt - i) - (len(terms) - 1) > slop:
                ok = False
                break
            pos = nxt
        if ok:
            cnt += 1
    return cnt


def _run(spark, root, **kw):
    return [
        (r["docid"], round(r["score"], 6))
        for r in bool_query(spark, root, **kw).collect()
    ]


def test_must_phrase_rank_identical_to_phrase_match(spark, leaf_index):
    root, toks, _ = leaf_index
    for slop in (0, 2):
        got = _run(spark, root, must_phrase=[("data stream", 1.0, slop)], k=10)
        ref = [
            (r["docid"], round(r["score"], 6))
            for r in phrase_match(spark, root, "data stream", slop=slop, k=10).collect()
        ]
        assert got == ref and got, f"slop={slop}"


def test_should_phrase_scores_brute(spark, leaf_index):
    root, toks, _ = leaf_index
    boost = 2.0
    got = _run(spark, root, must=["customer"], should_phrase=[("data stream", boost)], k=10)
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    sum_idf = _idf(toks, "data") + _idf(toks, "stream")
    exp = []
    for doc, t in toks.items():
        if "customer" not in t:
            continue
        dl = float(len(t))
        s = _idf(toks, "customer") * _sat(float(t.count("customer")), dl, avgdl)
        ptf = _phrase_tf(t, ["data", "stream"])
        if ptf:
            s += boost * sum_idf * _sat(float(ptf), dl, avgdl)
        exp.append((doc, round(s, 6)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert got == exp[:10]


def test_must_raw_matches_analyzed_for_plain_token(spark, leaf_index):
    root, toks, _ = leaf_index
    assert _run(spark, root, must_raw=["spark"], k=10) == _run(
        spark, root, must=["spark"], k=10
    )


def test_must_raw_skips_analysis_chain(spark, leaf_index):
    root, toks, _ = leaf_index
    # the analyzer would lowercase "Spark" into a real term; raw must not
    assert _run(spark, root, must_raw=["Spark"], k=10) == []
    assert _run(spark, root, must=["Spark"], k=10)


def test_terms_const_group_scores_boost_flat(spark, leaf_index):
    root, toks, _ = leaf_index
    boost = 0.75
    got = _run(spark, root, must_terms=[(["spark", "flink"], boost)], k=2000)
    docs = sorted(d for d, t in toks.items() if "spark" in t or "flink" in t)
    assert sorted(d for d, _s in got) == docs
    assert all(s == boost for _d, s in got)


def test_should_terms_counts_for_msm(spark, leaf_index):
    root, toks, _ = leaf_index
    got = _run(
        spark, root, should=["customer"],
        should_terms=[(["spark", "flink"], 0.5)],
        minimum_should_match=2, k=2000,
    )
    exp_docs = sorted(
        d for d, t in toks.items()
        if "customer" in t and ("spark" in t or "flink" in t)
    )
    assert sorted(d for d, _s in got) == exp_docs


def test_wildcard_const_group_vs_standalone_expansion(spark, leaf_index):
    root, toks, _ = leaf_index
    got = _run(spark, root, must_wildcard=["spar*"], k=3000)
    ref = sorted(r["docid"] for r in wildcard_query(spark, root, "spar*", k=3000).collect())
    assert sorted(d for d, _s in got) == ref
    assert all(s == 1.0 for _d, s in got)


def test_wildcard_no_expansion_required_empty_optional_kept(spark, leaf_index):
    root, toks, _ = leaf_index
    assert _run(spark, root, must_wildcard=["zzqqx*"], k=10) == []
    with_dead = _run(spark, root, must=["spark"], should_wildcard=[("zzqqx*", 1.0)], k=10)
    assert with_dead == _run(spark, root, must=["spark"], k=10)


def test_filter_terms_list_is_membership(spark, leaf_index):
    root, toks, langs = leaf_index
    got = _run(spark, root, should=["spark"], filter_fields=[("lang", ["en", "fr"])], k=2000)
    # the filter is required context, so it lifts the pure-should >=1 rule
    # (Lucene): every lang-matching doc is a hit, spark-carrying ones scored
    exp_docs = sorted(d for d in toks if langs[d] in ("en", "fr"))
    assert sorted(d for d, _s in got) == exp_docs
    scored = {d for d, s in got if s > 0}
    assert scored == {
        d for d, t in toks.items() if "spark" in t and langs[d] in ("en", "fr")
    }


def test_must_not_raw_equals_analyzed_exclusion(spark, leaf_index):
    root, toks, _ = leaf_index
    assert _run(spark, root, must=["spark"], must_not_raw=["join"], k=10) == _run(
        spark, root, must=["spark"], must_not=["join"], k=10
    )


def test_must_phrase_absent_term_empty(spark, leaf_index):
    root, toks, _ = leaf_index
    assert _run(spark, root, must_phrase=["spark zzqqxunseen"], k=10) == []


def test_dsl_bool_lowers_all_new_leaves(spark, leaf_index):
    root, toks, _ = leaf_index
    body = {"query": {"bool": {
        "must": [
            {"match_phrase": {"text": {"query": "data stream", "slop": 1}}},
            {"term": {"text": "customer"}},
        ],
        "should": [
            {"terms": {"text": ["spark", "flink"], "boost": 0.5}},
            {"wildcard": {"text": {"value": "wind*"}}},
        ],
        "must_not": [{"term": {"text": "error"}}],
        "filter": [
            {"terms": {"lang": ["en", "fr", "de"]}},
            {"range": {"n_chars": {"gte": 100}}},
        ],
    }}, "size": 8}
    got = [(r["docid"], round(r["score"], 6)) for r in search(spark, root, body).collect()]
    ref = _run(
        spark, root,
        must_phrase=[("data stream", 1.0, 1)], must_raw=["customer"],
        should_terms=[(["spark", "flink"], 0.5)], should_wildcard=[("wind*", 1.0)],
        must_not_raw=["error"],
        filter_fields=[("lang", ["en", "fr", "de"])],
        filter_range=("n_chars", {"gte": 100}), k=8,
    )
    assert got == ref and got


def test_pure_should_phrase_needs_one_match(spark, leaf_index):
    root, toks, _ = leaf_index
    got = _run(spark, root, should_phrase=["data stream"], k=2000)
    exp = sorted(d for d, t in toks.items() if _phrase_tf(t, ["data", "stream"]))
    assert sorted(d for d, _s in got) == exp


def test_single_token_phrase_equals_term_match(spark, leaf_index):
    root, toks, _ = leaf_index
    # phrase_tf of a one-term phrase IS the term tf — scores must be identical
    assert _run(spark, root, must_phrase=["spark"], k=10) == _run(
        spark, root, must=["spark"], k=10
    )


def test_empty_terms_group_matches_nothing(spark, leaf_index):
    root, toks, _ = leaf_index
    assert _run(spark, root, must_terms=[([], 1.0)], k=5) == []


def test_partial_terms_group_matches_present_value(spark, leaf_index):
    root, toks, _ = leaf_index
    got = _run(spark, root, must_terms=[(["spark", "zzqqnope"], 1.0)], k=3000)
    exp = sorted(d for d, t in toks.items() if "spark" in t)
    assert sorted(d for d, _s in got) == exp


def test_must_phrase_under_deletes_live_docs_semantics(spark, documents, tmp_path_factory):
    """Logical deletes hide docs from the scored-phrase path immediately while
    survivors' scores stay bit-identical (stats keep counting deleted docs
    until compaction — Lucene live-docs semantics, same rule as every other
    query path)."""
    from es_indexer_spark.index.tombstones import delete_docs

    root = str(tmp_path_factory.mktemp("idx_leafdel"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=4, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    before = _run(spark, root, must_phrase=["data stream"], should=["customer"], k=50)
    assert before
    dead = {d for i, (d, _s) in enumerate(before) if i % 3 == 0}
    delete_docs(spark, root, sorted(dead))
    after = _run(spark, root, must_phrase=["data stream"], should=["customer"], k=50)
    assert [x for x in before if x[0] not in dead][: len(after)] == after
    assert not ({d for d, _s in after} & dead)


def test_must_phrase_distributed_tombstones(spark, documents, tmp_path_factory, monkeypatch):
    """Same deletes delivered through the shard-keyed cogroup (threshold
    forced to 0): scored-phrase results identical to driver-array mode."""
    from es_indexer_spark.index import tombstones as tmod
    from es_indexer_spark.index.tombstones import delete_docs

    root = str(tmp_path_factory.mktemp("idx_leafdel2"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=4, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    base = _run(spark, root, must_phrase=["data stream"], should=["customer"], k=30)
    dead = sorted({d for i, (d, _s) in enumerate(base) if i % 4 == 1})
    delete_docs(spark, root, dead)
    arr_mode = _run(spark, root, must_phrase=["data stream"], should=["customer"], k=30)
    monkeypatch.setattr(tmod, "DISTRIBUTED_TOMB_THRESHOLD", 0)
    dist_mode = _run(spark, root, must_phrase=["data stream"], should=["customer"], k=30)
    assert arr_mode == dist_mode and arr_mode


def test_must_range_scored_constant(spark, leaf_index, documents):
    root, toks, _ = leaf_index
    nch = {r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()}
    got = _run(spark, root, must=["data"], must_ranges=[("n_chars", {"gte": 400})], k=2000)
    flt = _run(spark, root, must=["data"], filter_range=("n_chars", {"gte": 400}), k=2000)
    # same doc set as the filter variant, every score shifted by exactly +1.0
    assert sorted(d for d, _s in got) == sorted(d for d, _s in flt)
    dg, df_ = dict(got), dict(flt)
    assert all(abs(dg[d] - df_[d] - 1.0) < 1e-6 for d in dg)


def test_should_range_optional_boost_and_msm(spark, leaf_index, documents):
    root, toks, _ = leaf_index
    nch = {r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()}
    base = dict(_run(spark, root, must=["data"], k=2000))
    got = _run(spark, root, must=["data"], should_ranges=[("n_chars", {"gte": 400}, 0.5)], k=2000)
    assert sorted(d for d, _s in got) == sorted(base)
    for d, s in got:
        want = 0.5 if (nch[d] or 0) >= 400 else 0.0
        assert abs(s - base[d] - want) < 1e-6
    # msm counts the range as one should clause
    msm2 = _run(spark, root, should=["data"],
                should_ranges=[("n_chars", {"gte": 400}, 0.5)],
                minimum_should_match=2, k=2000)
    exp = sorted(d for d, t in toks.items() if "data" in t and (nch[d] or 0) >= 400)
    assert sorted(d for d, _s in msm2) == exp


def test_range_only_scored_query(spark, leaf_index, documents):
    root, toks, _ = leaf_index
    nch = {r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()}
    got = _run(spark, root, should_ranges=[("n_chars", {"gte": 400}, 2.0)], k=3000)
    exp = sorted(d for d, n in nch.items() if n is not None and n >= 400)
    assert sorted(d for d, _s in got) == exp
    assert all(s == 2.0 for _d, s in got)


def test_must_exists_scored(spark, leaf_index):
    root, toks, _ = leaf_index
    got = _run(spark, root, must=["data"], must_exists=["lang"], k=2000)
    base = dict(_run(spark, root, must=["data"], k=2000))
    # every doc has a lang in this corpus: same set, +1.0 everywhere
    assert sorted(d for d, _s in got) == sorted(base)
    assert all(abs(s - base[d] - 1.0) < 1e-6 for d, s in got)


def test_dsl_range_in_should_scored(spark, leaf_index):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "should": [{"range": {"n_chars": {"gte": 400, "boost": 0.5}}}],
    }}, "size": 2000}
    got = [(r["docid"], round(r["score"], 6)) for r in search(spark, leaf_index[0], body).collect()]
    ref = _run(spark, leaf_index[0], must=["data"],
               should_ranges=[("n_chars", {"gte": 400}, 0.5)], k=2000)
    assert got == ref and got


def test_filter_like_stored_field(spark, leaf_index, documents):
    """filter_like: ES bool.filter(wildcard) on a STORED keyword column —
    anchored, case-sensitive * / ? match inside the pushed docs scan."""
    root, toks, _ = leaf_index
    langs = {r["doc_id"]: r["lang"] for r in documents.select("doc_id", "lang").collect()}
    got = _run(spark, root, filter_like=[("lang", "e*")], k=5000)
    exp = sorted(d for d, lg in langs.items() if lg is not None and lg.startswith("e"))
    assert sorted(d for d, _s in got) == exp and got
    assert all(s == 0.0 for _d, s in got)  # filter context never scores
    # ? = exactly one char; anchored both ends
    got_q = _run(spark, root, filter_like=[("lang", "e?")], k=5000)
    exp_q = sorted(d for d, lg in langs.items()
                   if lg is not None and len(lg) == 2 and lg[0] == "e")
    assert sorted(d for d, _s in got_q) == exp_q
    # case-sensitive: uppercase pattern matches nothing in this corpus
    assert _run(spark, root, filter_like=[("lang", "E*")], k=5000) == []
    # stacks with scoring clauses: same docs as must ∩ like, scores unchanged
    both = _run(spark, root, must=["data"], filter_like=[("lang", "e*")], k=5000)
    base = dict(_run(spark, root, must=["data"], k=5000))
    assert all(d in base and abs(s - base[d]) < 1e-9 for d, s in both)
    assert sorted(d for d, _s in both) == sorted(set(base) & set(exp))


def test_dsl_filter_wildcard(spark, leaf_index, documents):
    """bool.filter(wildcard) through the JSON DSL — the ES SQL LIKE shape."""
    body = {"query": {"bool": {
        "must": [{"match": {"text": "data"}}],
        "filter": [{"wildcard": {"lang": {"value": "e*"}}}],
    }}, "size": 2000}
    got = [(r["docid"], round(r["score"], 6))
           for r in search(spark, leaf_index[0], body).collect()]
    ref = _run(spark, leaf_index[0], must=["data"],
               filter_like=[("lang", "e*")], k=2000)
    assert got == ref and got
    with pytest.raises(ValueError, match="case-sensitive"):
        search(spark, leaf_index[0], {"query": {"bool": {
            "must": [{"match": {"text": "data"}}],
            "filter": [{"wildcard": {"lang": {"value": "E*", "case_insensitive": True}}}],
        }}, "size": 10})
