"""ES bool-query semantics (must / should / must_not / filter / filter_phrase)
against an independent Python brute-force reference.

The reference's read path issues exactly this DSL shape —
``bool.filter(match_phrase)`` at
geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120 — and the portal search
layers must/should/must_not over the same index (SURVEY.md §3.3). Lucene
semantics verified here:

- must = scored conjunction, should = scored optional (>=1 required only when
  no required clause exists), must_not = non-scoring exclusion,
  filter/filter_phrase = non-scoring required (constant-score 0 when alone);
- score identical to the ranked path's per-term BM25 factor, summed;
- logical deletes (tombstones) hide docs without changing survivors' scores.
"""

from __future__ import annotations

import math

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.tombstones import delete_docs
from es_indexer_spark.query.boolean import bool_query
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.phrase import phrase_match

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def bool_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_bool"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    return root, toks


@pytest.fixture(scope="module")
def nchars(documents):
    return {r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()}


def _brute(toks, must=(), should=(), must_not=(), filt=(), phrase=(), k=10,
           rng=None, nch=None, msm=None, weights=None):
    """Independent per-doc bool evaluation over the Python-tokenized corpus.
    ``rng``: (lo, hi) half-open n_chars bound (the filter_range clause —
    required context, lifts the pure-should >=1 rule). ``msm``: explicit
    minimum_should_match over the (single-token) should clauses; None = the
    Lucene default. ``weights``: per-term clause-boost multipliers."""
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    weights = weights or {}
    dfs = {}
    for term in set(must) | set(should):
        dfs[term] = sum(1 for t in toks.values() if term in t)
    idf = {t: math.log(1 + (n - d + 0.5) / (d + 0.5)) for t, d in dfs.items()}
    scoring = sorted(set(must) | set(should))
    phrase = list(phrase)
    required = bool(must or filt or phrase or rng)
    msm_eff = msm if msm is not None else (0 if required or not should else 1)
    if not required and should:
        # candidates only ever come from the should postings (engine shape)
        msm_eff = max(msm_eff, 1)
    out = []
    for doc, t in toks.items():
        ts = set(t)
        if must or filt or phrase:
            if not all(m in ts for m in must) or not all(m in ts for m in filt):
                continue
            if phrase and not any(
                t[i : i + len(phrase)] == phrase
                for i in range(len(t) - len(phrase) + 1)
            ):
                continue
        if rng is not None and not (rng[0] <= nch[doc] < rng[1]):
            continue
        if sum(1 for s_ in should if s_ in ts) < msm_eff:
            continue
        if any(m in ts for m in must_not):
            continue
        dl = float(len(t))
        s = 0.0
        for term in scoring:
            tf = float(t.count(term))
            if tf:
                s += (
                    weights.get(term, 1.0)
                    * idf[term] * tf * (K1 + 1)
                    / (tf + K1 * (1 - B + B * dl / avgdl))
                )
        out.append((doc, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _run(spark, root, **kw):
    return [
        (r["docid"], r["score"])
        for r in bool_query(spark, root, **kw).collect()
    ]


def _clause_terms(strings):
    out = []
    for s in strings:
        out.extend(tokenize_one(s, "standard"))
    return sorted(set(out))


def _check(spark, bool_index, nch=None, **kw):
    root, toks = bool_index
    got = _run(spark, root, **kw)
    fr = kw.get("filter_range")
    exp = _brute(
        toks,
        must=_clause_terms(kw.get("must", ())),
        should=_clause_terms(kw.get("should", ())),
        must_not=_clause_terms(kw.get("must_not", ())),
        filt=_clause_terms(kw.get("filter_terms", ())),
        phrase=tokenize_one(kw["filter_phrase"], "standard")
        if kw.get("filter_phrase") else (),
        k=kw.get("k", 10),
        rng=(fr[1]["gte"], fr[1]["lt"]) if fr else None,
        nch=nch,
    )
    _assert_same(got, exp)


def _assert_same(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert [s for _, s in got] == pytest.approx([s for _, s in exp])


def test_must_should_must_not(spark, bool_index):
    _check(
        spark, bool_index,
        must=["data"], should=["stream", "batch"], must_not=["key"],
    )


def test_multi_term_must_conjunction(spark, bool_index):
    _check(spark, bool_index, must=["data stream", "customer"], k=15)


def test_pure_should_equals_ranked_topk(spark, bool_index):
    """With only should clauses, bool == the ranked disjunctive engine."""
    root, _ = bool_index
    got = _run(spark, root, should=["spark join window"])
    exp = [
        (r["docid"], r["score"])
        for r in topk(spark, root, "spark join window", k=10).collect()
    ]
    _assert_same(got, exp)


def test_absent_must_term_empty(spark, bool_index):
    root, _ = bool_index
    assert _run(spark, root, must=["zzzmissing", "data"]) == []


def test_must_not_only_filters_never_scores(spark, bool_index):
    root, toks = bool_index
    base = dict(must=["customer"], k=30)
    with_not = _run(spark, root, must_not=["dup"], **base)
    scores = {d: s for d, s in _run(spark, root, **base)}
    dup_docs = {d for d, t in toks.items() if "dup" in t}
    assert all(d not in dup_docs for d, _ in with_not)
    # surviving docs keep their exact must-only scores
    assert all(
        s == pytest.approx(scores[d]) for d, s in with_not if d in scores
    )
    _check(spark, bool_index, **base, must_not=["dup"])


def test_filter_terms_required_but_unscored(spark, bool_index):
    root, toks = bool_index
    _check(spark, bool_index, must=["data"], filter_terms=["stream"], k=20)
    # filter context never changes a surviving doc's score
    filtered = _run(spark, root, must=["data"], filter_terms=["stream"], k=500)
    unfiltered = dict(_run(spark, root, must=["data"], k=500))
    assert filtered and all(
        s == pytest.approx(unfiltered[d]) for d, s in filtered
    )


def test_filter_phrase_matches_phrase_engine(spark, bool_index):
    """bool.filter(match_phrase) alone: same docs as phrase_match, score 0."""
    root, _ = bool_index
    got = _run(spark, root, filter_phrase="data stream", k=500)
    exp = {
        r["docid"] for r in phrase_match(spark, root, "data stream", k=None).collect()
    }
    assert {d for d, _ in got} == exp
    assert all(s == 0.0 for _, s in got)


def test_filter_phrase_with_scored_must(spark, bool_index):
    _check(spark, bool_index, must=["customer"], filter_phrase="data stream", k=20)


def test_empty_query_empty_result(spark, bool_index):
    root, _ = bool_index
    assert _run(spark, root) == []
    assert _run(spark, root, must_not=["data"]) == []


def test_bool_respects_tombstones(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_bool_tomb"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    kw = dict(must=["data"], should=["stream"], must_not=["key"], k=10)
    before = _run(spark, root, **kw)
    dead = before[0][0]
    delete_docs(spark, root, [dead])
    after = _run(spark, root, **kw)
    assert dead not in {d for d, _ in after}
    # logical delete: survivors keep their exact scores (stats unchanged)
    before_scores = dict(before)
    assert all(
        s == pytest.approx(before_scores[d]) for d, s in after if d in before_scores
    )


def test_bool_k_none_returns_all_matches(spark, bool_index):
    root, toks = bool_index
    allm = _run(spark, root, must=["data"], must_not=["key"], k=None)
    top = _run(spark, root, must=["data"], must_not=["key"], k=10_000)
    assert sorted(allm) == sorted(top)
    assert len(allm) > 10


# ---- round 4: minimum_should_match / per-clause boost / fuzzy clauses -------


def test_minimum_should_match_pure_should(spark, bool_index):
    root, toks = bool_index
    for m in (1, 2, 3):
        got = _run(
            spark, root,
            should=["data", "stream", "batch"], minimum_should_match=m, k=20,
        )
        exp = _brute(
            toks, should=["data", "stream", "batch"], msm=m, k=20,
        )
        _assert_same(got, exp)
    # more required matches than clauses -> nothing can match
    assert _run(
        spark, root, should=["data", "stream"], minimum_should_match=3
    ) == []


def test_minimum_should_match_with_must(spark, bool_index):
    root, toks = bool_index
    got = _run(
        spark, root,
        must=["customer"], should=["stream", "batch"],
        minimum_should_match=1, k=20,
    )
    exp = _brute(
        toks, must=["customer"], should=["stream", "batch"], msm=1, k=20,
    )
    _assert_same(got, exp)
    # default with must present: msm=0 — a superset of the msm=1 result
    base = _run(spark, root, must=["customer"], should=["stream", "batch"], k=500)
    assert {d for d, _ in got} <= {d for d, _ in base}


def test_per_clause_boost(spark, bool_index):
    root, toks = bool_index
    got = _run(
        spark, root,
        must=[("data", 2.0)], should=[("stream", 0.5), "batch"], k=20,
    )
    exp = _brute(
        toks, must=["data"], should=["stream", "batch"],
        weights={"data": 2.0, "stream": 0.5}, k=20,
    )
    _assert_same(got, exp)


def test_boost_one_keeps_ranking(spark, bool_index):
    root, _ = bool_index
    a = _run(spark, root, must=[("data", 1.0)], should=["stream"], k=15)
    b = _run(spark, root, must=["data"], should=["stream"], k=15)
    _assert_same(a, b)


def test_must_fuzzy_rank_identical_to_standalone(spark, bool_index):
    """A one-clause bool fuzzy == the standalone fuzzy query (same expansion,
    same boosted contributions)."""
    from es_indexer_spark.query.engine import fuzzy_topk

    root, _ = bool_index
    got = _run(spark, root, must_fuzzy=["strea"], minimum_should_match=0, k=10)
    exp = [
        (r["docid"], r["score"])
        for r in fuzzy_topk(spark, root, "strea", k=10).collect()
    ]
    _assert_same(got, exp)


def test_must_fuzzy_composes_with_must(spark, bool_index):
    """must + must_fuzzy: every hit carries the must term AND >=1 expansion;
    scores = must contribution + fuzzy contributions (checked vs brute over
    the engine's own expansion set)."""
    from es_indexer_spark.query.engine import fuzzy_expansions
    from es_indexer_spark.index import catalog

    root, toks = bool_index
    vdir = catalog.resolve(root)
    exp_terms = fuzzy_expansions(spark, vdir, "strea")
    assert exp_terms, "expansion should find stream/streams at this corpus"
    got = _run(spark, root, must=["customer"], must_fuzzy=["strea"], k=20)

    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = []
    for doc, t in toks.items():
        ts = set(t)
        if "customer" not in ts or not any(e[0] in ts for e in exp_terms):
            continue
        dl = float(len(t))

        def contrib(term, w):
            tf = float(t.count(term))
            if not tf:
                return 0.0
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            return w * idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))

        s = contrib("customer", 1.0) + sum(contrib(e[0], e[3]) for e in exp_terms)
        out.append((doc, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    _assert_same(got, out[:20])


def test_should_fuzzy_counts_as_one_clause_for_msm(spark, bool_index):
    from es_indexer_spark.query.engine import fuzzy_expansions
    from es_indexer_spark.index import catalog

    root, toks = bool_index
    vdir = catalog.resolve(root)
    exp_terms = {e[0] for e in fuzzy_expansions(spark, vdir, "strea")}
    got = _run(
        spark, root,
        should=["batch"], should_fuzzy=["strea"], minimum_should_match=2, k=50,
    )
    hits = {d for d, _ in got}
    for doc, t in toks.items():
        both = "batch" in t and bool(exp_terms & set(t))
        if doc in hits:
            assert both
    assert hits  # corpus has docs carrying batch + a strea-expansion


def test_must_fuzzy_no_expansion_empty(spark, bool_index):
    root, _ = bool_index
    assert _run(spark, root, must=["data"], must_fuzzy=["zzzzqqq"]) == []


def test_filter_range_with_must(spark, bool_index, nchars):
    _check(
        spark, bool_index, nch=nchars,
        must=["data"], should=["stream", "batch"],
        filter_range=("n_chars", {"gte": 100, "lt": 500}),
    )


def test_filter_range_lifts_pure_should_rule(spark, bool_index, nchars):
    # ES: a filter clause makes should purely optional (min_should_match=0) —
    # in-range docs with NO should term still match at score 0
    root, toks = bool_index
    got = _run(
        spark, root, should=["customer"],
        filter_range=("n_chars", {"gte": 150, "lt": 200}), k=None,
    )
    in_range = {d for d, n in nchars.items() if 150 <= n < 200}
    assert {d for d, _ in got} == in_range
    zero_scored = [d for d, s in got if s == 0.0]
    assert any(d for d in zero_scored if "customer" not in toks[d])


def test_filter_range_only_constant_score(spark, bool_index, nchars):
    root, _ = bool_index
    got = _run(spark, root, filter_range=("n_chars", {"gte": 150, "lt": 200}), k=5)
    exp = sorted(d for d, n in nchars.items() if 150 <= n < 200)[:5]
    assert got == [(d, 0.0) for d in exp]


def test_filter_range_excludes_all(spark, bool_index):
    root, _ = bool_index
    assert _run(spark, root, must=["data"],
                filter_range=("n_chars", {"gte": 10**9})) == []


def test_filter_range_with_must_not_and_phrase(spark, bool_index, nchars):
    _check(
        spark, bool_index, nch=nchars,
        must=["customer"], must_not=["key"], filter_phrase="data stream",
        filter_range=("n_chars", {"gte": 0, "lt": 600}),
    )


def test_range_query_standalone_bounds(spark, bool_index, nchars):
    from es_indexer_spark.query.lookup import range_query

    root, _ = bool_index
    lo = min(nchars.values())
    got = [r["docid"] for r in range_query(spark, root, "n_chars", {"gt": lo, "lte": lo + 50}).collect()]
    exp = sorted(d for d, n in nchars.items() if lo < n <= lo + 50)
    assert got == exp
    # size cap
    got1 = [r["docid"] for r in range_query(spark, root, "n_chars", {"gte": lo}, size=3).collect()]
    assert got1 == sorted(nchars)[:3]


def test_range_query_rejects_bad_bounds(spark, bool_index):
    from es_indexer_spark.query.lookup import range_query

    root, _ = bool_index
    with pytest.raises(ValueError):
        range_query(spark, root, "n_chars", {})
    with pytest.raises(ValueError):
        range_query(spark, root, "n_chars", {"between": 3})


def test_must_not_with_range_only_is_not_dropped(spark, bool_index, nchars):
    """Regression: must_not alongside a range filter (and no other clause)
    must exclude — the range-only shortcut used to silently drop it."""
    root, toks = bool_index
    got = _run(
        spark, root, must_not=["key"],
        filter_range=("n_chars", {"gte": 0, "lt": 10**9}), k=None,
    )
    key_docs = {d for d, t in toks.items() if "key" in t}
    assert got and all(d not in key_docs for d, _ in got)
    assert {d for d, _ in got} == set(toks) - key_docs
    assert all(s == 0.0 for _, s in got)


# ---- round 4: bool.filter(term) on stored keyword fields --------------------


def test_filter_field_required_non_scoring(spark, bool_index, documents):
    root, toks = bool_index
    langs = {r["doc_id"]: r["lang"] for r in documents.select("doc_id", "lang").collect()}
    got = _run(
        spark, root, must=["data"], filter_fields=[("lang", "en")], k=500,
    )
    base = dict(_run(spark, root, must=["data"], k=500))
    assert got and all(langs[d] == "en" for d, _ in got)
    # required but NON-scoring: scores equal the unfiltered query's scores
    for d, s in got:
        assert s == base[d]
    assert {d for d, _ in got} == {d for d in base if langs[d] == "en"}


def test_filter_field_stacks_with_range(spark, bool_index, documents, nchars):
    root, _ = bool_index
    langs = {r["doc_id"]: r["lang"] for r in documents.select("doc_id", "lang").collect()}
    got = _run(
        spark, root, must=["data"],
        filter_fields=[("lang", "en")],
        filter_range=("n_chars", {"gte": 200, "lt": 900}),
        k=500,
    )
    assert got
    for d, _ in got:
        assert langs[d] == "en" and 200 <= nchars[d] < 900


def test_filter_field_lifts_pure_should_rule(spark, bool_index, documents):
    root, toks = bool_index
    langs = {r["doc_id"]: r["lang"] for r in documents.select("doc_id", "lang").collect()}
    # filter-only: constant-score match of the doc filter itself
    got = _run(spark, root, filter_fields=[("lang", "fr")], k=None)
    assert {d for d, _ in got} == {d for d, l in langs.items() if l == "fr"}
    assert all(s == 0.0 for _, s in got)


def test_bool_sums_duplicate_docid_postings(spark, documents, tmp_path_factory):
    """ADVICE r4 regression: with a duplicated user id_col the same docid
    carries same-term postings in several blocks (and several postings inside
    one block); the bool scorer must SUM every posting's contribution per
    docid — first-match searchsorted counted only one block, diverging from
    topk's canonical summation."""
    from pyspark.sql import functions as F

    dup = documents.limit(200).withColumn("doc_id", F.col("doc_id") % 50)
    root = str(tmp_path_factory.mktemp("idx_bool_dup"))
    build_index(
        spark, dup, root, content_col="text", id_col="doc_id",
        meta_cols=(), tokenizer="standard", n_buckets=4,
        shard_size=10, n_ckpt_batches=2, store_positions=True,
    )
    # pure-should one-clause bool == ranked topk (match set AND scores)
    for q in ("data", "the", "customer batch stream"):
        got = [
            (r["docid"], round(r["score"], 9))
            for r in bool_query(spark, root, should=[q], k=10).collect()
        ]
        want = [
            (r["docid"], round(r["score"], 9))
            for r in topk(spark, root, q, k=10, use_blockmax=False).collect()
        ]
        assert got == want, q


def test_minimum_should_match_percentage(spark, bool_index):
    """ES percentage/negative msm specs resolve via Lucene's
    calculateMinShouldMatch and rank-match the equivalent integer msm."""
    root, _ = bool_index
    should = ["data", "stream", "batch", "key"]

    def run(msm):
        return [
            (r["docid"], r["score"])
            for r in bool_query(
                spark, root, should=should, minimum_should_match=msm, k=20
            ).collect()
        ]

    assert run("75%") == run(3) != []
    assert run("-25%") == run(3)
    assert run("-2") == run(2)
    assert run("100%") == run(4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run("3<90%")
