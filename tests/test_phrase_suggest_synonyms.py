"""Positional/phrase queries, search-as-you-type suggestions, and query-time
synonym expansion — the M7 feature set of SURVEY.md §7.2 (reference analogs:
match_phrase GeoNetworkServiceImpl.java:114-120; search_as_you_type fields
portal_records_index_schema.json:112-132; acronym_search_analyser :10-14 +
AcronymService.java)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.analysis.synonyms import (
    build_synonym_rules,
    expand_terms,
    is_acronym,
    normalize_label,
)
from es_indexer_spark.analysis.tokenizer import standard_tokenize_series, tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.codec import decode_positions, encode_positions
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.phrase import phrase_match
from es_indexer_spark.query.suggest import phrase_suggestions, suggest_prefix


@pytest.fixture(scope="module")
def pos_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posidx"))
    build_index(
        spark,
        documents,
        root,
        content_col="text",
        id_col="doc_id",
        tokenizer="standard",
        n_buckets=4,
        shard_size=100,
        n_ckpt_batches=2,
        store_positions=True,
    )
    return root


# ---------------------------------------------------------------- positions codec
def test_positions_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(100):
        tfs = rng.integers(1, 6, size=int(rng.integers(1, 10)))
        flat = np.concatenate(
            [np.sort(rng.choice(500, size=tf, replace=False)) for tf in tfs]
        ).astype(np.uint64)
        assert np.array_equal(decode_positions(encode_positions(flat, tfs), tfs), flat)


def test_positions_empty():
    assert encode_positions(np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)) == b""
    assert decode_positions(b"", np.empty(0, dtype=np.int64)).size == 0


# ---------------------------------------------------------------- phrase queries
def _brute_phrase(documents, phrase_terms):
    """Driver-side oracle: token lists via the same chain, count consecutive runs."""
    rows = documents.select("doc_id", "text").collect()
    import pandas as pd

    toks = standard_tokenize_series(pd.Series([r["text"] for r in rows]))
    out = {}
    for r, tl in zip(rows, toks):
        n = 0
        m = len(phrase_terms)
        for i in range(len(tl) - m + 1):
            if tl[i : i + m] == phrase_terms:
                n += 1
        if n:
            out[r["doc_id"]] = n
    return out


@pytest.mark.parametrize(
    "phrase",
    [
        "data stream",
        "the data",
        "slow query plan",
        # duplicate-term phrases: the vectorized scorer intersects the SAME
        # sorted key array at two offsets — overlapping runs must count right
        "the the",
        "data data",
    ],
)
def test_phrase_match_vs_brute(spark, documents, pos_index, phrase):
    got = {
        r["docid"]: r["phrase_tf"]
        for r in phrase_match(spark, pos_index, phrase, k=None).collect()
    }
    want = _brute_phrase(documents, tokenize_one(phrase))
    assert got == want


def test_phrase_absent_term_empty(spark, pos_index):
    assert phrase_match(spark, pos_index, "zzznope data", k=None).count() == 0


def test_phrase_scores_ordered_and_positive(spark, pos_index):
    rows = phrase_match(spark, pos_index, "data stream", k=5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_phrase_requires_positional_index(spark, documents, tmp_path):
    root = str(tmp_path / "nopos")
    build_index(
        spark, documents, root, content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=2, n_ckpt_batches=1,
    )
    with pytest.raises(ValueError, match="store_positions"):
        phrase_match(spark, root, "data stream")


# ---------------------------------------------------------------- suggestions
def test_suggest_prefix_matches_dict(spark, documents, pos_index):
    got = [r["term"] for r in suggest_prefix(spark, pos_index, "da", k=5).collect()]
    assert got and all(t.startswith("da") for t in got)
    # ranked by cf desc — recompute cf order from the corpus
    import pandas as pd

    toks = standard_tokenize_series(
        pd.Series([r["text"] for r in documents.select("text").collect()])
    )
    cf: dict[str, int] = {}
    for tl in toks:
        for t in tl:
            if t.startswith("da"):
                cf[t] = cf.get(t, 0) + 1
    want = sorted(cf, key=lambda t: (-cf[t], t))[:5]
    assert got == want


def test_phrase_suggestions_prefix_and_rank(spark, documents):
    rows = phrase_suggestions(documents, "doc_id", "text", prefix="data", k=10).collect()
    assert rows
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert all(r["phrase"].startswith("data") for r in rows)
    assert any(" " in r["phrase"] for r in rows)  # real shingles, not just unigrams


# ---------------------------------------------------------------- synonyms
def test_is_acronym_heuristic():
    # reference heuristic (AcronymService.java:328-347)
    assert is_acronym("IMOS")
    assert is_acronym("CO2")
    assert is_acronym("CTD-SBE")
    assert not is_acronym("Imos")          # 2+ lowercase run
    assert not is_acronym("waveheight")    # no capital
    assert not is_acronym("VERYLONGACRONYMXX")  # > 12 chars
    assert not is_acronym("")


def test_normalize_label_strips_parens():
    assert normalize_label("Sea Surface Temp  (SST)") == "Sea Surface Temp"


def test_build_rules_and_expand():
    rules = build_synonym_rules(
        [
            ("Integrated Marine Observing System", ["IMOS", "imos-not-acronym"]),
            ("Conductivity Temperature Depth", ["CTD"]),
        ]
    )
    assert rules == {
        "ctd": ["conductivity temperature depth"],
        "imos": ["integrated marine observing system"],
    }
    expanded = expand_terms(["ctd", "data"], rules, lambda s: tokenize_one(s))
    assert expanded == ["ctd", "conductivity", "temperature", "depth", "data"]


def test_topk_synonym_expansion_widens(spark, pos_index):
    rules = {"jw": ["joined window"]}
    assert topk(spark, pos_index, "jw", k=5).count() == 0  # acronym absent in corpus
    rows = topk(spark, pos_index, "jw", k=5, synonyms=rules).collect()
    assert len(rows) == 5
    # expansion must equal querying the expansion directly (same docs+scores)
    direct = topk(spark, pos_index, "joined window", k=5).collect()
    assert [(r["docid"], round(r["score"], 9)) for r in rows] == [
        (r["docid"], round(r["score"], 9)) for r in direct
    ]


# ---------------------------------------------------------------- pos index still BM25-exact
def test_positional_index_scores_unchanged(spark, documents, pos_index):
    from es_indexer_spark.query.bm25 import bm25_topk_brute

    got = topk(spark, pos_index, "spark join window", k=10).collect()
    want = bm25_topk_brute(
        documents, "spark join window", k=10, content_col="text", id_col="doc_id"
    ).collect()
    assert [(r["docid"]) for r in got] == [(r["docid"]) for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_prefix_query_constant_score(spark, documents, pos_index):
    """ES prefix query: docs containing ANY dictionary expansion of the
    prefix, constant score 1.0 (Lucene constant-score rewrite)."""
    from es_indexer_spark.query.suggest import prefix_query

    got = prefix_query(spark, pos_index, "d", k=10_000).collect()
    exp = {
        r["doc_id"]
        for r in documents.collect()
        if any(
            t.startswith("d")
            for t in tokenize_one(r["text"], "standard")
        )
    }
    assert {r["docid"] for r in got} == exp
    assert all(r["score"] == 1.0 for r in got)
    # docid-ordered
    ids = [r["docid"] for r in got]
    assert ids == sorted(ids)
    # absent prefix -> empty
    assert prefix_query(spark, pos_index, "zzz").collect() == []


def test_prefix_query_expansion_cap(spark, documents, pos_index):
    """max_expansions keeps only the highest-df expansions (Lucene
    top-terms rewrite): capped result must be a subset of the full one."""
    from es_indexer_spark.query.suggest import prefix_query

    full = {r["docid"] for r in prefix_query(spark, pos_index, "s", k=10_000).collect()}
    capped = {
        r["docid"]
        for r in prefix_query(
            spark, pos_index, "s", k=10_000, max_expansions=1
        ).collect()
    }
    assert capped and capped <= full


def test_wildcard_query_vs_brute(spark, documents, pos_index):
    """ES wildcard query: '?' = one char, '*' = any run; constant score."""
    import re

    from es_indexer_spark.query.suggest import wildcard_query

    for pat, rx in [("s?a*", r"^s.a.*$"), ("*dup*", r"^.*dup.*$"), ("jo?n", r"^jo.n$")]:
        got = wildcard_query(spark, pos_index, pat, k=10_000).collect()
        crx = re.compile(rx)
        exp = {
            r["doc_id"]
            for r in documents.collect()
            if any(crx.match(t) for t in tokenize_one(r["text"], "standard"))
        }
        assert {r["docid"] for r in got} == exp, pat
        assert all(r["score"] == 1.0 for r in got)
    assert wildcard_query(spark, pos_index, "zz*qq").collect() == []


def test_wildcard_pattern_translation():
    from es_indexer_spark.query.suggest import wildcard_pattern_to_regex

    assert wildcard_pattern_to_regex("s?a*") == "^s.a.*$"
    # regex metacharacters in the literal part are escaped
    assert wildcard_pattern_to_regex("a.b*") == r"^a\.b.*$"


def test_match_phrase_prefix_vs_brute(spark, documents, pos_index):
    """Fixed tokens consecutive, then any expansion of the trailing prefix."""
    from es_indexer_spark.query.bm25 import lucene_idf
    from es_indexer_spark.query.phrase import match_phrase_prefix

    toks = {
        r["doc_id"]: tokenize_one(r["text"], "standard")
        for r in documents.collect()
    }
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    vocab = {t for ts in toks.values() for t in ts}

    def brute(fixed, pref, k=10):
        exp = sorted(v for v in vocab if v.startswith(pref))
        dfs = {
            v: sum(1 for t in toks.values() if v in t)
            for v in set(fixed) | set(exp)
        }
        union_df = min(n, sum(dfs[e] for e in exp))
        sum_idf = sum(lucene_idf(n, dfs[f]) for f in fixed) + lucene_idf(n, union_df)
        out = []
        for d, t in toks.items():
            ptf = sum(
                1
                for i in range(len(t) - len(fixed))
                if t[i : i + len(fixed)] == fixed and t[i + len(fixed)].startswith(pref)
            )
            if ptf:
                dl = float(len(t))
                s = sum_idf * ptf * 2.2 / (ptf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                out.append((d, ptf, s))
        out.sort(key=lambda x: (-x[2], x[0]))
        return out[:k]

    for q, fixed, pref in [
        ("data s", ["data"], "s"),
        ("customer data s", ["customer", "data"], "s"),
        ("st", [], "st"),
    ]:
        got = [
            (r["docid"], r["phrase_tf"], r["score"])
            for r in match_phrase_prefix(spark, pos_index, q, k=10).collect()
        ]
        exp = brute(fixed, pref)
        assert [(d, p) for d, p, _ in got] == [(d, p) for d, p, _ in exp], q
        assert [s for _, _, s in got] == pytest.approx([s for _, _, s in exp])


def test_match_phrase_prefix_edges(spark, pos_index):
    from es_indexer_spark.query.phrase import match_phrase_prefix

    # absent prefix -> empty; absent fixed term -> empty
    assert match_phrase_prefix(spark, pos_index, "data zzz").collect() == []
    assert match_phrase_prefix(spark, pos_index, "zzzmissing s").collect() == []
    # expansion cap keeps a subset
    full = {r["docid"] for r in match_phrase_prefix(spark, pos_index, "data s", k=None).collect()}
    capped = {
        r["docid"]
        for r in match_phrase_prefix(
            spark, pos_index, "data s", k=None, max_expansions=1
        ).collect()
    }
    assert capped <= full


@pytest.fixture(scope="module")
def code_lang_index(spark, tmp_path_factory):
    """Positional code-tokenizer index with lang markers, two languages."""
    rows = [
        (1, "def parse tree node", "python"),
        (2, "def parse tree leaf", "python"),
        (3, "def parse tree node", "java"),
        (4, "tree parse def", "python"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string, lang string")
    root = str(tmp_path_factory.mktemp("idx_codelang"))
    build_index(
        spark, df, root, content_col="body", id_col="doc_id",
        lang_col="lang", tokenizer="code", n_buckets=2, shard_size=16,
        n_ckpt_batches=1, store_positions=True,
    )
    return root


def test_phrase_match_lang_marker_is_filter_not_chain(spark, code_lang_index):
    """Regression: with lang set on a code index the trailing lang:<x>
    marker must act as a required filter, never a phrase position."""
    got = {
        r["docid"]
        for r in phrase_match(
            spark, code_lang_index, "parse tree", k=None, lang="python"
        ).collect()
    }
    assert got == {1, 2}  # doc 3 is java; doc 4 lacks the adjacency
    all_langs = {
        r["docid"]
        for r in phrase_match(spark, code_lang_index, "parse tree", k=None).collect()
    }
    assert all_langs == {1, 2, 3}


def test_match_phrase_prefix_lang_marker(spark, code_lang_index):
    """Regression: the marker must not be mistaken for the user's prefix."""
    from es_indexer_spark.query.phrase import match_phrase_prefix

    got = {
        r["docid"]
        for r in match_phrase_prefix(
            spark, code_lang_index, "parse tr", k=None, lang="python"
        ).collect()
    }
    assert got == {1, 2}
    # absent lang -> empty, not garbage
    assert match_phrase_prefix(
        spark, code_lang_index, "parse tr", k=None, lang="rust"
    ).collect() == []


# ---------------------------------------------------------------- sloppy phrases
def _brute_sloppy(documents, terms, slop, ordered=True):
    """Independent sloppy-match oracle: per doc, greedy min-successor chain
    per evaluation order (all distinct permutations when unordered); tf =
    distinct chain-start positions whose greedy end fits the window."""
    import pandas as pd
    from itertools import permutations

    rows = documents.select("doc_id", "text").collect()
    toks = standard_tokenize_series(pd.Series([r["text"] for r in rows]))
    m = len(terms)
    orders = (
        [tuple(terms)]
        if ordered
        else sorted({p for p in permutations(terms)})
    )
    out = {}
    for r, tl in zip(rows, toks):
        pos = {t: [i for i, x in enumerate(tl) if x == t] for t in set(terms)}
        if any(not pos[t] for t in set(terms)):
            continue
        starts = set()
        for order in orders:
            for p0 in pos[order[0]]:
                cur, ok = p0, True
                for t in order[1:]:
                    nxt = [q for q in pos[t] if q > cur]
                    if not nxt:
                        ok = False
                        break
                    cur = min(nxt)
                if ok and (cur - p0) - (m - 1) <= slop:
                    starts.add(p0)
        if starts:
            out[r["doc_id"]] = len(starts)
    return out


@pytest.mark.parametrize(
    "phrase,slop",
    [
        ("data stream", 1),
        ("data stream", 3),
        ("customer stream", 2),
        ("slow plan", 2),
        ("the data stream", 2),
        ("data data", 2),  # duplicate terms: successor chain must advance
    ],
)
def test_phrase_slop_vs_brute(spark, documents, pos_index, phrase, slop):
    got = {
        r["docid"]: r["phrase_tf"]
        for r in phrase_match(spark, pos_index, phrase, k=None, slop=slop).collect()
    }
    want = _brute_sloppy(documents, tokenize_one(phrase), slop, ordered=True)
    assert got == want


@pytest.mark.parametrize("phrase", ["data stream", "the data", "data data"])
def test_phrase_slop_zero_is_exact_phrase(spark, documents, pos_index, phrase):
    exact = {
        (r["docid"], r["phrase_tf"], r["score"])
        for r in phrase_match(spark, pos_index, phrase, k=None).collect()
    }
    slop0 = {
        (r["docid"], r["phrase_tf"], r["score"])
        for r in phrase_match(spark, pos_index, phrase, k=None, slop=0).collect()
    }
    assert exact == slop0
    # and the brute sloppy oracle at slop=0 agrees with the exact-run oracle
    assert _brute_sloppy(documents, tokenize_one(phrase), 0) == _brute_phrase(
        documents, tokenize_one(phrase)
    )


def test_phrase_slop_match_set_grows(spark, pos_index):
    sets = [
        {r["docid"] for r in phrase_match(spark, pos_index, "data stream", k=None, slop=s).collect()}
        for s in (0, 1, 3, 8)
    ]
    for a, b in zip(sets, sets[1:]):
        assert a <= b
    assert sets[0] < sets[-1]  # slop genuinely widens on this corpus


def test_span_near_ordered_equals_phrase_slop(spark, pos_index):
    from es_indexer_spark.query.phrase import span_near

    a = [
        (r["docid"], r["phrase_tf"], round(r["score"], 9))
        for r in phrase_match(spark, pos_index, "data stream", k=None, slop=2).collect()
    ]
    b = [
        (r["docid"], r["phrase_tf"], round(r["score"], 9))
        for r in span_near(spark, pos_index, ["data", "stream"], slop=2, in_order=True, k=None).collect()
    ]
    assert a == b


@pytest.mark.parametrize(
    "clauses,slop",
    [(["stream", "data"], 1), (["stream", "data"], 3), (["plan", "slow", "query"], 2)],
)
def test_span_near_unordered_vs_brute(spark, documents, pos_index, clauses, slop):
    from es_indexer_spark.query.phrase import span_near

    got = {
        r["docid"]: r["phrase_tf"]
        for r in span_near(
            spark, pos_index, clauses, slop=slop, in_order=False, k=None
        ).collect()
    }
    want = _brute_sloppy(documents, clauses, slop, ordered=False)
    assert got == want


def test_span_near_unordered_clause_order_invariant(spark, pos_index):
    from es_indexer_spark.query.phrase import span_near

    a = [
        (r["docid"], r["phrase_tf"])
        for r in span_near(spark, pos_index, ["data", "stream"], slop=2, in_order=False, k=None).collect()
    ]
    b = [
        (r["docid"], r["phrase_tf"])
        for r in span_near(spark, pos_index, ["stream", "data"], slop=2, in_order=False, k=None).collect()
    ]
    assert a == b and a  # same result either way, and non-empty


def test_bool_filter_phrase_slop(spark, documents, pos_index):
    from es_indexer_spark.query.boolean import bool_query

    got = {
        r["docid"]
        for r in bool_query(
            spark, pos_index, must=["customer"],
            filter_phrase="data stream", filter_phrase_slop=2, k=None,
        ).collect()
    }
    sloppy = set(_brute_sloppy(documents, ["data", "stream"], 2))
    import pandas as pd

    rows = documents.select("doc_id", "text").collect()
    toks = standard_tokenize_series(pd.Series([r["text"] for r in rows]))
    has_cust = {r["doc_id"] for r, tl in zip(rows, toks) if "customer" in tl}
    assert got == (sloppy & has_cust)


# ---------------------------------------------------------------- fuzzy completion
def test_suggest_fuzzy_vs_brute(spark, pos_index):
    """Fuzzy completion ranks prefix-within-edits dictionary terms by
    (edits, cf desc, term) — brute levenshtein over the collected dict."""
    import os as _os

    from es_indexer_spark.index import catalog as _cat
    from es_indexer_spark.query.suggest import suggest_fuzzy

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    p, f = "sta", 1
    dict_rows = spark.read.parquet(
        _os.path.join(_cat.resolve(pos_index), "dict")
    ).collect()
    want = []
    for r in dict_rows:
        t = r["term"]
        if not t.startswith(p[0]) or len(t) < len(p) - f:
            continue
        edits = min(
            lev(t[:L], p) for L in range(max(1, len(p) - f), len(p) + f + 1)
        )
        if edits <= f:
            want.append((edits, -r["cf"], t, r["df"], r["cf"]))
    want.sort()
    got = suggest_fuzzy(spark, pos_index, p, k=10, fuzziness=f).collect()
    assert [(r["term"], r["edits"]) for r in got] == [
        (t, e) for e, _, t, _, _ in want[:10]
    ]
    assert len({r["edits"] for r in got}) >= 1 and len(got) >= 2


def test_suggest_fuzzy_min_length_fallback(spark, pos_index):
    """Below min_fuzzy_length the suggester degrades to exact prefix
    completion (ES default 3)."""
    exact = [
        (r["term"], r["df"], r["cf"])
        for r in suggest_prefix(spark, pos_index, "da", k=10).collect()
    ]
    from es_indexer_spark.query.suggest import suggest_fuzzy

    got = suggest_fuzzy(spark, pos_index, "da", k=10, fuzziness=2).collect()
    assert [(r["term"], r["df"], r["cf"]) for r in got] == exact
    assert all(r["edits"] == 0 for r in got)


def test_suggest_fuzzy_k_cap(spark, pos_index):
    from es_indexer_spark.query.suggest import suggest_fuzzy

    full = suggest_fuzzy(spark, pos_index, "sta", k=50, fuzziness=1).count()
    assert full >= 3
    assert suggest_fuzzy(spark, pos_index, "sta", k=3, fuzziness=1).count() == 3


# ---------------------------------------------------------------- span_first
def _brute_span_first(documents, terms, slop, end, ordered=True):
    """Greedy-chain brute with Lucene's exclusive end bound: a start counts
    iff its greedy chain fits the window AND its end position < end."""
    import pandas as pd
    from itertools import permutations

    rows = documents.select("doc_id", "text").collect()
    toks = standard_tokenize_series(pd.Series([r["text"] for r in rows]))
    m = len(terms)
    orders = [tuple(terms)] if ordered else sorted({p for p in permutations(terms)})
    out = {}
    for r, tl in zip(rows, toks):
        pos = {t: [i for i, x in enumerate(tl) if x == t] for t in set(terms)}
        if any(not pos[t] for t in set(terms)):
            continue
        starts = set()
        for order in orders:
            for p0 in pos[order[0]]:
                cur, ok = p0, True
                for t in order[1:]:
                    nxt = [q for q in pos[t] if q > cur]
                    if not nxt:
                        ok = False
                        break
                    cur = min(nxt)
                if ok and (cur - p0) - (m - 1) <= slop and cur < end:
                    starts.add(p0)
        if starts:
            out[r["doc_id"]] = len(starts)
    return out


@pytest.mark.parametrize(
    "clauses,slop,end,in_order",
    [(["data", "stream"], 1, 30, True), (["data"], 0, 1, True),
     (["stream", "data"], 2, 25, False)],
)
def test_span_first_vs_brute(spark, documents, pos_index, clauses, slop, end, in_order):
    from es_indexer_spark.query.phrase import span_first

    got = {
        r["docid"]: r["phrase_tf"]
        for r in span_first(
            spark, pos_index, clauses, end, slop=slop, in_order=in_order, k=None
        ).collect()
    }
    want = _brute_span_first(documents, clauses, slop, end, ordered=in_order)
    assert got == want


def test_span_first_unbounded_equals_span_near(spark, pos_index):
    from es_indexer_spark.query.phrase import span_first, span_near

    a = [(r["docid"], r["phrase_tf"]) for r in span_near(
        spark, pos_index, ["data", "stream"], slop=1, k=None).collect()]
    b = [(r["docid"], r["phrase_tf"]) for r in span_first(
        spark, pos_index, ["data", "stream"], 1 << 30, slop=1, k=None).collect()]
    assert a == b and a


# ---------------------------------------------------------------- span_or / span_not
def test_span_or_union_and_tf(spark, documents, pos_index):
    from es_indexer_spark.query.phrase import span_or

    got = {
        r["docid"]: r["phrase_tf"]
        for r in span_or(spark, pos_index, ["data", "window"], k=None).collect()
    }
    # brute replay: union of docs containing either term; tf = total count
    import math

    docs = {r["doc_id"]: tokenize_one(r["text"]) for r in documents.collect()}
    want = {
        d: toks.count("data") + toks.count("window")
        for d, toks in docs.items()
        if "data" in toks or "window" in toks
    }
    assert got == want
    # scoring: sum-idf SpanOr weight over the combined freq
    n = len(docs)
    df_a = sum(1 for t in docs.values() if "data" in t)
    df_b = sum(1 for t in docs.values() if "window" in t)
    avgdl = sum(len(t) for t in docs.values()) / n
    sidf = math.log(1 + (n - df_a + 0.5) / (df_a + 0.5)) + math.log(
        1 + (n - df_b + 0.5) / (df_b + 0.5)
    )
    one = span_or(spark, pos_index, ["data", "window"], k=1).collect()[0]
    ptf, dl = one["phrase_tf"], len(docs[one["docid"]])
    exp = sidf * ptf * 2.2 / (ptf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert one["score"] == pytest.approx(exp)
    # absent clause contributes nothing; all-absent -> empty
    assert span_or(spark, pos_index, ["zzznope"], k=None).collect() == []


def test_span_not_window_exclusion(spark, documents, pos_index):
    from es_indexer_spark.query.phrase import span_not

    docs = {r["doc_id"]: tokenize_one(r["text"]) for r in documents.collect()}

    def brute(pre, post):
        out = {}
        for d, toks in docs.items():
            inc = [i for i, t in enumerate(toks) if t == "data"]
            exc = [i for i, t in enumerate(toks) if t == "stream"]
            keep = [
                p for p in inc
                if not any(p - pre <= q <= p + post for q in exc)
            ]
            if keep:
                out[d] = len(keep)
        return out

    for pre, post in ((0, 1), (1, 1), (2, 0)):
        got = {
            r["docid"]: r["phrase_tf"]
            for r in span_not(
                spark, pos_index, "data", "stream", pre=pre, post=post, k=None
            ).collect()
        }
        assert got == brute(pre, post), (pre, post)
    # pre=post=0 on single-term spans excludes nothing (distinct positions)
    all_data = {
        r["docid"]: r["phrase_tf"]
        for r in span_not(spark, pos_index, "data", "stream", k=None).collect()
    }
    assert all_data == brute(0, 0) == {
        d: toks.count("data") for d, toks in docs.items() if "data" in toks
    }
    with pytest.raises(ValueError):
        span_not(spark, pos_index, "data stream", "x")
    with pytest.raises(ValueError):
        span_not(spark, pos_index, "data", "data")
    # missing include term -> empty
    assert span_not(spark, pos_index, "zzznope", "data", k=None).collect() == []


# ---------------------------------------------------------------- term suggester
def test_suggest_terms_missing_mode(spark, documents, pos_index):
    from es_indexer_spark.query.suggest import suggest_terms

    # 'strem' is a typo (absent); 'data' is present -> only 'strem' suggests
    out = suggest_terms(spark, pos_index, "data strem", max_edits=2).collect()
    inputs = {r["input"] for r in out}
    assert inputs == {"strem"}
    assert out[0]["term"] == "stream" and out[0]["edits"] == 1
    # ranking: edits asc, then df desc, then term asc; all within max_edits
    ranks = [(r["edits"], -r["df"], r["term"]) for r in out]
    assert ranks == sorted(ranks)
    assert all(r["edits"] <= 2 for r in out)
    # prefix_length pins the first char: 'xtream' (x-prefix) gets nothing
    assert suggest_terms(spark, pos_index, "xtream").collect() == []
    # short tokens skipped (min_word_length=4)
    assert suggest_terms(spark, pos_index, "dat").collect() == []
    # suggest_mode='popular' is implemented since round 5h (see
    # tests/test_fuzzy_transpositions.py); unknown modes still raise
    with pytest.raises(ValueError):
        suggest_terms(spark, pos_index, "x", suggest_mode="frequent")


def test_suggest_terms_always_mode_micro(spark, tmp_path):
    from es_indexer_spark.query.suggest import suggest_terms

    rows = [(0, "stream stream"), (1, "streams"), (2, "steam"), (3, "diverge")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "suggidx")
    build_index(spark, docs, root, content_col="text", id_col="doc_id",
                tokenizer="standard", n_buckets=2, shard_size=16,
                n_ckpt_batches=1)
    # missing mode: 'stream' is present -> nothing suggested
    assert suggest_terms(spark, root, "stream").collect() == []
    # always mode: both 1-edit neighbors, never the token itself
    alw = suggest_terms(spark, root, "stream", suggest_mode="always").collect()
    assert [(r["term"], r["edits"]) for r in alw] == [("steam", 1), ("streams", 1)]


def test_highlight_phrase_whole_unit(spark, documents, tmp_path_factory):
    """The phrase occurrence tags as ONE unit; per-term tags would split it."""
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.highlight import highlight_phrase

    root = str(tmp_path_factory.mktemp("idx_hlp"))
    build_index(
        spark, documents, root, content_col="text", id_col="doc_id",
        meta_cols=("lang",), tokenizer="standard", n_buckets=4,
        shard_size=100, n_ckpt_batches=1, store_positions=True,
    )
    rows = highlight_phrase(
        spark, root, documents, "doc_id", "text", "data stream", k=5
    ).collect()
    assert rows
    for r in rows:
        assert "<em>" in r["fragment"]
        # the tag wraps the WHOLE phrase: opening tag followed by 'data',
        # then the separator and 'stream', then the closing tag
        import re

        assert re.search(
            r"<em>data[^a-zA-Z0-9]+stream</em>", r["fragment"], re.I
        ), r["fragment"]
        assert "<em>data</em>" not in r["fragment"].lower()


# ------------------------------------------- round 5h: ES phrase suggester

def _phrase_sugg_brute(toks, text, *, size=5, max_edits=2, prefix_length=1,
                       candidates_per_term=5, rwel=0.95, confidence=1.0,
                       alpha=0.5):
    """Independent replay of suggest_phrase over the tokenized corpus:
    candidate generation (term-suggester rules), REAL bigram counts, the
    Laplace bigram LM × channel prior, the confidence gate."""
    import itertools
    from collections import Counter

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cf = Counter(t for ts in toks.values() for t in ts)
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    big = Counter()
    for ts in toks.values():
        for x, y in zip(ts, ts[1:]):
            big[(x, y)] += 1
    V, N = float(len(cf)), float(sum(cf.values()))
    tokens = text.split()
    cands = []
    for tok in tokens:
        cl = []
        if tok in cf:
            cl.append((tok, cf[tok], rwel))
        pool = [
            v for v in cf
            if v != tok and v.startswith(tok[:prefix_length])
            and len(tok) - max_edits <= len(v) <= len(tok) + max_edits
            and lev(v, tok) <= max_edits
        ]
        pool.sort(key=lambda v: (lev(v, tok), -df[v], v))
        for v in pool[:candidates_per_term]:
            cl.append((v, cf[v], 1.0 - lev(v, tok) / max(len(tok), len(v))))
        if not cl:
            return []
        cands.append(cl)

    def score(combo):
        t0, c0, p0 = combo[0]
        s = (c0 + alpha) / (N + alpha * V) * p0
        for i in range(1, len(combo)):
            ti, _ci, pi = combo[i]
            tp, cp, _ = combo[i - 1]
            s = s * ((big.get((tp, ti), 0) + alpha) / (cp + alpha * V)) * pi
        return s

    inp = None
    if all(t in cf for t in tokens):
        inp = score(tuple((t, cf[t], rwel) for t in tokens))
    rows = []
    for combo in itertools.product(*cands):
        s = score(combo)
        if inp is not None and not s > confidence * inp:
            continue
        rows.append((" ".join(c[0] for c in combo), s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:size]


def test_suggest_phrase_brute_parity(spark, documents, pos_index):
    from es_indexer_spark.query.suggest import suggest_phrase

    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    for text in ("dat stream", "custmer data", "strea procesing"):
        got = [
            (r["suggestion"], r["score"])
            for r in suggest_phrase(spark, pos_index, text, size=5).collect()
        ]
        want = _phrase_sugg_brute(toks, text, size=5)
        assert [g[0] for g in got] == [w[0] for w in want], text
        for (gs, ws) in zip((g[1] for g in got), (w[1] for w in want)):
            assert gs == pytest.approx(ws, rel=1e-12), text
    # at least one typo actually corrects
    got = suggest_phrase(spark, pos_index, "dat stream", size=5).collect()
    assert got and got[0]["suggestion"] == "data stream"


def test_suggest_phrase_confidence_gate(spark, pos_index):
    from es_indexer_spark.query.suggest import suggest_phrase

    # a well-spelled frequent phrase: nothing beats it at confidence 1.0
    assert suggest_phrase(spark, pos_index, "data stream").count() == 0
    # confidence 0 returns alternatives (including lower-scoring ones)
    assert suggest_phrase(
        spark, pos_index, "data stream", confidence=0.0, size=10
    ).count() > 0


def test_suggest_phrase_requires_positions(spark, documents, tmp_path):
    from es_indexer_spark.query.suggest import suggest_phrase

    root = str(tmp_path / "nopos")
    build_index(
        spark, documents.limit(50), root, content_col="text",
        id_col="doc_id", tokenizer="standard", n_buckets=2, shard_size=100,
        n_ckpt_batches=1, store_positions=False,
    )
    with pytest.raises(ValueError, match="store_positions"):
        suggest_phrase(spark, root, "dat stream")


def test_suggest_phrase_dsl_dispatch(spark, pos_index):
    from es_indexer_spark.query.dsl import suggest as dsl_suggest
    from es_indexer_spark.query.suggest import suggest_phrase

    out = dsl_suggest(spark, pos_index, {"suggest": {"dym": {
        "text": "dat stream",
        "phrase": {"size": 3, "confidence": 1.0,
                   "direct_generator": [{"max_edits": 2, "prefix_length": 1}]},
    }}})
    want = suggest_phrase(spark, pos_index, "dat stream", size=3)
    assert [tuple(r) for r in out["dym"].collect()] == \
           [tuple(r) for r in want.collect()]
