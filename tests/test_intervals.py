"""ES ``intervals`` query + ``combined_fields`` (BM25F) tests.

The interval tests pit the vectorized shard evaluator (query/intervals.py —
flat packed-key searchsorted algebra) against an independent per-doc
brute-force evaluator written directly from the documented semantics (greedy
ordered chains, permutation unions, minimality, filter rules). The
combined_fields tests recompute the pseudo-field BM25F by hand in pandas."""

from __future__ import annotations

import math
from itertools import permutations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.analysis.tokenizer import standard_tokenize_series
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.intervals import (
    intervals_query,
    span_containing,
    span_within,
)


@pytest.fixture(scope="module")
def pos_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivx"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", tokenizer="standard",
        n_buckets=4, shard_size=100, n_ckpt_batches=2, store_positions=True,
    )
    return root


@pytest.fixture(scope="module")
def corpus_tokens(documents):
    rows = documents.select("doc_id", "text").collect()
    toks = standard_tokenize_series(pd.Series([r["text"] for r in rows]))
    return {r["doc_id"]: list(tl) for r, tl in zip(rows, toks)}


# --------------------------------------------------------- brute reference
def _minimalize(iv):
    iv = sorted(set(iv))
    out = []
    for s, e in iv:
        # drop any previously kept interval that contains (s, e); skip (s, e)
        # if a kept interval is contained in it
        if any(s2 >= s and e2 <= e for s2, e2 in out if (s2, e2) != (s, e)):
            continue
        out = [(s2, e2) for s2, e2 in out if not (s2 <= s and e2 >= e)]
        out.append((s, e))
    # one more pass: keep only non-containing
    return sorted(
        (s, e)
        for s, e in out
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in out)
    )


def _brute_chain(children, max_gaps):
    """Greedy ordered chain over minimal child interval lists (per doc)."""
    out = []
    for s0, e0 in children[0]:
        cur_e, widths, dead = e0, e0 - s0 + 1, False
        for ch in children[1:]:
            nxt = [(s, e) for s, e in ch if s > cur_e]
            if not nxt:
                dead = True
                break
            s, e = min(nxt)
            cur_e, widths = e, widths + (e - s + 1)
        if dead:
            continue
        if max_gaps >= 0 and (cur_e - s0 + 1) - widths > max_gaps:
            continue
        out.append((s0, cur_e))
    return _minimalize(out)


def _brute_eval(spec, toks):
    """Per-doc reference evaluator; positions are token-list indices."""
    if "match" in spec:
        terms = spec["match"].split()
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            iv = []
        elif len(terms) == 1:
            iv = [(p, p) for p in pos[terms[0]]]
        else:
            mg = int(spec.get("max_gaps", -1))
            orders = (
                [terms]
                if spec.get("ordered", False)
                else [list(p) for p in sorted(set(permutations(terms)))]
            )
            iv = []
            for order in orders:
                children = [[(p, p) for p in pos[t]] for t in order]
                iv.extend(_brute_chain(children, mg))
            iv = _minimalize(iv)
    elif "any_of" in spec:
        iv = _minimalize(
            [x for c in spec["any_of"] for x in _brute_eval(c, toks)]
        )
    elif "all_of" in spec:
        children = [_brute_eval(c, toks) for c in spec["all_of"]]
        if any(not c for c in children):
            iv = []
        else:
            mg = int(spec.get("max_gaps", -1))
            if spec.get("ordered", False):
                iv = _brute_chain(children, mg)
            else:
                iv = _minimalize(
                    [
                        x
                        for p in permutations(range(len(children)))
                        for x in _brute_chain([children[i] for i in p], mg)
                    ]
                )
    else:
        raise AssertionError(spec)
    for kind, frule in spec.get("filter", {}).items():
        fiv = _brute_eval(frule, toks)
        neg = kind.startswith("not_")
        base = kind[4:] if neg else kind
        def hit(s, e):
            if base == "containing":
                return any(fs >= s and fe <= e for fs, fe in fiv)
            if base == "contained_by":
                return any(fs <= s and fe >= e for fs, fe in fiv)
            if base == "overlapping":
                return any(fs <= e and fe >= s for fs, fe in fiv)
            if base == "before":
                return any(fs > e for fs, fe in fiv)
            if base == "after":
                return any(fe < s for fs, fe in fiv)
            raise AssertionError(base)
        iv = [(s, e) for s, e in iv if hit(s, e) != neg]
    return iv


SPECS = [
    {"match": "data stream", "ordered": True, "max_gaps": 0},
    {"match": "data stream", "ordered": True, "max_gaps": 3},
    {"match": "stream data", "ordered": False, "max_gaps": 2},
    {"match": "the data stream", "ordered": True},
    {"any_of": [{"match": "data stream", "ordered": True, "max_gaps": 1},
                {"match": "batch window", "ordered": True, "max_gaps": 1}]},
    {"all_of": [{"match": "data"}, {"match": "window"}],
     "ordered": True, "max_gaps": 8},
    {"all_of": [{"match": "window"}, {"match": "data"}],
     "ordered": False, "max_gaps": 5},
    {"match": "data", "filter": {"containing": {"match": "data"}}},
    {"match": "the data", "ordered": True, "max_gaps": 6,
     "filter": {"containing": {"match": "stream"}}},
    {"match": "data", "filter": {"contained_by": {
        "match": "the stream", "ordered": True, "max_gaps": 10}}},
    {"match": "data stream", "ordered": True, "max_gaps": 4,
     "filter": {"not_containing": {"match": "the"}}},
    {"match": "data", "filter": {"before": {"match": "stream"}}},
    {"match": "stream", "filter": {"after": {"match": "data"}}},
    {"match": "data stream", "ordered": True, "max_gaps": 2,
     "filter": {"overlapping": {"match": "the stream", "ordered": True,
                                "max_gaps": 2}}},
    {"match": "data stream", "ordered": True, "max_gaps": 2,
     "filter": {"not_overlapping": {"match": "the"}}},
]


@pytest.mark.parametrize("spec", SPECS)
def test_intervals_vs_brute(spark, pos_index, corpus_tokens, spec):
    got = {
        r["docid"]: r["phrase_tf"]
        for r in intervals_query(spark, pos_index, spec, k=None).collect()
    }
    want = {}
    for doc_id, toks in corpus_tokens.items():
        iv = _brute_eval(spec, toks)
        if iv:
            want[doc_id] = len(iv)
    assert got == want, f"spec={spec}"


def test_intervals_prefix_rule(spark, pos_index, corpus_tokens):
    got = {
        r["docid"]: r["phrase_tf"]
        for r in intervals_query(
            spark, pos_index,
            {"all_of": [{"match": "data"}, {"prefix": "str"}],
             "ordered": True, "max_gaps": 0},
            k=None,
        ).collect()
    }
    # brute: data followed directly by any token starting with 'str'
    want = {}
    for doc_id, toks in corpus_tokens.items():
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "data" and toks[i + 1].startswith("str")
        )
        if n:
            # brute counts chain starts; minimality keeps them all (width-2)
            want[doc_id] = n
    assert got == want


def test_intervals_score_formula(spark, pos_index, documents, corpus_tokens):
    spec = {"match": "data stream", "ordered": True, "max_gaps": 2}
    rows = intervals_query(spark, pos_index, spec, k=5).collect()
    assert rows
    n = documents.count()
    dls = {d: len(t) for d, t in corpus_tokens.items()}
    avgdl = sum(dls.values()) / n
    df1 = sum(1 for t in corpus_tokens.values() if "data" in t)
    df2 = sum(1 for t in corpus_tokens.values() if "stream" in t)
    sum_idf = math.log(1 + (n - df1 + 0.5) / (df1 + 0.5)) + math.log(
        1 + (n - df2 + 0.5) / (df2 + 0.5)
    )
    for r in rows:
        tf, dl = r["phrase_tf"], dls[r["docid"]]
        want = sum_idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        assert r["score"] == pytest.approx(want, rel=1e-9)


def test_intervals_unknown_rule_raises(spark, pos_index):
    with pytest.raises(ValueError, match="unknown intervals rule"):
        intervals_query(spark, pos_index, {"mathc": "data"}, k=5).collect()


def test_span_containing_within(spark, pos_index, corpus_tokens):
    big, little, slop = ["the", "stream"], "data", 4
    got_c = {
        r["docid"]: r["phrase_tf"]
        for r in span_containing(
            spark, pos_index, big, little, slop=slop, k=None
        ).collect()
    }
    got_w = {
        r["docid"]: r["phrase_tf"]
        for r in span_within(
            spark, pos_index, little, big, slop=slop, k=None
        ).collect()
    }
    want_c, want_w = {}, {}
    for doc_id, toks in corpus_tokens.items():
        big_iv = _brute_eval(
            {"match": "the stream", "ordered": True, "max_gaps": slop}, toks
        )
        lit = [(i, i) for i, x in enumerate(toks) if x == "data"]
        c = [
            (s, e) for s, e in big_iv if any(s <= p <= e for p, _ in lit)
        ]
        w = [
            (p, p) for p, _ in lit if any(s <= p <= e for s, e in big_iv)
        ]
        if c:
            want_c[doc_id] = len(c)
        if w:
            want_w[doc_id] = len(w)
    assert got_c == want_c
    assert got_w == want_w


# --------------------------------------------------------- combined_fields
@pytest.fixture(scope="module")
def multi_root(spark, documents, tmp_path_factory):
    from es_indexer_spark.query.multifield import build_multi_index

    root = str(tmp_path_factory.mktemp("cfx"))
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    docs = documents.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))
    build_multi_index(
        spark, docs, root,
        fields={"title": "title", "text": "text"}, id_col="doc_id",
        shard_size=100, n_buckets=4, n_ckpt_batches=2,
    )
    return root


def _brute_bm25f(corpus_tokens, query_terms, weights_by_field, fields_toks,
                 k1=1.2, b=0.75):
    n = len(corpus_tokens)
    # per-field df / avgdl; pseudo stats per module contract
    df_star, avgdl_c = {}, 0.0
    for f_, w in weights_by_field.items():
        toks_f = fields_toks[f_]
        avgdl_c += w * (sum(len(t) for t in toks_f.values()) / n)
        for t in query_terms:
            d = sum(1 for tl in toks_f.values() if t in tl)
            df_star[t] = max(df_star.get(t, 0), d)
    scores = {}
    for doc in corpus_tokens:
        dlc = sum(
            w * len(fields_toks[f_][doc]) for f_, w in weights_by_field.items()
        )
        s = 0.0
        for t in query_terms:
            if df_star.get(t, 0) == 0:
                continue
            tfc = sum(
                w * fields_toks[f_][doc].count(t)
                for f_, w in weights_by_field.items()
            )
            if tfc == 0:
                continue
            idf = math.log(1 + (n - df_star[t] + 0.5) / (df_star[t] + 0.5))
            s += idf * tfc * (k1 + 1) / (tfc + k1 * (1 - b + b * dlc / avgdl_c))
        if s > 0:
            scores[doc] = s
    return scores


def test_combined_fields_vs_brute(spark, multi_root, corpus_tokens):
    from es_indexer_spark.query.multifield import combined_fields

    weights = {"title": 2.0, "text": 1.0}
    fields_toks = {
        "text": corpus_tokens,
        "title": {d: t[:8] for d, t in corpus_tokens.items()},
    }
    got = combined_fields(
        spark, multi_root, "data stream", weights=weights, k=10
    ).collect()
    want = _brute_bm25f(
        corpus_tokens, ["data", "stream"], weights, fields_toks
    )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r["docid"] for r in got] == [d for d, _ in ranked]
    for r, (_, s) in zip(got, ranked):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_combined_fields_validations(spark, multi_root):
    from es_indexer_spark.query.multifield import combined_fields

    with pytest.raises(ValueError, match="positive"):
        combined_fields(spark, multi_root, "x", weights={"text": -1.0})
    with pytest.raises(ValueError, match="at least one"):
        combined_fields(spark, multi_root, "x", weights={})
