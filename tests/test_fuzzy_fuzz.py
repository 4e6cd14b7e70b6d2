"""Randomized fuzzy-query differential fuzz: hypothesis mutates real
corpus tokens (substitute / insert / delete / adjacent-swap) and sweeps
fuzziness, prefix_length and the transpositions flag; `fuzzy_topk` must
match a pure-Python reimplementation of the documented semantics —
dictionary expansion within the edit budget (prefix guard, length window,
top-max_expansions by df desc / term asc), each expansion's BM25
contribution damped by the Lucene similarity boost
``1 - distance / max(len)``. Classic Levenshtein and unrestricted
Damerau-Levenshtein both covered."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.engine import fuzzy_topk

K1, B = 1.2, 0.75
BASES = ["data", "stream", "spark", "window", "customer", "batch", "index"]


@pytest.fixture(scope="module")
def fz_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_fzfuzz"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    return root, toks, df


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _damerau(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (== DuckDB's)."""
    da = {}
    maxd = len(a) + len(b)
    d = [[0] * (len(b) + 2) for _ in range(len(a) + 2)]
    d[0][0] = maxd
    for i in range(len(a) + 1):
        d[i + 1][0], d[i + 1][1] = maxd, i
    for j in range(len(b) + 1):
        d[0][j + 1], d[1][j + 1] = maxd, j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k, l = da.get(b[j - 1], 0), db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost, d[i + 1][j] + 1, d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


def _mutate(base: str, ops: list[tuple[int, int, str]]) -> str:
    s = base
    for kind, pos, ch in ops:
        if not s:
            break
        p = pos % len(s)
        if kind == 0:    # substitute
            s = s[:p] + ch + s[p + 1:]
        elif kind == 1:  # insert
            s = s[:p] + ch + s[p:]
        elif kind == 2 and len(s) > 2:  # delete
            s = s[:p] + s[p + 1:]
        elif kind == 3 and p + 1 < len(s):  # adjacent swap
            s = s[:p] + s[p + 1] + s[p] + s[p + 2:]
    return s


CASE = st.fixed_dictionaries({
    "base": st.sampled_from(BASES),
    "ops": st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9),
                  st.sampled_from("abcdxyz")),
        max_size=2),
    "fuzziness": st.integers(1, 2),
    "prefix_length": st.integers(0, 1),
    "transpositions": st.booleans(),
})


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(CASE)
def test_fuzzy_topk_matches_brute(spark, fz_index, case):
    root, toks, df = fz_index
    q = _mutate(case["base"], case["ops"])
    fz, pl, tr = case["fuzziness"], case["prefix_length"], case["transpositions"]
    dist = _damerau if tr else _lev

    got = [
        (r["docid"], round(r["score"], 6))
        for r in fuzzy_topk(
            spark, root, q, k=600, fuzziness=fz, prefix_length=pl,
            transpositions=tr,
        ).collect()
    ]

    # brute expansion: prefix + edit budget, top-50 by df desc / term asc
    prefix = q[:pl]
    cands = [
        (t, n) for t, n in df.items()
        if t.startswith(prefix)
        and abs(len(t) - len(q)) <= fz and dist(q, t) <= fz
    ]
    cands.sort(key=lambda x: (-x[1], x[0]))
    cands = cands[:50]
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    exp = {}
    for term, dfe in cands:
        boost = 1.0 - dist(q, term) / max(len(q), len(term))
        idf = math.log(1 + (n - dfe + 0.5) / (dfe + 0.5))
        for d, t in toks.items():
            tf = float(t.count(term))
            if tf:
                exp[d] = exp.get(d, 0.0) + (
                    boost * idf * tf * (K1 + 1)
                    / (tf + K1 * (1 - B + B * len(t) / avgdl))
                )
    want = sorted(
        ((d, round(s, 6)) for d, s in exp.items()),
        key=lambda x: (-x[1], x[0]),
    )
    got.sort(key=lambda x: (-x[1], x[0]))
    assert got == want
