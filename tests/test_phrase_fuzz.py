"""Randomized phrase/slop differential fuzz for the positional engine:
hypothesis draws 2–4-term phrases from real corpus tokens (duplicates
allowed) and slop 0–3, and replays membership + ``phrase_tf`` against a
pure-Python greedy-successor-chain reference over the tokenized corpus —
the documented ordered-slop semantics (`query/phrase.py`), generalized
beyond the 14 fixed brute-parity cases. Distinct-term phrases also check
the full Lucene-PhraseQuery score (Σidf × BM25_sat(phrase_tf))."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.phrase import phrase_match

K1, B = 1.2, 0.75
TOKENS = ["data", "stream", "the", "key", "batch", "spark", "join",
          "window", "index", "a", "of"]


@pytest.fixture(scope="module")
def ph_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_phfuzz"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    return root, toks


def _chain_tf(t: list[str], terms: list[str], slop: int) -> int:
    """Greedy min-successor chain count of matching start positions."""
    pos = {}
    for term in set(terms):
        pos[term] = [i for i, x in enumerate(t) if x == term]
    if any(not pos[term] for term in terms):
        return 0
    import bisect

    n = 0
    for p0 in pos[terms[0]]:
        prev, ok = p0, True
        for term in terms[1:]:
            lst = pos[term]
            i = bisect.bisect_right(lst, prev)
            if i == len(lst):
                ok = False
                break
            prev = lst[i]
        if ok and (prev - p0) - (len(terms) - 1) <= slop:
            n += 1
    return n


PHRASE = st.tuples(
    st.lists(st.sampled_from(TOKENS), min_size=2, max_size=4),
    st.integers(min_value=0, max_value=3),
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(PHRASE)
def test_phrase_slop_matches_chain_brute(spark, ph_index, case):
    terms, slop = case
    root, toks = ph_index
    got = {
        r["docid"]: (r["phrase_tf"], r["score"])
        for r in phrase_match(spark, root, " ".join(terms), k=None,
                              slop=slop).collect()
    }
    want_tf = {
        d: tf for d, t in toks.items()
        if (tf := _chain_tf(t, terms, slop)) > 0
    }
    assert {d: tf for d, (tf, _s) in got.items()} == want_tf

    if len(set(terms)) == len(terms) and want_tf:
        # distinct terms: full PhraseQuery score check
        n = len(toks)
        avgdl = sum(len(t) for t in toks.values()) / n
        idf_sum = 0.0
        for term in terms:
            df = sum(1 for t in toks.values() if term in t)
            idf_sum += math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, (tf, s) in got.items():
            dl = float(len(toks[d]))
            want_s = (idf_sum * tf * (K1 + 1)
                      / (tf + K1 * (1 - B + B * dl / avgdl)))
            assert s == pytest.approx(want_s)
