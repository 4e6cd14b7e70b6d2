"""span_multi (prefix wrapper) inside span_near — brute parity and the
degeneration to plain span_near.
"""

from __future__ import annotations

import math

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.phrase import span_multi_near, span_near

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def pos_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_spanmulti"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    return root, toks


def _rows(df):
    return [(r["docid"], r["phrase_tf"], r["score"]) for r in df.collect()]


def test_no_wildcard_equals_span_near(spark, pos_index):
    root, _ = pos_index
    got = _rows(span_multi_near(spark, root, ["data", "stream"], slop=1, k=None))
    exp = _rows(span_near(spark, root, ["data", "stream"], slop=1, k=None))
    assert sorted(got) == sorted(exp) and got


def _brute_chain(toks, slots, slop):
    """Greedy ordered chain over per-slot acceptable-term sets."""
    out = {}
    for d, ts in toks.items():
        pos = [
            [i for i, t in enumerate(ts) if any(
                t == s or (s.endswith("*") and t.startswith(s[:-1])) for s in slot
            )]
            for slot in slots
        ]
        cnt = 0
        for s in pos[0]:
            cur, ok = s, True
            for nxt in pos[1:]:
                cand = [p for p in nxt if p > cur]
                if not cand or (min(cand) - s) - (len(slots) - 1) > slop:
                    ok = False
                    break
                cur = min(cand)
            if ok:
                cnt += 1
        if cnt:
            out[d] = cnt
    return out


def test_prefix_slot_brute(spark, pos_index):
    root, toks = pos_index
    got = _rows(span_multi_near(spark, root, ["data", "s*"], slop=2, k=None))
    tf = _brute_chain(toks, [["data"], ["s*"]], 2)
    n = len(toks)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    df1 = sum(1 for ts in toks.values() if "data" in ts)
    svocab = {t for ts in toks.values() for t in ts if t.startswith("s")}
    dfu = min(n, sum(
        sum(1 for ts in toks.values() if v in ts) for v in svocab
    ))
    sum_idf = math.log(1 + (n - df1 + 0.5) / (df1 + 0.5)) + math.log(
        1 + (n - dfu + 0.5) / (dfu + 0.5)
    )
    exp = {}
    for d, c in tf.items():
        exp[d] = (d, c, sum_idf * c * (K1 + 1) / (c + K1 * (1 - B + B * dls[d] / avgdl)))
    assert {g[0] for g in got} == set(exp)
    for d, c, s in got:
        assert c == exp[d][1]
        assert s == pytest.approx(exp[d][2], rel=1e-9)


def test_unordered_multi(spark, pos_index):
    """in_order=False accepts the reversed slot order too."""
    root, toks = pos_index
    got = {r[0] for r in _rows(
        span_multi_near(spark, root, ["s*", "data"], slop=1, in_order=False, k=None)
    )}
    fwd = _brute_chain(toks, [["s*"], ["data"]], 1)
    rev = _brute_chain(toks, [["data"], ["s*"]], 1)
    assert got == set(fwd) | set(rev) and got


def test_absent_prefix_empty(spark, pos_index):
    root, _ = pos_index
    assert span_multi_near(spark, root, ["data", "zzzqqq*"], k=None).count() == 0
