"""sparse_vector / text_expansion query: weighted impact dot product over
the postings — brute-force parity, ES pruning rule, delete semantics."""

from __future__ import annotations

import os
import re
from collections import Counter, defaultdict

import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.sparsevec import prune_tokens, sparse_vector_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
W = {"data": 1.5, "stream": 0.7, "batch": 1.1, "zzz_absent_term": 3.0}


@pytest.fixture(scope="module")
def sv_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_sv"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang",),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=False,
    )
    return root


@pytest.fixture(scope="module")
def brute(documents):
    """score(d) = sum_t w_t * tf(t, d) over the standard analysis."""
    rows = documents.select("doc_id", "text").collect()
    scores = defaultdict(float)
    for r in rows:
        tf = Counter(
            t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if t
        )
        s = sum(w * tf[t] for t, w in W.items() if t in tf)
        if s != 0.0:
            scores[r["doc_id"]] = s
    return scores


def _pairs(df):
    return [(r["docid"], round(r["score"], 9)) for r in df.collect()]


def test_topk_brute_parity(spark, sv_index, brute):
    got = _pairs(sparse_vector_topk(spark, sv_index, W, k=15))
    want = sorted(
        ((d, round(s, 9)) for d, s in brute.items()),
        key=lambda p: (-p[1], p[0]),
    )[:15]
    assert got == want


def test_all_matches_k_none(spark, sv_index, brute):
    got = dict(_pairs(sparse_vector_topk(spark, sv_index, W, k=None)))
    assert got == {d: round(s, 9) for d, s in brute.items()}


def test_unknown_tokens_and_empty(spark, sv_index):
    assert sparse_vector_topk(spark, sv_index, {"zzz_absent_term": 9.0}).count() == 0
    assert sparse_vector_topk(spark, sv_index, {}).count() == 0


def test_prune_rule_both_conditions():
    # df outlier AND low weight -> pruned; df outlier with HIGH weight kept;
    # low-df low-weight kept (freq condition fails)
    dfs = {"the": 10_000.0, "data": 100.0, "rare": 2.0,
           "a": 10.0, "b": 10.0, "c": 10.0, "d": 10.0}
    w = {"the": 0.1, "data": 1.0, "rare": 0.05,
         "a": 0.5, "b": 0.5, "c": 0.5, "d": 0.5}
    kept = prune_tokens(w, dfs)
    assert "the" not in kept and "data" in kept and "rare" in kept
    # same outlier with a big weight survives the AND
    kept2 = prune_tokens({**w, "the": 0.9}, dfs)
    assert "the" in kept2


def test_prune_changes_query(spark, sv_index, brute):
    # 'stream' has the highest df of the three on this corpus (394 vs 386
    # vs 379) — with ratio 1.0 it is the only above-mean token, so a weight
    # below the cut prunes exactly it
    low = {"stream": 0.01, "data": 1.0, "batch": 1.0}
    pruned = sparse_vector_topk(
        spark, sv_index, low, k=None, prune=True,
        tokens_freq_ratio_threshold=1.0, tokens_weight_threshold=0.5,
    )
    unpruned = sparse_vector_topk(spark, sv_index, low, k=None)
    manual = sparse_vector_topk(
        spark, sv_index, {"data": 1.0, "batch": 1.0}, k=None
    )
    assert _pairs(pruned) == _pairs(manual)
    assert _pairs(pruned) != _pairs(unpruned)


def test_deletes_flow_through(spark, documents, tmp_path):
    from es_indexer_spark.index.tombstones import delete_docs

    root = str(tmp_path / "idx")
    build_index(
        spark, documents, root, content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=1,
    )
    before = _pairs(sparse_vector_topk(spark, root, W, k=10))
    top = before[0][0]
    delete_docs(spark, root, [top])
    after = _pairs(sparse_vector_topk(spark, root, W, k=10))
    assert top not in {d for d, _ in after}
    # survivors keep bit-identical scores (live-docs semantics)
    assert after[: len(before) - 1] == [p for p in before if p[0] != top][:9]


def test_search_after_pages(spark, sv_index):
    p1_rows = sparse_vector_topk(spark, sv_index, W, k=8).collect()
    cur = (p1_rows[-1]["score"], p1_rows[-1]["docid"])  # raw float cursor
    p1 = [(r["docid"], round(r["score"], 9)) for r in p1_rows]
    p2 = _pairs(sparse_vector_topk(spark, sv_index, W, k=8, after=cur))
    assert p1 + p2 == _pairs(sparse_vector_topk(spark, sv_index, W, k=16))
