"""``_rank_eval`` — metric math pinned against hand-computed values on a
controlled ranking, plus the end-to-end batched path (one topk_many scan for
all rated requests, rank-identical to per-query topk)."""

from __future__ import annotations

import math

import pytest

from es_indexer_spark.query.rankeval import rank_eval, rank_eval_hits


@pytest.fixture(scope="module")
def fixed(spark):
    # one query, 5 hits ranked by score desc: docids 10..50
    hits = spark.createDataFrame(
        [("q", 10, 5.0), ("q", 20, 4.0), ("q", 30, 3.0),
         ("q", 40, 2.0), ("q", 50, 1.0)],
        "qid string, docid long, score double",
    )
    # ratings: rank1 -> 3, rank3 -> 1, rank5 -> 0; one UNRETRIEVED relevant
    ratings = spark.createDataFrame(
        [("q", 10, 3), ("q", 30, 1), ("q", 50, 0), ("q", 99, 2)],
        "qid string, docid long, rating int",
    )
    return hits, ratings


def _one(df):
    r = df.collect()[0]
    return r["metric_score"], r["rated_in_topk"], r["unrated_in_topk"]


def test_precision_and_recall(spark, fixed):
    hits, ratings = fixed
    # relevant (>=1) retrieved: ranks 1,3 -> 2 of 5 retrieved
    s, rated, unrated = _one(
        rank_eval_hits(spark, hits, ratings, {"precision": {"k": 5}})
    )
    assert (s, rated, unrated) == (round(2 / 5, 6), 3, 2)
    # k=2 cut: only rank1 relevant among 2 retrieved
    s, _, _ = _one(rank_eval_hits(spark, hits, ratings, {"precision": {"k": 2}}))
    assert s == 0.5
    # threshold 3: only the rating-3 doc counts
    s, _, _ = _one(rank_eval_hits(
        spark, hits, ratings,
        {"precision": {"k": 5, "relevant_rating_threshold": 3}}))
    assert s == round(1 / 5, 6)
    # recall: total relevant = 3 (docids 10, 30, 99), retrieved 2
    s, _, _ = _one(rank_eval_hits(spark, hits, ratings, {"recall": {"k": 5}}))
    assert s == round(2 / 3, 6)


def test_mrr_dcg_ndcg_err(spark, fixed):
    hits, ratings = fixed
    s, _, _ = _one(rank_eval_hits(
        spark, hits, ratings, {"mean_reciprocal_rank": {"k": 5}}))
    assert s == 1.0  # first relevant at rank 1
    # threshold above every rating -> 0
    s, _, _ = _one(rank_eval_hits(
        spark, hits, ratings,
        {"mean_reciprocal_rank": {"k": 5, "relevant_rating_threshold": 9}}))
    assert s == 0.0
    # DCG@5 = 7/log2(2) + 1/log2(4) = 7 + 0.5
    s, _, _ = _one(rank_eval_hits(spark, hits, ratings, {"dcg": {"k": 5}}))
    assert s == 7.5
    # ideal ranking: ratings 3,2,1,0 -> IDCG = 7 + 3/log2(3) + 1/2 + 0
    idcg = 7 + 3 / math.log2(3) + 0.5
    s, _, _ = _one(rank_eval_hits(
        spark, hits, ratings, {"dcg": {"k": 5, "normalize": True}}))
    assert s == round(7.5 / idcg, 6)
    # ERR with max_relevance=3: p1=7/8 (rank1), p3=1/8 (rank3), others 0
    want = 7 / 8 + (1 / 8) / 3 * (1 - 7 / 8)
    s, _, _ = _one(rank_eval_hits(
        spark, hits, ratings,
        {"expected_reciprocal_rank": {"k": 5, "maximum_relevance": 3}}))
    assert s == round(want, 6)


def test_rank_eval_end_to_end_batched(spark, documents, tmp_path):
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.engine import topk

    root = str(tmp_path / "idx_re")
    build_index(
        spark, documents, root, content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100,
        n_ckpt_batches=2, resume=False,
    )
    q1, q2 = "spark join window", "data stream"
    top1 = [r["docid"] for r in topk(spark, root, q1, k=5, use_blockmax=False).collect()]
    top2 = [r["docid"] for r in topk(spark, root, q2, k=5, use_blockmax=False).collect()]
    requests = [
        # q1: ranks 1 and 3 relevant -> precision@5 = 0.4
        {"id": "q1", "request": {"query": {"match": {"content": q1}}},
         "ratings": [{"_id": top1[0], "rating": 2}, {"_id": top1[2], "rating": 1}]},
        # q2: nothing relevant rated -> 0
        {"id": "q2", "request": {"query": {"match": {"content": q2}}},
         "ratings": [{"_id": top2[1], "rating": 0}]},
        # q3: a query with zero matches still gets its row
        {"id": "q3", "request": {"query": {"match": {"content": "zzzqqqxxx"}}},
         "ratings": [{"_id": 1, "rating": 1}]},
    ]
    out = {r["qid"]: r for r in rank_eval(
        spark, root, requests, {"precision": {"k": 5}}).collect()}
    assert set(out) == {"q1", "q2", "q3"}
    assert out["q1"]["metric_score"] == round(2 / 5, 6)
    assert out["q1"]["rated_in_topk"] == 2
    assert out["q2"]["metric_score"] == 0.0
    assert out["q3"]["metric_score"] == 0.0 and out["q3"]["rated_in_topk"] == 0
    # non-match requests raise by name
    with pytest.raises(ValueError, match="rank_eval batches match"):
        rank_eval(spark, root, [{"id": "x", "request": {"query": {
            "term": {"lang": "en"}}}, "ratings": []}], {"precision": {}})
    with pytest.raises(ValueError, match="metric must be one of"):
        rank_eval(spark, root, requests, {"f_measure": {}})
