"""ES 8 knn search (filter-during-search, similarity floor, hybrid sum) and
script_score — independent numpy/python references.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.ops.similarity import knn_hybrid_topk, knn_search
from es_indexer_spark.query.boolean import bool_query
from es_indexer_spark.query.engine import script_score_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding", "label").collect()
    return {
        r["vec_id"]: (np.asarray(r["embedding"], dtype=np.float64), r["label"])
        for r in rows
    }


@pytest.fixture(scope="module")
def ss_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_knn"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100, n_ckpt_batches=2,
    )
    return root


def _cosines(emb_np, q, pred=lambda lab: True):
    qn = np.linalg.norm(q)
    out = {}
    for vid, (v, lab) in emb_np.items():
        if pred(lab):
            out[vid] = float(v @ q / (np.linalg.norm(v) * qn))
    return out


def test_knn_filter_during_search(spark, emb, emb_np):
    """The filter prunes BEFORE the k cut: k survivors come back, and they
    are the top-k of the FILTERED set, not the filtered top-k."""
    q = emb_np[0][0]
    got = knn_search(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        [float(x) for x in q], k=10, filter_expr="label % 2 = 1",
    ).collect()
    cos = _cosines(
        {v: t for v, t in emb_np.items() if v != 0}, q,
        pred=lambda lab: lab % 2 == 1,
    )
    exp = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r["vec_id"] for r in got] == [v for v, _ in exp]
    assert len(got) == 10
    for r, (_, c) in zip(got, exp):
        assert r["cosine"] == pytest.approx(round(c, 6), abs=1e-6)
        assert r["score"] == pytest.approx(round((1 + c) / 2, 6), abs=1e-6)
    # post-filtering the unfiltered top-10 would yield fewer/different docs
    unfiltered = knn_search(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        [float(x) for x in q], k=10,
    ).collect()
    post = [r["vec_id"] for r in unfiltered if emb_np[r["vec_id"]][1] % 2 == 1]
    assert post != [r["vec_id"] for r in got]


def test_knn_similarity_floor(spark, emb, emb_np):
    q = emb_np[0][0]
    got = knn_search(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        [float(x) for x in q], k=500, similarity=0.3,
    ).collect()
    cos = _cosines({v: t for v, t in emb_np.items() if v != 0}, q)
    exp_n = sum(1 for c in cos.values() if c >= 0.3)
    assert len(got) == exp_n
    assert all(r["cosine"] >= 0.3 for r in got)


def test_knn_hybrid_sum(spark, emb, emb_np, ss_index):
    """hybrid score = query_boost*BM25 + knn_boost*(1+cos)/2 for the knn
    top-knn_k, summed per doc — checked against the sides computed alone."""
    q = emb_np[0][0]
    got = knn_hybrid_topk(
        spark, ss_index, "data stream", emb, "vec_id", "embedding",
        [float(x) for x in q], k=20, knn_k=5, query_boost=1.5, knn_boost=3.0,
    ).collect()
    bm = {
        r["docid"]: r["score"] * 1.5
        for r in bool_query(spark, ss_index, should=["data stream"], k=None).collect()
    }
    cos = _cosines(emb_np, q)
    kn_top = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    kn = {v: 3.0 * round((1 + c) / 2, 6) for v, c in kn_top}
    comb: dict[int, float] = {}
    for d, s in bm.items():
        comb[d] = comb.get(d, 0.0) + s
    for d, s in kn.items():
        comb[d] = comb.get(d, 0.0) + s
    exp = sorted(
        ((d, round(s, 6)) for d, s in comb.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    assert [(r["docid"], r["score"]) for r in got] == [
        (d, pytest.approx(s, abs=2e-6)) for d, s in exp
    ]


def test_script_score_matches_manual(spark, ss_index, documents):
    nch = {r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()}
    base = {
        r["docid"]: r["score"]
        for r in bool_query(spark, ss_index, should=["data stream"], k=None).collect()
    }
    exp = sorted(
        ((d, round(s * math.sqrt(nch[d]) / 10, 6)) for d, s in base.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = script_score_topk(
        spark, ss_index, "data stream", "_score * sqrt(n_chars) / 10",
        fields=("n_chars",), k=10,
    ).collect()
    assert [(r["docid"], r["score"]) for r in got] == [
        (d, pytest.approx(s, abs=2e-6)) for d, s in exp
    ]


def test_script_score_score_only_and_min_score(spark, ss_index):
    """A script over _score alone needs no docs-store join; min_score drops
    rescored matches below the bound."""
    all_rows = script_score_topk(
        spark, ss_index, "data stream", "1.0 / (1.0 + exp(-_score))", k=500,
    ).collect()
    assert all_rows and all(0.5 <= r["score"] <= 1.0 for r in all_rows)
    floor = (all_rows[0]["score"] + all_rows[-1]["score"]) / 2
    kept = script_score_topk(
        spark, ss_index, "data stream", "1.0 / (1.0 + exp(-_score))",
        k=500, min_score=floor,
    ).collect()
    assert 0 < len(kept) < len(all_rows)
    assert all(r["score"] >= floor for r in kept)


def test_rrf_fusion_brute(spark, emb, emb_np, ss_index):
    """RRF = sum of 1/(rank_constant + rank) over the two retrievers' top
    rank_window_size rows — checked against ranks computed independently."""
    from es_indexer_spark.ops.similarity import rrf_topk

    q = emb_np[0][0]
    got = rrf_topk(
        spark, ss_index, "data stream", emb, "vec_id", "embedding",
        [float(x) for x in q], k=15, rank_constant=10, rank_window_size=20,
    ).collect()
    bm = sorted(
        (
            (r["docid"], r["score"])
            for r in bool_query(spark, ss_index, should=["data stream"], k=20).collect()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    cos = _cosines(emb_np, q)
    kn = sorted(
        ((v, round(c, 6)) for v, c in cos.items()), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    comb: dict[int, float] = {}
    for i, (d, _) in enumerate(bm, start=1):
        comb[d] = comb.get(d, 0.0) + 1.0 / (10 + i)
    for i, (d, _) in enumerate(kn, start=1):
        comb[d] = comb.get(d, 0.0) + 1.0 / (10 + i)
    exp = sorted(
        ((d, round(s, 8)) for d, s in comb.items()), key=lambda kv: (-kv[1], kv[0])
    )[:15]
    assert [(r["docid"], r["score"]) for r in got] == exp


def test_knn_hybrid_over_bool_body(spark, emb, emb_np, ss_index):
    """Round 5f: the DSL knn section next to a BOOL query — the text side is
    the bool's FULL match set, combination unchanged (sum of boosted
    contributions)."""
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.dsl import search

    q = emb_np[0][0].tolist()
    body = {
        "query": {"bool": {"must": [{"match": {"text": "data"}}],
                           "should": [{"match": {"text": "stream"}}]}},
        "knn": {"field": "embedding", "query_vector": q, "k": 5, "boost": 2.0},
        "size": 8,
    }
    got = [
        (r["docid"], round(r["score"], 6))
        for r in search(spark, ss_index, body, emb_df=emb).collect()
    ]
    matches = bool_query(spark, ss_index, must=["data"], should=["stream"], k=None)
    ref = [
        (r["docid"], round(r["score"], 6))
        for r in knn_hybrid_topk(
            spark, ss_index, "", emb, "vec_id", "embedding", q,
            k=8, knn_k=5, knn_boost=2.0, matches=matches,
        ).collect()
    ]
    assert got == ref and got
    # bm-only docs and knn-only docs both present (sparse union semantics)
    bm_only = {d for d, _ in got}
    assert bm_only


def test_knn_hybrid_unsupported_section_raises(spark, emb, ss_index):
    from es_indexer_spark.query.dsl import search

    q = [0.0] * len(emb.select("embedding").first()["embedding"])
    with pytest.raises(ValueError, match="hybrid knn"):
        search(spark, ss_index, {
            "query": {"wildcard": {"text": {"value": "spa*"}}},
            "knn": {"field": "embedding", "query_vector": q, "k": 3},
        }, emb_df=emb)
