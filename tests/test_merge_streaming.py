"""Segment merge + incremental/streaming indexing.

Invariant under test: (build A) ⊕ (build B) merged == build(A ∪ B) for query
results — rank-identical docids-by-content and scores to float tolerance (scores
use the merged avgdl, which equals the union build's avgdl). The merge is a
metadata rewrite, so this also proves the offset/shard arithmetic."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.merge import merge_indexes
from es_indexer_spark.query.engine import topk
from es_indexer_spark.streaming import index_stream, make_batch_indexer

BUILD = dict(
    content_col="text", id_col=None, order_cols=("doc_id",), meta_cols=("doc_id",),
    tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=1,
)

QUERIES = ["spark join window", "data stream", "the", "vector"]


def _hits_by_content(spark, root, query, k=10):
    """(doc_id_from_meta, score) pairs — docids differ between merged and
    union-built indexes, so compare via the stable doc_id metadata column."""
    vdir = catalog.resolve(root)
    docs = spark.read.parquet(os.path.join(vdir, "docs")).select("docid", "doc_id")
    hits = topk(spark, root, query, k=k)
    rows = (
        hits.join(docs, "docid")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


@pytest.fixture(scope="module")
def halves(documents):
    a = documents.filter(F.col("doc_id") % 2 == 0)
    b = documents.filter(F.col("doc_id") % 2 == 1)
    return a, b


def test_merge_equals_union_build(spark, documents, halves, tmp_path_factory):
    a, b = halves
    root_a = str(tmp_path_factory.mktemp("seg") / "a")
    root_b = str(tmp_path_factory.mktemp("seg") / "b")
    root_u = str(tmp_path_factory.mktemp("seg") / "u")
    build_index(spark, a, root_a, **BUILD)
    build_index(spark, b, root_b, **BUILD)
    build_index(spark, documents, root_u, **BUILD)

    vdir = merge_indexes(spark, root_a, root_b)
    ms = catalog.read_stats(vdir)
    us = catalog.read_stats(catalog.resolve(root_u))
    assert ms["n_docs"] == us["n_docs"] == documents.count()
    assert ms["avgdl"] == pytest.approx(us["avgdl"], rel=1e-12)

    for q in QUERIES:
        got = _hits_by_content(spark, root_a, q)
        want = _hits_by_content(spark, root_u, q)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_merge_dict_is_additive(spark, halves, tmp_path):
    a, b = halves
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    va = build_index(spark, a, ra, **BUILD)
    vb = build_index(spark, b, rb, **BUILD)
    vdir = merge_indexes(spark, ra, rb)

    def dict_of(v):
        return {
            r["term"]: (r["df"], r["cf"])
            for r in spark.read.parquet(os.path.join(v, "dict")).collect()
        }

    merged, da, db = dict_of(vdir), dict_of(va), dict_of(vb)
    assert set(merged) == set(da) | set(db)
    for t, (df, cf) in merged.items():
        assert df == da.get(t, (0, 0))[0] + db.get(t, (0, 0))[0]
        assert cf == da.get(t, (0, 0))[1] + db.get(t, (0, 0))[1]


def test_merge_layout_mismatch_rejected(spark, halves, tmp_path):
    a, b = halves
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, ra, **BUILD)
    build_index(spark, b, rb, **{**BUILD, "n_buckets": 8})
    with pytest.raises(ValueError, match="layout mismatch"):
        merge_indexes(spark, ra, rb)


def test_batch_indexer_incremental_and_idempotent(spark, documents, halves, tmp_path):
    a, b = halves
    root = str(tmp_path / "inc")
    fn = make_batch_indexer(
        spark, root, content_col="text", id_col=None, order_cols=("doc_id",),
        meta_cols=("doc_id",), tokenizer="standard", n_buckets=4, shard_size=100,
    )
    fn(a, 0)  # first batch bootstraps the index
    n0 = catalog.read_stats(catalog.resolve(root))["n_docs"]
    assert n0 == a.count()
    fn(b, 1)  # second batch delta-builds + merges
    assert catalog.read_stats(catalog.resolve(root))["n_docs"] == documents.count()
    fn(b, 1)  # replayed batch id → idempotent no-op
    assert catalog.read_stats(catalog.resolve(root))["n_docs"] == documents.count()
    # result parity with a one-shot build over the union
    root_u = str(tmp_path / "u")
    build_index(spark, documents, root_u, **BUILD)
    for q in ["spark join window", "vector"]:
        assert [h[0] for h in _hits_by_content(spark, root, q)] == [
            h[0] for h in _hits_by_content(spark, root_u, q)
        ]


def test_batch_replay_after_lost_manifest_is_skipped(spark, halves, tmp_path):
    """Crash window between publish and manifest write (ADVICE r1): delete the
    batch manifest after a successful merge — the replayed batch must detect
    its id on the CURRENT version's _PUBLISHED record, recover the manifest,
    and NOT merge again (n_docs unchanged)."""
    a, b = halves
    root = str(tmp_path / "inc")
    fn = make_batch_indexer(
        spark, root, content_col="text", id_col=None, order_cols=("doc_id",),
        meta_cols=("doc_id",), tokenizer="standard", n_buckets=4, shard_size=100,
    )
    fn(a, 0)
    fn(b, 1)
    n_after = catalog.read_stats(catalog.resolve(root))["n_docs"]
    manifest = os.path.join(root, "_stream", "batch_1.json")
    assert os.path.exists(manifest)
    os.remove(manifest)  # simulate crash after publish, before manifest
    fn(b, 1)  # replay
    assert catalog.read_stats(catalog.resolve(root))["n_docs"] == n_after
    assert os.path.exists(manifest)  # manifest recovered


def test_merge_reject_duplicate_shas(spark, halves, tmp_path):
    """Append-only guard: merging a delta whose content already exists in main
    fails fast when reject_duplicate_shas is set (detect, never double-count)."""
    a, _ = halves
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, ra, **BUILD)
    build_index(spark, a.limit(5), rb, **BUILD)
    with pytest.raises(ValueError, match="share sha256"):
        merge_indexes(spark, ra, rb, reject_duplicate_shas=True)


def test_index_stream_available_now(spark, documents, tmp_path):
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    documents.filter(F.col("doc_id") < 250).write.parquet(
        os.path.join(inbox, "p0")
    )
    documents.filter(F.col("doc_id") >= 250).write.parquet(
        os.path.join(inbox, "p1")
    )
    root = str(tmp_path / "sidx")
    q = index_stream(
        spark,
        spark.readStream.schema(documents.schema).option(
            "maxFilesPerTrigger", "8"
        ).parquet(inbox + "/*"),
        root,
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_available_now=True,
        content_col="text", id_col=None, order_cols=("doc_id",),
        meta_cols=("doc_id",), tokenizer="standard", n_buckets=4, shard_size=100,
    )
    q.awaitTermination(300)
    assert not q.isActive or q.stop() is None
    assert catalog.read_stats(catalog.resolve(root))["n_docs"] == documents.count()
    hits = topk(spark, root, "spark join window", k=5).collect()
    assert len(hits) == 5 and hits[0]["score"] > hits[-1]["score"]
