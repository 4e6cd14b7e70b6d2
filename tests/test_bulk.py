"""``_bulk`` NDJSON adapter — the reference's own write path
(IndexServiceImpl.java:74-91: 5 MiB batches, idempotent ``_id`` keys) as the
ES-compatible API over delta-build + upsert + tombstones."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.bulk import bulk, parse_bulk_ndjson
from es_indexer_spark.index.tombstones import filter_live
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.lookup import mget


def _build(spark, df, root):
    build_index(
        spark, df, root, content_col="text", id_col="doc_id",
        meta_cols=("doc_id", "lang"), tokenizer="standard", n_buckets=4,
        shard_size=64, n_ckpt_batches=1, resume=False,
    )


def _live(spark, root):
    import os

    vdir = catalog.resolve(root)
    return filter_live(
        spark, vdir, spark.read.parquet(os.path.join(vdir, "docs"))
    )


def test_parse_ndjson_shapes():
    lines = [
        json.dumps({"index": {"_id": 1}}),
        json.dumps({"text": "alpha beta", "lang": "en"}),
        json.dumps({"delete": {"_id": 2}}),
        json.dumps({"update": {"_id": 3}}),
        json.dumps({"doc": {"text": "gamma", "lang": "fr"}}),
        json.dumps({"frob": {"_id": 4}}),
        json.dumps({"create": {"_id": 5}}),  # trailing action, no source
    ]
    got = parse_bulk_ndjson(lines)
    assert [g["op"] for g in got] == ["index", "delete", "update", "error", "error"]
    assert got[0]["doc"]["text"] == "alpha beta"
    assert got[2]["doc"] == {"text": "gamma", "lang": "fr"}
    assert "unknown bulk op" in got[3]["error"]
    assert "without a source" in got[4]["error"]


def test_bulk_index_update_delete_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}", "en") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    root = str(tmp_path / "idx")
    _build(spark, docs, root)

    res = bulk(spark, root, [
        # overwrite doc 3, add new doc 100, delete doc 5,
        # index-then-delete 7 (final state: deleted),
        # delete-then-index 9 (final state: the new doc)
        {"op": "index", "_id": 3,
         "doc": {"text": "gamma delta fresh", "lang": "fr"}},
        {"op": "create", "_id": 100,
         "doc": {"text": "brand new entry gamma", "lang": "de"}},
        {"op": "delete", "_id": 5},
        {"op": "index", "_id": 7, "doc": {"text": "doomed", "lang": "en"}},
        {"op": "delete", "_id": 7},
        {"op": "delete", "_id": 9},
        {"op": "update", "_id": 9,
         "doc": {"text": "resurrected gamma", "lang": "en"}},
    ], content_col="text", id_col="doc_id", meta_cols=("doc_id", "lang"))
    assert res["errors"] is False and len(res["items"]) == 7
    assert res["n_reference_batches"] == 1

    live = _live(spark, root)
    ids = {r["doc_id"] for r in live.select("doc_id").collect()}
    assert 100 in ids and 5 not in ids and 7 not in ids and 9 in ids
    assert live.count() == 40 - 2 + 1  # 40 originals, minus 5 and 7, plus 100
    # one live copy per id
    assert live.select("doc_id").distinct().count() == live.count()
    # the new content is searchable; the overwritten content is gone
    got = {r["docid"] for r in topk(spark, root, "gamma", k=None,
                                    use_blockmax=False).collect()}
    live_by_id = {r["doc_id"]: r["docid"] for r in live.collect()}
    assert {live_by_id[3], live_by_id[100], live_by_id[9]} <= got
    assert mget(spark, root, [live_by_id[100]]).collect()[0]["lang"] == "de"

    # idempotent retry: re-sending the same bulk converges to the same state
    res2 = bulk(spark, root, [
        {"op": "delete", "_id": 5},
        {"op": "index", "_id": 3,
         "doc": {"text": "gamma delta fresh", "lang": "fr"}},
    ], content_col="text", id_col="doc_id", meta_cols=("doc_id", "lang"))
    assert res2["errors"] is False
    live = _live(spark, root)
    assert live.count() == 39
    assert live.select("doc_id").distinct().count() == 39


def test_bulk_error_isolation(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha doc{i}", "en") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    root = str(tmp_path / "idx_err")
    _build(spark, docs, root)
    res = bulk(spark, root, [
        {"op": "index", "_id": "not-an-int", "doc": {"text": "x", "lang": "en"}},
        {"op": "index", "_id": 50, "doc": {"lang": "en"}},          # no content
        {"op": "index", "_id": 51, "doc": {"text": "fine here", "lang": "en"}},
        {"op": "update", "_id": 52, "doc": {"text": "y"}},          # missing meta
    ], content_col="text", id_col="doc_id", meta_cols=("doc_id", "lang"))
    assert res["errors"] is True
    statuses = [i["status"] for i in res["items"]]
    assert statuses == ["error", "error", "ok", "error"]
    assert "integer id" in res["items"][0]["error"]
    assert "full 'text' column" in res["items"][1]["error"]
    assert "missing meta columns" in res["items"][3]["error"]
    # the valid action landed (S7: error reduction, never all-or-nothing)
    live = _live(spark, root)
    assert live.filter(F.col("doc_id") == 51).count() == 1
    assert live.count() == 11
