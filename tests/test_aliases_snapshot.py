"""Round-5g operational surfaces: named aliases (``_aliases`` atomic action
lists), snapshots (``_snapshot`` create/list/restore/delete), and
``_mtermvectors``.

Reference anchor: the blue/green rebuild-then-swap flow
(IndexerMetadataServiceImpl.java createIndexFromMappingJSONFile + alias
usage); `catalog.publish` is the generation-level swap, aliases are the
index-level one.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.index import catalog
from es_indexer_spark.index.aliases import (
    get_aliases,
    resolve_read,
    resolve_write,
    swap_alias,
    update_aliases,
)
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.snapshot import (
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)
from es_indexer_spark.query.engine import topk

QUERY = "spark join window"


def _build(spark, df, root):
    build_index(
        spark, df, root, content_col="text", id_col="doc_id",
        meta_cols=("lang",), tokenizer="standard", n_buckets=8,
        shard_size=100, n_ckpt_batches=2, resume=False,
    )


# ----------------------------------------------------------------- aliases
def test_alias_actions_and_resolution(tmp_path):
    cd = str(tmp_path)
    update_aliases(cd, [
        {"add": {"alias": "live", "index": "idx_a"}},
        {"add": {"alias": "all", "index": "idx_a"}},
        {"add": {"alias": "all", "index": "idx_b"}},
    ])
    assert resolve_read(cd, "live") == ["idx_a"]
    assert sorted(resolve_read(cd, "all")) == ["idx_a", "idx_b"]
    # a plain path passes through
    assert resolve_read(cd, "idx_z") == ["idx_z"]
    assert resolve_write(cd, "live") == "idx_a"
    # two entries, no write index -> ambiguous write
    with pytest.raises(ValueError, match="write index"):
        resolve_write(cd, "all")
    update_aliases(cd, [
        {"add": {"alias": "all", "index": "idx_b", "is_write_index": True}},
    ])
    assert resolve_write(cd, "all") == "idx_b"
    # two write indices rejected, atomically (the add before the bad one
    # must NOT land)
    before = get_aliases(cd)
    with pytest.raises(ValueError, match="2 write indices"):
        update_aliases(cd, [
            {"add": {"alias": "x", "index": "idx_c"}},
            {"add": {"alias": "all", "index": "idx_a", "is_write_index": True}},
        ])
    assert get_aliases(cd) == before
    # blue/green swap is one atomic action list
    swap_alias(cd, "live", None, "idx_new")
    assert resolve_read(cd, "live") == ["idx_new"]
    # remove of a non-pointing alias raises; remove_index drops everywhere
    with pytest.raises(ValueError, match="does not point"):
        update_aliases(cd, [{"remove": {"alias": "live", "index": "nope"}}])
    update_aliases(cd, [{"remove_index": {"index": "idx_b"}}])
    assert resolve_read(cd, "all") == ["idx_a"]


# ---------------------------------------------------------------- snapshot
def test_snapshot_restore_roundtrip(spark, documents, tmp_path):
    root = str(tmp_path / "idx")
    repo = str(tmp_path / "repo")
    _build(spark, documents, root)
    before = [(r["docid"], r["score"]) for r in topk(spark, root, QUERY, k=5).collect()]

    man = create_snapshot(root, repo, "snap1")
    assert man["n_files"] > 0 and man["stats"]["n_docs"] == documents.count()
    assert [m["snapshot_id"] for m in list_snapshots(repo)] == ["snap1"]
    with pytest.raises(ValueError, match="already exists"):
        create_snapshot(root, repo, "snap1")

    # deletes in the live index after the snapshot do NOT leak into it
    from es_indexer_spark.index.tombstones import delete_docs

    delete_docs(spark, root, [before[0][0]])
    assert topk(spark, root, QUERY, k=1).collect()[0]["docid"] != before[0][0]

    # restore into a FRESH root: scores bit-identical to pre-delete state
    dest = str(tmp_path / "idx_restored")
    vdir = restore_snapshot(repo, "snap1", dest)
    assert catalog.resolve(dest) == vdir
    got = [(r["docid"], r["score"]) for r in topk(spark, dest, QUERY, k=5).collect()]
    assert got == before

    # restore over the LIVE root publishes a new version; the delete is gone
    restore_snapshot(repo, "snap1", root)
    got = [(r["docid"], r["score"]) for r in topk(spark, root, QUERY, k=5).collect()]
    assert got == before

    assert delete_snapshot(repo, "snap1") is True
    assert delete_snapshot(repo, "snap1") is False
    assert list_snapshots(repo) == []
    with pytest.raises(FileNotFoundError):
        restore_snapshot(repo, "snap1", dest)
    # the restored index still reads after the snapshot is gone (hardlinks
    # keep bytes alive)
    assert topk(spark, dest, QUERY, k=3).count() == 3


def test_snapshot_survives_source_delete(spark, documents, tmp_path):
    root = str(tmp_path / "idx2")
    repo = str(tmp_path / "repo2")
    _build(spark, documents, root)
    want = [(r["docid"], r["score"]) for r in topk(spark, root, QUERY, k=5).collect()]
    create_snapshot(root, repo, "s")
    catalog.delete_index(root)
    dest = str(tmp_path / "idx2_back")
    restore_snapshot(repo, "s", dest)
    got = [(r["docid"], r["score"]) for r in topk(spark, dest, QUERY, k=5).collect()]
    assert got == want


# ------------------------------------------------------------ mtermvectors
def test_mterm_vectors_matches_per_doc(spark, documents, tmp_path):
    from es_indexer_spark.query.lookup import mterm_vectors, term_vectors

    root = str(tmp_path / "idx_mtv")
    _build(spark, documents, root)
    texts = {"a": "spark join window spark", "b": "zzzqqq data"}
    batch = mterm_vectors(spark, root, texts)
    for key, text in texts.items():
        single = {
            r["term"]: (r["term_freq"], r["positions"], r["doc_freq"], r["ttf"])
            for r in term_vectors(spark, root, text).collect()
        }
        got = {
            r["term"]: (r["term_freq"], r["positions"], r["doc_freq"], r["ttf"])
            for r in batch.filter(F.col("doc_key") == key).collect()
        }
        assert got == single and single
    # unseen term reports 0/0 field stats
    row = batch.filter(
        (F.col("doc_key") == "b") & (F.col("term") == "zzzqqq")
    ).collect()[0]
    assert (row["doc_freq"], row["ttf"]) == (0, 0)


def test_cat_aliases_and_rollover(spark, documents, tmp_path):
    from es_indexer_spark.index.aliases import cat_aliases, rollover

    cd = str(tmp_path / "cluster")
    root_a = str(tmp_path / "roll_a")
    _build(spark, documents, root_a)
    update_aliases(cd, [
        {"add": {"alias": "w", "index": root_a, "is_write_index": True}},
    ])
    rows = cat_aliases(cd)
    assert rows == [{"alias": "w", "index": root_a, "is_write_index": True}]

    # condition not met: no swap
    res = rollover(cd, "w", str(tmp_path / "roll_b"), max_docs=10**9)
    assert res["rolled_over"] is False and res["conditions"] == {"max_docs": False}
    assert resolve_write(cd, "w") == root_a

    # dry_run: condition met but no swap
    res = rollover(cd, "w", str(tmp_path / "roll_b"), max_docs=100,
                   dry_run=True)
    assert res["rolled_over"] is False and res["conditions"]["max_docs"] is True
    assert resolve_write(cd, "w") == root_a

    # real rollover: writes move, old index stays aliased for reads
    root_b = str(tmp_path / "roll_b")
    res = rollover(cd, "w", root_b, max_docs=100)
    assert res["rolled_over"] is True and res["old_index"] == root_a
    assert resolve_write(cd, "w") == root_b
    assert sorted(resolve_read(cd, "w")) == sorted([root_a, root_b])
    with pytest.raises(ValueError, match="at least one condition"):
        rollover(cd, "w", root_b)
    with pytest.raises(ValueError, match="does not exist"):
        rollover(cd, "nope", root_b, max_docs=1)


def test_get_mapping_and_settings(spark, documents, tmp_path):
    from es_indexer_spark.index.catalog import get_mapping, get_settings

    root = str(tmp_path / "idx_map")
    _build(spark, documents, root)
    st = get_settings(root)
    assert st["index"]["similarity"]["default"] == {
        "type": "BM25", "k1": 1.2, "b": 0.75}
    assert st["index"]["analysis"]["tokenizer"] == "standard"
    props = get_mapping(root, spark)["mappings"]["properties"]
    assert props["content"]["type"] == "text"
    assert props["lang"] == {"type": "keyword"}
    assert props["docid"] == {"type": "long"}
    assert props["sha256"] == {"type": "keyword"}


def test_script_query_and_dsl_dispatch(spark, documents, tmp_path):
    from es_indexer_spark.query.dsl import search
    from es_indexer_spark.query.lookup import script_query

    root = str(tmp_path / "idx_script")
    _build(spark, documents, root)
    direct = script_query(spark, root, "docid % 7 = 0 AND lang = 'en'")
    want = sorted(r["docid"] for r in direct.collect())
    assert want and all(d % 7 == 0 for d in want)
    via = search(spark, root, {"query": {"script": {"script": {
        "source": "docid % 7 = 0 AND lang = 'en'"}}}, "size": 10000})
    assert sorted(r["docid"] for r in via.collect()) == want
    import pytest as _pt

    with _pt.raises(ValueError, match="script.source"):
        search(spark, root, {"query": {"script": {"script": {}}}})
