"""Point-in-time readers + scroll pagination: stable-view semantics across
publishes and deletes, and exact page concatenation at any depth."""

from __future__ import annotations

import os

import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.engine import topk
from es_indexer_spark.query.pit import (
    Scroll, close_pit, expire_pits, list_pits, open_pit,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
Q = "data stream batch"


def _build(spark, documents, root, n=None):
    df = documents if n is None else documents.limit(n)
    build_index(
        spark, df, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=False,
    )


@pytest.fixture(scope="module")
def pit_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_pit"))
    _build(spark, documents, root)
    return root


def _pairs(df):
    return [(r["docid"], round(r["score"], 6)) for r in df.collect()]


def test_ranked_scroll_pages_concatenate(spark, pit_index):
    want = _pairs(topk(spark, pit_index, Q, k=21))
    with Scroll(spark, pit_index, Q, page_size=7) as sc:
        got = []
        for _ in range(3):
            got += _pairs(sc.next_page())
    assert got == want


def test_scan_scroll_exact_and_exhausts(spark, pit_index):
    from es_indexer_spark.query.aggs import index_docs

    all_ids = sorted(r["docid"] for r in index_docs(spark, pit_index).collect())
    with Scroll(spark, pit_index, page_size=97) as sc:
        got = [r["docid"] for page in sc.pages() for r in page.collect()]
    assert got == all_ids  # every live doc once, docid order, then stops


def test_sorted_scroll_pages_concatenate(spark, pit_index):
    from es_indexer_spark.query.engine import topk_sorted

    sort = [("n_chars", "asc"), "_score"]
    want = [
        (r["docid"], r["n_chars"])
        for r in topk_sorted(spark, pit_index, Q, sort=sort, k=18).collect()
    ]
    with Scroll(spark, pit_index, Q, sort=sort, page_size=6) as sc:
        got = []
        for _ in range(3):
            got += [(r["docid"], r["n_chars"]) for r in sc.next_page().collect()]
    assert got == want


def test_pit_survives_republish(spark, documents, tmp_path):
    """A rebuild publishes v2 and repoints CURRENT; an open PIT keeps
    serving the v1 view (the ES stable-scroll contract)."""
    root = str(tmp_path / "idx")
    _build(spark, documents, root)
    before = _pairs(topk(spark, root, Q, k=10))
    pit = open_pit(root)
    _build(spark, documents, root, n=100)  # reindex onto a smaller corpus
    assert _pairs(topk(spark, pit, Q, k=10)) == before
    assert _pairs(topk(spark, root, Q, k=10)) != before
    close_pit(pit)


def test_pit_freezes_deletes(spark, documents, tmp_path):
    from es_indexer_spark.index.tombstones import delete_docs

    root = str(tmp_path / "idx")
    _build(spark, documents, root)
    before = _pairs(topk(spark, root, Q, k=10))
    pit = open_pit(root)
    dead = [d for d, _ in before[:3]]
    delete_docs(spark, root, dead)
    live = _pairs(topk(spark, root, Q, k=10))
    assert not (set(dead) & {d for d, _ in live})
    assert _pairs(topk(spark, pit, Q, k=10)) == before  # snapshot unaffected
    close_pit(pit)


def test_expire_and_lifecycle(spark, pit_index):
    pit = open_pit(pit_index, keep_alive_s=0.0)
    assert any(m["path"] == pit for m in list_pits(pit_index))
    closed = expire_pits(pit_index)
    assert pit in closed and not os.path.isdir(pit)
    with pytest.raises(FileNotFoundError):
        topk(spark, pit, Q, k=5).collect()
    close_pit(pit)  # idempotent
    with pytest.raises(ValueError):
        open_pit(pit)  # no PIT-over-PIT
    with pytest.raises(ValueError):
        close_pit(pit_index)  # refuses to delete a real index root
