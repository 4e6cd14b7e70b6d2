"""Training-data assembly ops (ops/packing.py): deterministic hash splits
and budget-chunked sequence packing."""

from __future__ import annotations

import os

import pytest

from es_indexer_spark.ops.packing import assign_split, pack_documents

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_assign_split_fractions_and_coverage(spark, documents):
    got = assign_split(documents, "doc_id").groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    n = sum(counts.values())
    assert n == documents.count()
    # 10%/10% within generous tolerance on 500 docs
    assert 0.03 * n <= counts.get("test", 0) <= 0.20 * n
    assert 0.03 * n <= counts.get("val", 0) <= 0.20 * n
    assert counts["train"] > 0.6 * n


def test_assign_split_is_stable_under_growth(spark, documents):
    """Adding rows must never move an existing doc between splits — the
    property random sampling lacks."""
    first = {
        r["doc_id"]: r["split"]
        for r in assign_split(documents.limit(100), "doc_id").collect()
    }
    full = {
        r["doc_id"]: r["split"]
        for r in assign_split(documents, "doc_id").collect()
    }
    assert all(full[d] == s for d, s in first.items())


def test_assign_split_validation(spark, documents):
    with pytest.raises(ValueError):
        assign_split(documents, "doc_id", val_buckets=500, test_buckets=500)


def test_pack_documents_strict(spark):
    rows = [(1, "a", 100), (2, "a", 100), (3, "a", 100), (4, "a", 250),
            (5, "b", 300)]
    df = spark.createDataFrame(rows, "id long, g string, tok long")
    got = {
        r["id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, "id", "tok", budget=256, group_col="g").collect()
    }
    # group a: cum_excl = 0,100,200,300 -> packs 0,0,0,1 (doc 3 crosses the
    # boundary but belongs to the pack its first token falls in)
    assert got == {1: (0, 0), 2: (0, 100), 3: (0, 200), 4: (1, 44), 5: (0, 0)}


def test_pack_documents_overflow_bound(spark, documents):
    budget = 1000
    packed = pack_documents(
        documents, "doc_id", "n_chars", budget=budget, group_col="lang"
    )
    sums = (
        packed.groupBy("lang", "pack_id")
        .sum("n_chars")
        .collect()
    )
    max_doc = max(r["n_chars"] for r in documents.collect())
    assert all(r["sum(n_chars)"] < budget + max_doc for r in sums)
    # offsets stay inside the budget window
    assert packed.filter(f"pack_offset < 0 OR pack_offset >= {budget}").count() == 0


def test_pack_documents_guards(spark, documents):
    with pytest.raises(ValueError):
        pack_documents(documents, "doc_id", "n_chars", budget=0)
    with pytest.raises(ValueError):
        pack_documents(
            documents, "doc_id", "n_chars", budget=100, max_rows_ungrouped=10
        )
