"""Corpus curation (ops/curation.py): benchmark n-gram decontamination and
deterministic weighted source mixing — both growth-stable, SQL-replayable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops.curation import ngram_contamination, sample_corpus


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "pack my box with five dozen liquor jugs", "web"),
        (3, "the quick brown fox sat still", "wiki"),  # shares a 4-gram with 1
        (4, "completely unrelated text snippet here", "wiki"),
        (5, "tiny", "code"),  # < n tokens -> zero grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngram_contamination_counts(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [("the quick brown fox was seen",)], "text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contamination"])
        for r in ngram_contamination(docs, bench, n=4).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}  # every doc gets a row
    # doc 1: 9 tokens -> 6 distinct 4-grams; exactly 'the quick brown fox'
    # appears in the bench
    assert out[1] == (6, 1, round(1 / 6, 6))  # engine rounds at ndigits=6
    assert out[3][1] == 1  # same shared 4-gram
    assert out[2] == (5, 0, 0.0)
    assert out[4] == (2, 0, 0.0)
    assert out[5] == (0, 0, 0.0)  # shorter than n: clean by definition


def test_ngram_contamination_strict_rule_drop_set(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 1).select("text")
    out = ngram_contamination(docs, bench, n=4)
    dropped = {r["doc_id"] for r in out.filter("contamination > 0").collect()}
    assert dropped == {1, 3}


def test_sample_corpus_deterministic_and_weighted(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    out = sample_corpus(
        docs, {"s0": 0.5, "s1": 0.0, "s2": 1.0}, id_col="doc_id",
        source_col="source",
    )
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert "s1" not in by_src                     # weight 0 drops all
    assert len(by_src["s2"]) == 500               # weight 1 keeps all
    assert len(by_src["s3"]) == 500               # absent source keeps all
    assert 150 < len(by_src["s0"]) < 350          # ~0.5 of 500, hash-spread
    # deterministic: re-run identical
    again = {(r["doc_id"], r["source"]) for r in sample_corpus(
        docs, {"s0": 0.5, "s1": 0.0, "s2": 1.0}).collect()}
    assert again == {(r["doc_id"], r["source"]) for r in rows}


def test_sample_corpus_growth_stable(spark):
    """Adding rows never flips an existing row's keep/drop — the incremental
    corpus-refresh reproducibility property."""
    small = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("s0").alias("source")
    )
    big = spark.range(1500).select(
        F.col("id").alias("doc_id"), F.lit("s0").alias("source")
    )
    kept_small = {r["doc_id"] for r in sample_corpus(small, {"s0": 0.3}).collect()}
    kept_big = {r["doc_id"] for r in sample_corpus(big, {"s0": 0.3}).collect()}
    assert kept_small == {d for d in kept_big if d < 500}


def test_sample_corpus_validates_weights(spark):
    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    with pytest.raises(ValueError):
        sample_corpus(docs, {"s": 1.5})
