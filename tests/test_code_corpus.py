"""The north-rule path: code_files corpus (repo,path,commit,lang,content) with the
code-aware tokenizer, docids assigned by deterministic global order, rank-identity
vs the brute-force oracle on the reference query set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.fixtures import REFERENCE_QUERIES, code_files
from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import assign_docids, build_index
from es_indexer_spark.query.bm25 import bm25_topk_brute
from es_indexer_spark.query.engine import fetch_docs, topk

N = 800


@pytest.fixture(scope="module")
def corpus(spark):
    return code_files(spark, N).persist()


@pytest.fixture(scope="module")
def code_index(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("code_idx"))
    build_index(
        spark,
        corpus,
        root,
        content_col="content",
        id_col=None,
        order_cols=("repo", "path", "commit"),
        meta_cols=("repo", "path", "commit", "lang"),
        tokenizer="code",
        lang_col="lang",
        n_buckets=8,
        shard_size=128,
        n_ckpt_batches=2,
    )
    return root


@pytest.fixture(scope="module")
def oracle_src(spark, corpus):
    # same deterministic docids as the builder assigns
    return assign_docids(corpus, ["repo", "path", "commit"]).persist()


def test_generator_deterministic(spark):
    a = code_files(spark, 50).orderBy("repo", "path").collect()
    b = code_files(spark, 50, partitions=3).orderBy("repo", "path").collect()
    assert a == b


def test_docids_are_dense_and_deterministic(oracle_src):
    ids = [r["docid"] for r in oracle_src.select("docid").orderBy("docid").collect()]
    assert ids == list(range(N))


@pytest.mark.parametrize("qid,query,k", REFERENCE_QUERIES)
def test_reference_queries_rank_identical(spark, code_index, oracle_src, qid, query, k):
    got = topk(spark, code_index, query, k=k).collect()
    want = bm25_topk_brute(
        oracle_src, query, k=k, content_col="content", id_col="docid", tokenizer="code", lang_col="lang"
    ).collect()
    assert [r["docid"] for r in got] == [r["docid"] for r in want], f"qid={qid}"
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)


def test_lang_tag_filters_results(spark, code_index):
    hits = fetch_docs(spark, code_index, topk(spark, code_index, "lang:rust index", k=10))
    langs = {r["lang"] for r in hits.collect()}
    # lang marker dominates ranking for rust docs (it is rare and every rust doc has it)
    assert "rust" in langs


def test_fuzzy_with_lang_marker(spark, code_index):
    """ADVICE r3: the code chain appends a trailing lang:<x> marker, so a
    lang-tagged fuzzy query used to fail the single-term check. Now the marker
    becomes required filter context (bool fuzzy clause): results carry the
    language AND at least one expansion term."""
    from es_indexer_spark.query.engine import fuzzy_topk

    hits = fetch_docs(
        spark, code_index, fuzzy_topk(spark, code_index, "index", k=10, lang="rust")
    ).collect()
    assert hits, "rust docs matching an index-expansion exist in this corpus"
    assert {r["lang"] for r in hits} == {"rust"}
    # and the unmarked query still takes the standalone path with >= as many hits
    allhits = fuzzy_topk(spark, code_index, "index", k=500).count()
    assert allhits >= len(hits)


def test_sha256_invariant_code(spark, code_index, oracle_src):
    vdir = catalog.resolve(code_index)
    docs = spark.read.parquet(f"{vdir}/docs")
    src = oracle_src.select("docid", F.sha2("content", 256).alias("src_sha"))
    assert docs.join(src, "docid").filter(F.col("sha256") != F.col("src_sha")).count() == 0
