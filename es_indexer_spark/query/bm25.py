"""Brute-force BM25 in pure DataFrame algebra — the oracle for the index engine.

Scoring is Lucene/ES BM25 with the ES defaults the reference relies on
(k1=1.2, b=0.75; the reference never overrides `similarity` —
stacmodel/src/main/resources/schema/portal_records_index_schema.json:100-168):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene's formula)
    score(d,q)  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

No norm quantization (SURVEY.md §7.3(a)): rank-identity is defined against this exact
oracle. Ties broken by docid ascending (deterministic ranking, SURVEY.md §2.5).

Everything is declarative DataFrame algebra — Catalyst does partial+final aggregation,
broadcast-joins the tiny per-term stats, and keeps the whole plan in whole-stage
codegen; the only Python is the Arrow-batched tokenizer UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from es_indexer_spark.analysis.tokenizer import get_tokenizer_udf, tokenize_one


def lucene_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score_df(
    src: DataFrame,
    query: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "standard",
    lang_col: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """All matching docs with exact BM25 scores for ``query`` (unordered)."""
    qterms = sorted(set(tokenize_one(query, tokenizer)))
    tok_udf = get_tokenizer_udf(tokenizer)
    if tokenizer == "code":
        lang = F.col(lang_col) if lang_col else F.lit("")
        tokens = tok_udf(F.col(content_col), lang)
    else:
        tokens = tok_udf(F.col(content_col))
    tok = src.select(
        F.col(id_col).cast("long").alias("docid"),
        tokens.alias("tokens"),
    ).withColumn("doc_len", F.size("tokens").cast("double"))

    stats = tok.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["avgdl"]

    tf = (
        tok.select("docid", "doc_len", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("docid", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("doc_len").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn(
            "contrib",
            idf
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("docid")
        .agg(F.sum("contrib").alias("score"))
    )
    return scored


def bm25_topk_brute(
    src: DataFrame,
    query: str,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Exact top-k: ORDER BY score DESC, docid ASC LIMIT k."""
    return (
        bm25_score_df(src, query, **kwargs)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
