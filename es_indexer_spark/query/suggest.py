"""Search-as-you-type suggestions (prefix matching), the native analog of the
reference's ``search_as_you_type`` suggestion fields and shingle phrases
(reference: stacmodel/src/main/resources/schema/portal_records_index_schema.json:112-132
declares ``search_suggestions.*`` as search_as_you_type; the phrases themselves come
from the ``shingle_analyser`` chain :15-32; populated at
indexer/.../IndexerMetadataServiceImpl.java:172-195 via ES `_analyze`).

Two surfaces:

- :func:`suggest_prefix` — unigram completion straight off the published index's
  term dictionary (no extra artifact needed): prefix range-scan over the
  term-sorted dict parquet (min/max row-group pruning makes this a point-range
  read), ranked by collection frequency. ES's edge-ngram index trades space for
  lookup speed; on a columnar dict a sorted range scan gets the same pruning
  without materializing ngrams.
- :func:`phrase_suggestions` — 2-4-gram shingle phrases extracted with the
  shingle chain, ranked by document frequency; the analog of
  ``search_suggestions.abstract_phrases``.

Scale: the dict is term-sorted parquet → a prefix is one contiguous row-group
range per file; phrase extraction is one explode + hash agg (partial+final,
no skew risk beyond ordinary term skew — same bucketing as the main index
would apply if materialized).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.analysis.tokenizer import shingle_udf
from es_indexer_spark.index import catalog


def suggest_prefix(
    spark: SparkSession, index_root: str, prefix: str, k: int = 10
) -> DataFrame:
    """Top-k dictionary terms completing ``prefix``, ranked by cf desc, term asc."""
    vdir = catalog.resolve(index_root)
    d = spark.read.parquet(os.path.join(vdir, "dict"))
    p = prefix.lower()
    return (
        d.filter(F.col("term").startswith(p))
        .orderBy(F.desc("cf"), F.asc("term"))
        .select("term", "df", "cf")
        .limit(k)
    )


def phrase_suggestions(
    df: DataFrame,
    id_col: str,
    content_col: str,
    prefix: str | None = None,
    k: int = 20,
) -> DataFrame:
    """2-4-gram (plus unigram) shingle phrases ranked by document frequency.

    Per-doc phrases are already unique (the chain ends in a ``unique`` filter,
    schema :30), so df = count of docs per phrase.
    """
    phrases = df.select(
        F.col(id_col).alias("_id"), F.explode(shingle_udf(F.col(content_col))).alias("phrase")
    )
    agg = phrases.groupBy("phrase").agg(F.count("*").alias("df"))
    if prefix:
        agg = agg.filter(F.col("phrase").startswith(prefix.lower()))
    return agg.orderBy(F.desc("df"), F.asc("phrase")).limit(k)
