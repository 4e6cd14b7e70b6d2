"""ES compound queries — ``dis_max``, ``constant_score``, ``boosting`` —
composed onto the bool engine.

The reference's read surface is the ES query DSL over the portal index
(SURVEY.md §3.3; the DSL enters at
geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120 and the portal's own
search requests against stacmodel/.../portal_records_index_schema.json).
These three are the remaining members of the DSL's "compound queries"
family; their semantics are public Lucene:

- ``dis_max`` (Lucene ``DisjunctionMaxQuery``): each sub-query is scored
  independently; a doc matching several takes the BEST sub-score plus
  ``tie_breaker`` times the rest:
  ``score = max_i(s_i) + tie * (sum_i(s_i) - max_i(s_i))``.
- ``constant_score`` (Lucene ``ConstantScoreQuery``): a filter-context
  query whose every match scores exactly ``boost``.
- ``boosting`` (Lucene ``BoostingQuery`` from the queries module): the
  ``positive`` query ranks; docs also matching ``negative`` keep their rank
  eligibility but have their score multiplied by ``negative_boost``
  (demotion without exclusion — the difference from ``must_not``).

Execution shape: each sub-query runs through :func:`bool_query`'s
single-shuffle shard evaluation (dictionary point lookup -> bucket-pruned
postings scan -> per-shard numpy scorer) with ``k=None`` so the per-clause
result is the full distributed (docid, score) set, never a driver
collection. Combination is then pure DataFrame algebra:

- ``dis_max``: unionByName over the clause results + one hash aggregation
  keyed on docid (partial+final map-side combine; the aggregate state is two
  doubles per docid). Matches Lucene's model — DisjunctionMaxQuery also
  drives each sub-scorer independently and merges on doc.
- ``boosting``: the negative set joins the positive scores on docid; at
  scale this is a shuffle join on the (already sparse) match sets, and AQE
  turns it into a broadcast when the negative side is small — the common
  case for a demotion query.

Both therefore cost one postings scan per clause (term-pruned, exactly the
clause's own posting volume) plus one docid-keyed exchange — no all-corpus
pass, no cross join, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.query.boolean import bool_query

_SCORE_SCHEMA = "docid long, score double"


def dis_max(
    spark: SparkSession,
    index_root: str,
    queries: Sequence[str],
    *,
    tie_breaker: float = 0.0,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``dis_max`` over sub-queries of the content field. Each entry of
    ``queries`` is analyzed like an ES ``match`` query (OR semantics: a doc
    matches the clause when it carries >=1 of the clause's terms; the clause
    score is the sum of its present terms' BM25 contributions — the same
    one-clause pure-should bool the engine already scores). Returns top-k
    (docid, score) with ``score = best + tie_breaker * (sum - best)``."""
    tie = float(tie_breaker)
    parts = [
        bool_query(spark, index_root, should=[q], k=None, lang=lang)
        for q in queries
    ]
    if not parts:
        return spark.createDataFrame([], _SCORE_SCHEMA)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    combined = u.groupBy("docid").agg(
        F.max("score").alias("_best"), F.sum("score").alias("_sum")
    )
    scored = combined.select(
        "docid",
        (F.col("_best") + F.lit(tie) * (F.col("_sum") - F.col("_best"))).alias(
            "score"
        ),
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def constant_score(
    spark: SparkSession,
    index_root: str,
    *,
    filter_terms: Sequence[str] = (),
    filter_range: tuple[str, dict] | None = None,
    boost: float = 1.0,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``constant_score``: the wrapped filter (term and/or range, Lucene
    filter context — required, never BM25-scored) selects the docs; every
    match scores exactly ``boost``. Results are docid-ordered (all scores
    tie, and docid is ES's stable tiebreak)."""
    matches = bool_query(
        spark,
        index_root,
        filter_terms=list(filter_terms),
        filter_range=filter_range,
        k=None,
        lang=lang,
    )
    out = matches.select("docid", F.lit(float(boost)).alias("score"))
    if k is None:
        return out
    return out.orderBy(F.asc("docid")).limit(k)


def boosting(
    spark: SparkSession,
    index_root: str,
    *,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``boosting`` query: ``positive`` is an ES ``match`` (OR) query that
    selects and scores; docs that ALSO match ``negative`` (any of its
    analyzed terms) are demoted — score multiplied by ``negative_boost`` —
    but never dropped. Top-k by the demoted score."""
    nb = float(negative_boost)
    pos = bool_query(spark, index_root, should=[positive], k=None, lang=lang)
    neg = (
        bool_query(spark, index_root, should=[negative], k=None, lang=lang)
        .select("docid", F.lit(True).alias("_neg"))
        .distinct()
    )
    scored = (
        pos.join(neg, "docid", "left")
        .select(
            "docid",
            F.when(F.col("_neg"), F.col("score") * F.lit(nb))
            .otherwise(F.col("score"))
            .alias("score"),
        )
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
