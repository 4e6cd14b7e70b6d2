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

from es_indexer_spark.index import catalog
from es_indexer_spark.query.boolean import bool_query

_SCORE_SCHEMA = "docid long, score double"


def dis_max(
    spark: SparkSession,
    index_root: str,
    queries: Sequence[str | DataFrame],
    *,
    tie_breaker: float = 0.0,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``dis_max`` over sub-queries of the content field. Each entry of
    ``queries`` is analyzed like an ES ``match`` query (OR semantics: a doc
    matches the clause when it carries >=1 of the clause's terms; the clause
    score is the sum of its present terms' BM25 contributions — the same
    one-clause pure-should bool the engine already scores). A clause may
    also be a pre-scored ``(docid, score)`` DataFrame — the DSL passes any
    non-match sub-query through the compositional evaluator this way (round
    5h). Returns top-k (docid, score) with
    ``score = best + tie_breaker * (sum - best)``."""
    tie = float(tie_breaker)
    parts = [
        q.select("docid", "score") if isinstance(q, DataFrame)
        else bool_query(spark, index_root, should=[q], k=None, lang=lang)
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
    matches: DataFrame | None = None,
) -> DataFrame:
    """ES ``constant_score``: the wrapped filter (term and/or range, Lucene
    filter context — required, never BM25-scored) selects the docs; every
    match scores exactly ``boost``. Results are docid-ordered (all scores
    tie, and docid is ES's stable tiebreak). ``matches`` (a docid frame)
    replaces the built-in term/range filter for any other wrapped shape —
    the DSL passes composed filters through this seam (round 5h)."""
    if matches is None:
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
    positive: str | DataFrame,
    negative: str | DataFrame,
    negative_boost: float = 0.5,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``boosting`` query: ``positive`` is an ES ``match`` (OR) query that
    selects and scores; docs that ALSO match ``negative`` (any of its
    analyzed terms) are demoted — score multiplied by ``negative_boost`` —
    but never dropped. Top-k by the demoted score. Either side may be a
    pre-scored ``(docid, score)`` DataFrame (the DSL's composed-sub-query
    seam, round 5h)."""
    nb = float(negative_boost)
    pos = (
        positive.select("docid", "score") if isinstance(positive, DataFrame)
        else bool_query(spark, index_root, should=[positive], k=None, lang=lang)
    )
    neg = (
        (negative.select("docid") if isinstance(negative, DataFrame)
         else bool_query(spark, index_root, should=[negative], k=None,
                         lang=lang).select("docid"))
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


def terms_set(
    spark: SparkSession,
    index_root: str,
    terms: Sequence[str],
    *,
    minimum_should_match_expr: str,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``terms_set`` query: match docs containing at least M of ``terms``,
    where M is PER-DOC — ES reads it from ``minimum_should_match_field`` (or
    a script); here it is a SQL expression over the index's stored meta
    columns (a bare field name is the ES field case). Matching docs score
    the sum of their present terms' BM25 contributions, exactly ES (the
    rewritten bool-should). Like ES, M is NOT clamped to ``len(terms)`` — a
    doc demanding more matches than the query has terms can never match.

    Execution shape: one term-pruned postings scan per term (each clause's
    own posting volume, same as any multi-term query) through
    :func:`bool_query`'s distributed path; one docid hash agg counts matched
    clauses and sums scores; the per-doc threshold joins in from the
    docs-store parquet scan (column-pruned to docid + the expression's
    inputs) on docid — AQE handles the build-side choice. No driver state."""
    clauses = [
        bool_query(spark, index_root, should=[t], k=None, lang=lang)
        for t in terms
    ]
    clauses = [c for c in clauses if c is not None]
    if not clauses:
        return spark.createDataFrame([], _SCORE_SCHEMA)
    u = clauses[0].withColumn("_c", F.lit(0))
    for i, c in enumerate(clauses[1:], start=1):
        u = u.unionByName(c.withColumn("_c", F.lit(i)))
    agg = u.groupBy("docid").agg(
        F.countDistinct("_c").alias("_matched"), F.sum("score").alias("score")
    )
    vdir = catalog.resolve(index_root)
    import os as _os

    req = (
        spark.read.parquet(_os.path.join(vdir, "docs"))
        .select("docid", F.expr(minimum_should_match_expr).cast("long").alias("_req"))
    )
    out = (
        agg.join(req, "docid")
        .filter(F.col("_matched") >= F.col("_req"))
        .select("docid", "score")
    )
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def match_bool_prefix(
    spark: SparkSession,
    index_root: str,
    text: str,
    *,
    k: int | None = 10,
    max_expansions: int = 50,
    lang: str | None = None,
) -> DataFrame:
    """ES ``match_bool_prefix``: analyze ``text``; every term but the last
    becomes a ``term`` SHOULD clause (BM25-scored), the last becomes a
    ``prefix`` SHOULD clause under Lucene's constant-score rewrite (every
    doc carrying any expansion contributes exactly 1.0 — the same rewrite
    the standalone ``prefix`` query uses here). Pure-should bool: any one
    clause qualifies a doc; score = BM25 sum over present full terms plus
    the prefix constant.

    The prefix clause expands against the term-sorted dictionary (capped at
    ``max_expansions``, highest-df kept) and its docids come from the same
    bucket-pruned postings scan as the standalone prefix query — the union
    with the scored clauses is one docid hash agg."""
    from es_indexer_spark.analysis.tokenizer import tokenize_one
    from es_indexer_spark.index import catalog as _catalog
    from es_indexer_spark.query.suggest import prefix_query

    vdir = catalog.resolve(index_root)
    stats = _catalog.read_stats(vdir)
    toks = tokenize_one(text, stats["tokenizer"], lang=lang)
    if not toks:
        return spark.createDataFrame([], _SCORE_SCHEMA)
    full, last = toks[:-1], toks[-1]
    legs = []
    if full:
        legs.append(
            bool_query(spark, index_root, should=list(full), k=None, lang=lang)
        )
    legs.append(
        prefix_query(
            spark, index_root, last,
            k=(1 << 31) - 1,  # "all": limit is a JVM int
            max_expansions=max_expansions,
        )
    )
    u = legs[0]
    for p in legs[1:]:
        u = u.unionByName(p)
    out = u.groupBy("docid").agg(F.sum("score").alias("score"))
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)
