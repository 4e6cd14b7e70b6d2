"""ES ``percolate`` — reverse search: stored queries, candidate documents.

ES lets users index queries into a percolator field and then ask, per
document, WHICH stored queries match (alerts/subscriptions; the published
percolate-query contract). The reference's indices inherit this surface from
ES. Lucene evaluates each candidate doc against a pre-selected subset of the
stored queries; at Spark scale (millions of stored queries × a batch of
candidate docs) the per-query loop is the wrong shape, so this module
re-expresses percolation as ONE inverted term equi-join + ONE counting
aggregation:

* stored queries hold ANALYZED term lists per clause kind
  (``must`` / ``should`` / ``must_not`` + ``minimum_should_match``) — the
  supported bool subset;
* candidate docs tokenize once (vectorized), explode to distinct
  ``(doc_id, term)`` pairs;
* queries explode to ``(query_id, term, kind)`` triples;
* join on ``term``, then one hash agg per ``(doc_id, query_id)`` counting
  distinct matched terms per kind;
* a pair matches iff every must term matched, >= msm should terms matched,
  and NO must_not term matched (a must_not term can only be OBSERVED through
  the join when it matches — its absence is what permits the match, so the
  count test is exact).

Matching work is proportional to actual (doc term, query term) overlaps —
never |docs| x |queries|. The join key is the term: a stop-wordy percolator
term concentrates its overlaps on one key (same skew story as the postings
build; keep stored-query terms analyzed and stop-filtered, or salt the join
on the doc side if a term's overlap volume dominates a partition).

Lucene's default `minimum_should_match` rule is reproduced: a query with no
must terms needs >= 1 should match; a percolator with NO positive terms at
all (only must_not) would match every doc not containing the terms — that
requires an anti-join against the full candidate set, a different (and
rarely intended) shape, so it raises by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def percolate(
    queries_df: DataFrame,
    docs_df: DataFrame,
    *,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "standard",
    lang_col: str | None = None,
) -> DataFrame:
    """Return ``(doc_id, query_id)`` pairs where the stored query matches the
    candidate document.

    ``queries_df`` columns: ``query_id``, ``must`` / ``should`` / ``must_not``
    (``array<string>`` of ANALYZED terms; null = empty), and optionally
    ``minimum_should_match`` (int; null = the Lucene default — 1 when the
    query has no must terms and at least one should term, else 0).
    """
    must = F.coalesce(F.col("must"), F.array())
    should = F.coalesce(F.col("should"), F.array())
    must_not = F.coalesce(F.col("must_not"), F.array())
    msm_default = F.when(
        (F.size(must) == 0) & (F.size(should) > 0), F.lit(1)
    ).otherwise(F.lit(0))
    msm_col = (
        F.coalesce(F.col("minimum_should_match"), msm_default)
        if "minimum_should_match" in queries_df.columns
        else msm_default
    )
    qmeta = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.size(F.array_distinct(must)).alias("n_must"),
        msm_col.cast("int").alias("msm"),
        F.size(should).alias("n_should"),
    )
    bad = qmeta.filter((F.col("n_must") == 0) & (F.col("n_should") == 0))
    if bad.limit(1).count() > 0:
        raise ValueError(
            "percolator queries with no positive (must/should) terms would "
            "match by absence alone — not supported (requires an anti-join "
            "over the full candidate set)"
        )

    def kind_terms(arr, kind: str):
        return queries_df.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(arr)).alias("term"),
            F.lit(kind).alias("kind"),
        )

    q_terms = (
        kind_terms(must, "m")
        .unionByName(kind_terms(should, "s"))
        .unionByName(kind_terms(must_not, "n"))
    )

    if tokenizer == "standard":
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    else:
        from es_indexer_spark.analysis.tokenizer import get_tokenizer_udf

        udf = get_tokenizer_udf(tokenizer)
        toks = (
            udf(F.col(text_col), F.col(lang_col))
            if tokenizer == "code" and lang_col is not None
            else udf(F.col(text_col))
        )
    doc_terms = docs_df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )

    hits = (
        q_terms.join(doc_terms, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count_distinct(
                F.when(F.col("kind") == "m", F.col("term"))
            ).alias("m_cnt"),
            F.count_distinct(
                F.when(F.col("kind") == "s", F.col("term"))
            ).alias("s_cnt"),
            F.count_distinct(
                F.when(F.col("kind") == "n", F.col("term"))
            ).alias("n_cnt"),
        )
    )
    return (
        hits.join(qmeta, "query_id")
        .filter(
            (F.col("m_cnt") == F.col("n_must"))
            & (F.col("s_cnt") >= F.col("msm"))
            & (F.col("n_cnt") == 0)
        )
        .select("doc_id", "query_id")
    )
