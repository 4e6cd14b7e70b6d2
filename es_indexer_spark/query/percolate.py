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
must terms needs >= 1 should match. A percolator with NO positive terms at
all (only must_not) matches BY ABSENCE — it is a candidate for every doc, so
no equi-join can discover it. Those queries take a separate broadcast
absence pass (round 5g): the candidate batch's token sets broadcast against
the pure-negative query subset and ``array_intersect == empty`` decides the
match — work is |negative queries| x |candidate batch|, which is the honest
cost of absence matching (ES pays the same: every pure-negative percolator
must be evaluated against every percolated doc). The candidate batch is the
per-call document list (O(1)-small by API shape); the stored-query side
stays distributed.
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
    pure_negative = (F.size(must) == 0) & (F.size(should) == 0)

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
    doc_toks = docs_df.select(
        F.col(doc_id_col).alias("doc_id"),
        # null text tokenizes to null: treat as the empty token set so the
        # absence pass still sees the doc (a token-less doc matches every
        # pure-negative percolator)
        F.coalesce(F.array_distinct(toks), F.array()).alias("__dtoks"),
    )
    doc_terms = doc_toks.select(
        "doc_id", F.explode(F.col("__dtoks")).alias("term")
    )

    # absence pass for pure-negative percolators: a BroadcastNestedLoopJoin
    # of the O(1)-sized candidate batch against the (distributed) negative
    # query subset — deliberate: absence matching has no join key
    neg_hits = (
        queries_df.filter(pure_negative)
        .select(
            F.col(query_id_col).alias("query_id"),
            F.array_distinct(must_not).alias("__mn"),
        )
        .crossJoin(F.broadcast(doc_toks))
        .filter(F.size(F.array_intersect(F.col("__mn"), F.col("__dtoks"))) == 0)
        .select("doc_id", "query_id")
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
        .unionByName(neg_hits)
    )
