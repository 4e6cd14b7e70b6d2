"""ES ``_rank_eval`` — ranking-quality metrics over rated search requests.

The API every relevance-tuning loop runs: a set of requests, each with human
ratings (``{_id, rating}``), evaluated with one of the published metrics —
``precision`` / ``recall`` (at k, with a relevance threshold),
``mean_reciprocal_rank``, ``dcg`` (optionally normalized = NDCG), and
``expected_reciprocal_rank``. Formulas follow the public ES/Lucene docs:

- precision@k  = relevant_retrieved / retrieved (ES divides by the number
  actually retrieved, not by k, when fewer than k docs match);
- recall@k     = relevant_retrieved / total_relevant (from the ratings);
- MRR          = 1 / rank of the first relevant hit (0 when none retrieved);
- DCG@k        = Σ (2^rating − 1) / log2(rank + 1); NDCG divides by the
  ideal DCG of the ratings sorted descending (cut at k);
- ERR@k        = Σ_r (p_r / r) · Π_{i<r} (1 − p_i) with
  p = (2^rating − 1) / 2^max_relevance.

Spark-first shape: ALL match-query requests batch through ``topk_many`` —
ONE dictionary lookup + ONE postings scan for the whole evaluation set (the
point of evaluating hundreds of rated queries against a 100 TB index); the
ratings are O(requests × rated docs) driver data broadcast onto the hit
frame; every metric is a per-qid aggregation/window in Catalyst — no
per-request driver loop, no collect before the metric math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_METRICS = (
    "precision", "recall", "mean_reciprocal_rank", "dcg",
    "expected_reciprocal_rank",
)


def rank_eval(
    spark: SparkSession,
    index_root: str,
    requests: list[dict],
    metric: dict,
    *,
    lang: str | None = None,
) -> DataFrame:
    """Evaluate rated requests; returns one row per request:
    ``(qid, metric_score, rated_in_topk, unrated_in_topk)`` — the per-request
    half of the ES response (the overall score is the caller's one-line
    ``avg``, kept out so the frame stays composable).

    ``requests``: ``[{"id": ..., "request": {"query": {"match": ...}},
    "ratings": [{"_id": docid, "rating": int}, ...]}, ...]`` — match-query
    requests only (they share one batched scan; other query kinds: run the
    query yourself and call :func:`rank_eval_hits`).
    ``metric``: single-key ES metric object, e.g.
    ``{"precision": {"k": 10, "relevant_rating_threshold": 1}}``."""
    queries: dict[str, str] = {}
    rating_rows: list[tuple[str, int, int]] = []
    for req in requests:
        qid = str(req["id"])
        qnode = (req.get("request") or {}).get("query") or {}
        if len(qnode) != 1 or next(iter(qnode)) != "match":
            raise ValueError(
                f"request {qid!r}: rank_eval batches match queries (one "
                "scan for the whole set) — for other kinds run the query "
                "and call rank_eval_hits"
            )
        spec = next(iter(qnode.values()))
        if isinstance(spec, dict) and "query" not in spec:
            spec = next(iter(spec.values()))
        text = spec["query"] if isinstance(spec, dict) else spec
        queries[qid] = str(text)
        for r in req.get("ratings", []):
            rating_rows.append((qid, int(r["_id"]), int(r["rating"])))
    if not queries:
        raise ValueError("rank_eval needs at least one request")

    mkind, mspec = next(iter(metric.items()))
    if mkind not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {mkind!r}")
    mspec = mspec or {}
    k = int(mspec.get("k", 10))

    from es_indexer_spark.query.engine import topk_many

    hits = topk_many(spark, index_root, queries, k=k, lang=lang)
    ratings = spark.createDataFrame(
        rating_rows or [("", -1, 0)], "qid string, docid long, rating int"
    ).filter(F.col("docid") >= 0)
    return rank_eval_hits(spark, hits, ratings, metric, all_qids=sorted(queries))


def rank_eval_hits(
    spark: SparkSession,
    hits: DataFrame,
    ratings: DataFrame,
    metric: dict,
    *,
    all_qids: list[str] | None = None,
) -> DataFrame:
    """The metric half over an existing ``(qid, docid, score)`` hits frame
    and a ``(qid, docid, rating)`` ratings frame — use for non-match query
    kinds or pre-computed rankings. Requests whose query retrieved nothing
    still get their row (score 0) when listed in ``all_qids``."""
    mkind, mspec = next(iter(metric.items()))
    mspec = mspec or {}
    k = int(mspec.get("k", 10))
    thr = int(mspec.get("relevant_rating_threshold", 1))

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    ranked = (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(ratings), ["qid", "docid"], "left")
    )
    rated = F.count(F.col("rating"))
    unrated = F.count(F.lit(1)) - rated

    if mkind == "precision":
        per = ranked.groupBy("qid").agg(
            (
                F.sum((F.coalesce(F.col("rating"), F.lit(0)) >= thr).cast("int"))
                / F.count(F.lit(1))
            ).alias("metric_score"),
            rated.alias("rated_in_topk"),
            unrated.alias("unrated_in_topk"),
        )
    elif mkind == "recall":
        totals = (
            ratings.filter(F.col("rating") >= thr)
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("__total_rel"))
        )
        per = (
            ranked.groupBy("qid")
            .agg(
                F.sum(
                    (F.coalesce(F.col("rating"), F.lit(0)) >= thr).cast("int")
                ).alias("__rel_ret"),
                rated.alias("rated_in_topk"),
                unrated.alias("unrated_in_topk"),
            )
            .join(totals, "qid", "left")
            .withColumn(
                "metric_score",
                F.when(
                    F.coalesce(F.col("__total_rel"), F.lit(0)) > 0,
                    F.col("__rel_ret") / F.col("__total_rel"),
                ).otherwise(F.lit(0.0)),
            )
            .drop("__rel_ret", "__total_rel")
        )
    elif mkind == "mean_reciprocal_rank":
        per = ranked.groupBy("qid").agg(
            F.coalesce(
                F.lit(1.0)
                / F.min(
                    F.when(
                        F.coalesce(F.col("rating"), F.lit(0)) >= thr,
                        F.col("rank"),
                    )
                ),
                F.lit(0.0),
            ).alias("metric_score"),
            rated.alias("rated_in_topk"),
            unrated.alias("unrated_in_topk"),
        )
    elif mkind == "dcg":
        gain = (
            F.pow(F.lit(2.0), F.coalesce(F.col("rating"), F.lit(0))) - 1.0
        ) / F.log2(F.col("rank") + 1.0)
        per = ranked.groupBy("qid").agg(
            F.sum(gain).alias("metric_score"),
            rated.alias("rated_in_topk"),
            unrated.alias("unrated_in_topk"),
        )
        if bool(mspec.get("normalize", False)):
            wi = Window.partitionBy("qid").orderBy(
                F.desc("rating"), F.asc("docid")
            )
            ideal = (
                ratings.withColumn("rank", F.row_number().over(wi))
                .filter(F.col("rank") <= k)
                .groupBy("qid")
                .agg(
                    F.sum(
                        (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                        / F.log2(F.col("rank") + 1.0)
                    ).alias("__idcg")
                )
            )
            per = (
                per.join(ideal, "qid", "left")
                .withColumn(
                    "metric_score",
                    F.when(
                        F.coalesce(F.col("__idcg"), F.lit(0.0)) > 0,
                        F.col("metric_score") / F.col("__idcg"),
                    ).otherwise(F.lit(0.0)),
                )
                .drop("__idcg")
            )
    else:  # expected_reciprocal_rank
        max_rel = int(mspec.get("maximum_relevance", 4))
        p = (
            F.pow(F.lit(2.0), F.coalesce(F.col("rating"), F.lit(0))) - 1.0
        ) / float(1 << max_rel)
        wr = Window.partitionBy("qid").orderBy("rank")
        stop = F.coalesce(
            F.exp(
                F.sum(F.log(1.0 - p)).over(
                    wr.rowsBetween(Window.unboundedPreceding, -1)
                )
            ),
            F.lit(1.0),
        )
        per = (
            ranked.withColumn("__contrib", p / F.col("rank") * stop)
            .groupBy("qid")
            .agg(
                F.sum("__contrib").alias("metric_score"),
                rated.alias("rated_in_topk"),
                unrated.alias("unrated_in_topk"),
            )
        )

    if all_qids:
        base = spark.createDataFrame([(q,) for q in all_qids], "qid string")
        per = (
            base.join(per, "qid", "left")
            .fillna({"metric_score": 0.0, "rated_in_topk": 0, "unrated_in_topk": 0})
        )
    return per.select(
        "qid",
        F.round("metric_score", 6).alias("metric_score"),
        F.col("rated_in_topk").cast("long").alias("rated_in_topk"),
        F.col("unrated_in_topk").cast("long").alias("unrated_in_topk"),
    ).orderBy("qid")
