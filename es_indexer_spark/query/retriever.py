"""ES 8.14+ ``retriever`` search-body tree.

The modern ES search API replaces the top-level ``query``/``knn`` pair with a
composable retriever tree: ``standard`` (a classic query), ``knn`` (vector
search), and ``rrf`` (reciprocal rank fusion over child retrievers — the same
published formula ``score(d) = Σ_r 1/(rank_constant + rank_r(d))`` that
:func:`es_indexer_spark.ops.similarity.rrf_topk` implements for the fixed
BM25+knn pair; this module generalizes the fusion to ANY children, including
nested ``rrf``). The reference's portal consumes the classic API, but the ES
cluster it writes to serves both — a user switching to this engine keeps the
retriever request shape.

Execution notes (100 TB): each child retriever runs its OWN distributed
top-``rank_window_size`` plan (block-max BM25 / pruned vector scan); the rank
window and the fusion operate on the union of those ≤window-row frames —
request-sized, one unionByName + one hash agg, never corpus-sized.
``text_similarity_reranker`` needs an inference model and raises by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def rrf_fuse(
    frames: list[DataFrame],
    *,
    rank_constant: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank-fuse already-windowed hit frames.

    Each frame must carry ``docid`` plus its own ordering column (``score``,
    else ``cosine``); ranks use that ordering desc with ties by docid asc —
    exactly the per-leg ranking of ``rrf_topk`` (and of the ES formula).
    Returns ``(docid, score)`` with the fused score rounded to 8 dp, ordered
    (score desc, docid asc), limited to ``k``.

    The ``row_number`` window is single-partition BY DESIGN: its input is one
    retriever's ≤rank_window_size rows, not the corpus.
    """
    if not frames:
        raise ValueError("rrf_fuse needs at least one child frame")
    from pyspark.sql import Window

    rc = int(rank_constant)
    legs = []
    for fr in frames:
        if "docid" not in fr.columns:
            if "vec_id" in fr.columns:
                fr = fr.withColumnRenamed("vec_id", "docid")
            else:
                raise ValueError(
                    f"child frame has no docid/vec_id column: {fr.columns}"
                )
        order_col = "score" if "score" in fr.columns else "cosine"
        w = Window.orderBy(F.desc(order_col), F.asc("docid"))
        legs.append(
            fr.withColumn("_r", F.row_number().over(w)).select(
                "docid",
                (F.lit(1.0) / (F.lit(rc) + F.col("_r"))).alias("s"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return (
        out.groupBy("docid")
        .agg(F.round(F.sum("s"), 8).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(int(k))
    )


def retriever_hits(
    spark: SparkSession,
    index_root: str,
    node: dict,
    k: int,
    *,
    emb_df: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    lang: str | None = None,
    **backings,
) -> DataFrame:
    """Evaluate one retriever node to its top-``k`` hits frame.

    ``standard.filter`` clauses wrap the query in a bool filter context (the
    ES contract); ``knn`` lowers onto the existing top-level knn section;
    ``rrf`` recurses into each child with ``k = rank_window_size`` and fuses
    with :func:`rrf_fuse`. ``backings`` forward the non-postings tables
    (``src_df`` / ``geo_root`` / ``shape_df`` / ``nested_df`` /
    ``queries_df``) to the classic dispatch unchanged.
    """
    from es_indexer_spark.query.dsl import search

    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(
            "a retriever node is a one-key dict "
            "(standard / knn / rrf / text_similarity_reranker)"
        )
    (kind, spec), = node.items()
    common = dict(
        emb_df=emb_df, emb_id_col=emb_id_col, emb_vec_col=emb_vec_col,
        lang=lang, **backings,
    )
    if kind == "standard":
        qnode = spec.get("query") or {"match_all": {}}
        filts = spec.get("filter")
        if filts:
            filts = filts if isinstance(filts, list) else [filts]
            qnode = {"bool": {"must": [qnode], "filter": filts}}
        return search(spark, index_root, {"query": qnode, "size": int(k)}, **common)
    if kind == "knn":
        knn = dict(spec)
        knn.pop("filter_", None)
        knn.setdefault("k", int(k))
        return search(spark, index_root, {"knn": knn, "size": int(k)}, **common)
    if kind == "rrf":
        children = spec.get("retrievers")
        if not children:
            raise ValueError("rrf retriever needs a non-empty retrievers list")
        window = int(spec.get("rank_window_size", 100))
        frames = [
            retriever_hits(spark, index_root, child, window, **common)
            for child in children
        ]
        return rrf_fuse(
            frames, rank_constant=int(spec.get("rank_constant", 60)), k=int(k)
        )
    if kind == "text_similarity_reranker":
        raise NotImplementedError(
            "text_similarity_reranker needs an inference (rerank) model — "
            "no ML runtime in this engine; fuse with rrf or rescore instead"
        )
    raise ValueError(f"unsupported retriever kind: {kind!r}")
