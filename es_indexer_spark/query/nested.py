"""ES document-relation queries: ``nested`` and the ``join`` field family
(``has_child`` / ``has_parent`` / ``parent_id`` / ``children`` aggregation).

The reference's STAC records are nested documents (``contacts``, ``links``,
``themes[].concepts`` are arrays of objects —
stacmodel/.../portal_records_index_schema.json:169-258) and ES queries over
them need nested semantics: a predicate over MULTIPLE fields must hold inside
ONE array element, not across different elements (the classic ES
cross-object false-match). Parent/child is the other ES relation model
(``join`` field type) — rebuilt here relationally, because on Spark a
parent/child index IS two DataFrames with an equi-join key.

Spark-first design:

- ``nested`` predicates compile to ``F.exists(arr, struct-lambda)`` —
  evaluated inside whole-stage codegen per row, NO explode, NO shuffle, and
  the surrounding filter still prunes columns/pushes any outer predicates;
- ``nested_agg`` / ``reverse_nested_agg`` explode once and hash-aggregate
  (one map-side-combined shuffle — the same cost ES pays fanning out to
  nested Lucene docs);
- ``has_child`` aggregates matching children per parent key FIRST (map-side
  combine shrinks the child side to ≤ one row per parent) and then
  equi-joins the parents — AQE handles skewed parent keys; ``has_parent``
  filters parents, prunes to the key (+score) columns, and equi-joins the
  children. Neither path ever collects or broadcasts the big side.

ES semantics notes (public behavior): ``has_child`` score_mode ∈ none / sum /
min / max / avg over matching child scores (none = constant 0 like ES's
ignored score); ``min_children`` / ``max_children`` bounds; ``has_parent``
score = parent score when ``score=True`` else 0; ``parent_id`` returns the
children of one parent (constant score).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

_SCORE_MODES = ("none", "sum", "min", "max", "avg")


# --------------------------------------------------------------- nested docs
def nested_query(
    df: DataFrame, nested_col: str, pred: Callable[[Column], Column]
) -> DataFrame:
    """ES ``nested`` query: keep rows where at least ONE element of the
    array-of-struct column satisfies ``pred`` (a lambda over the element).
    The whole point vs a flat filter: ``pred`` can combine several fields of
    the SAME element — ``nested_query(df, "events", lambda e:
    (e.event_type == "click") & (e.value > 100))`` will not match a doc that
    has a click and a large value in DIFFERENT events."""
    return df.filter(F.exists(F.col(nested_col), pred))


def nested_count(
    df: DataFrame, nested_col: str, pred: Callable[[Column], Column]
) -> DataFrame:
    """Per-row count of matching nested elements (ES ``inner_hits`` size /
    the nested doc_count): still codegen column algebra, no explode."""
    return df.withColumn(
        "nested_hits",
        F.size(F.filter(F.col(nested_col), pred)),
    )


def inner_hits(
    df: DataFrame,
    nested_col: str,
    pred: Callable[[Column], Column],
    *,
    size: int = 3,
) -> DataFrame:
    """ES ``nested`` query with ``inner_hits``: parents that match, PLUS the
    matching elements themselves (array order = ES's index order; ES ranks
    inner hits by score, but filter-context nested hits are all score-tied so
    index order is its stable tiebreak). ``size`` caps the returned elements
    per parent (ES default 3). Still pure codegen column algebra — the filter
    + slice run inside the row's projection, no explode, no shuffle, and the
    parent-level match reuses the same predicate (a parent matches iff its
    ``inner_hits`` array is non-empty)."""
    if size < 0:
        raise ValueError(f"inner_hits size must be >= 0, got {size}")
    hits = F.filter(F.col(nested_col), pred)
    return (
        df.withColumn("inner_hits", F.slice(hits, 1, size))
        .withColumn("inner_hit_count", F.size(hits))
        .filter(F.col("inner_hit_count") > 0)
    )


def nested_agg(
    df: DataFrame, nested_col: str, field: str, *, metric_field: str | None = None
) -> DataFrame:
    """ES ``nested`` aggregation + ``terms`` over a nested field: explode the
    array once and hash-aggregate — ``doc_count`` counts NESTED docs (ES
    counts the Lucene child docs, not the roots). ``metric_field`` adds an
    avg sub-aggregation over another field of the same element."""
    ex = df.select(F.explode(nested_col).alias("__n"))
    out = ex.groupBy(F.col(f"__n.{field}").alias(field)).agg(
        F.count(F.lit(1)).alias("doc_count"),
        *(
            [F.avg(F.col(f"__n.{metric_field}")).alias(f"avg_{metric_field}")]
            if metric_field
            else []
        ),
    )
    return out.orderBy(F.desc("doc_count"), F.asc(field))


def reverse_nested_agg(
    df: DataFrame, id_col: str, nested_col: str, field: str
) -> DataFrame:
    """ES ``reverse_nested`` under a nested ``terms``: per nested bucket, the
    number of distinct ROOT documents (joining back out of nested context).
    One explode + one distinct-aggregate; the distinct happens inside the
    hash agg (count(DISTINCT id) with map-side partials), no second join."""
    ex = df.select(F.col(id_col), F.explode(nested_col).alias("__n"))
    return (
        ex.groupBy(F.col(f"__n.{field}").alias(field))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct(F.col(id_col)).alias("root_doc_count"),
        )
        .orderBy(F.desc("doc_count"), F.asc(field))
    )


# ------------------------------------------------------------- join field
def has_child(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_parent_key: str,
    child_pred: Column,
    score_mode: str = "none",
    child_score: Column | None = None,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """ES ``has_child``: parents having between ``min_children`` and
    ``max_children`` children matching ``child_pred``; ``_score`` combines
    the matching children's ``child_score`` by ``score_mode`` (ES semantics;
    ``none`` scores 0 and needs no child score expression).

    Plan shape: filter+aggregate the child side to one row per parent key
    (map-side combine), then inner-equi-join the parents — at 100 TB both
    sides stay distributed and the shuffle carries only matching parent keys.
    """
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if score_mode != "none" and child_score is None:
        raise ValueError(f"score_mode={score_mode!r} needs child_score")
    if min_children < 1:
        raise ValueError("min_children must be >= 1 (ES default 1)")
    matched = children.filter(child_pred)
    aggs = [F.count(F.lit(1)).alias("child_count")]
    if score_mode != "none":
        fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[score_mode]
        aggs.append(fn(child_score.cast("double")).alias("_score"))
    per_parent = matched.groupBy(
        F.col(child_parent_key).alias("__pk")
    ).agg(*aggs)
    per_parent = per_parent.filter(F.col("child_count") >= int(min_children))
    if max_children is not None:
        per_parent = per_parent.filter(F.col("child_count") <= int(max_children))
    if score_mode == "none":
        per_parent = per_parent.withColumn("_score", F.lit(0.0))
    return parents.join(
        per_parent, parents[parent_key] == per_parent["__pk"], "inner"
    ).drop("__pk")


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_parent_key: str,
    parent_pred: Column,
    score: bool = False,
    parent_score: Column | None = None,
) -> DataFrame:
    """ES ``has_parent``: children whose parent matches ``parent_pred``;
    ``_score`` = the parent's score when ``score=True`` (every child of the
    same parent inherits it — ES behavior), else 0. The parent side is
    filtered and pruned to (key, score) before the equi-join."""
    if score and parent_score is None:
        raise ValueError("score=True needs parent_score")
    cols = [F.col(parent_key).alias("__pk")]
    if score:
        cols.append(parent_score.cast("double").alias("_score"))
    keep = parents.filter(parent_pred).select(*cols)
    out = children.join(
        keep, children[child_parent_key] == keep["__pk"], "inner"
    ).drop("__pk")
    return out if score else out.withColumn("_score", F.lit(0.0))


def parent_id_query(
    children: DataFrame, child_parent_key: str, parent_id
) -> DataFrame:
    """ES ``parent_id``: the children of one parent (constant score 1.0, the
    ES behavior). A point equi-filter — parquet row-group prunable when the
    child table is laid out by the parent key."""
    return children.filter(F.col(child_parent_key) == F.lit(parent_id)).withColumn(
        "_score", F.lit(1.0)
    )


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_parent_key: str,
    group_field: str,
    child_metric: Column,
    metric_name: str = "metric",
) -> DataFrame:
    """ES ``children`` aggregation: bucket PARENTS by ``group_field``, then
    aggregate a metric over each bucket's CHILDREN (the join-field analog of
    nested_agg). One equi-join (parents pruned to key+bucket) + one hash
    agg; ``doc_count`` counts child docs per ES."""
    keyed = parents.select(
        F.col(parent_key).alias("__pk"), F.col(group_field)
    )
    joined = children.join(
        keyed, children[child_parent_key] == keyed["__pk"], "inner"
    )
    return (
        joined.groupBy(group_field)
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            child_metric.alias(metric_name),
        )
        .orderBy(F.asc(group_field))
    )


def parent_agg(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_parent_key: str,
    group_field: str,
    parent_metric: Column,
    metric_name: str = "metric",
) -> DataFrame:
    """ES ``parent`` aggregation (the reverse of :func:`children_agg`):
    bucket CHILDREN by ``group_field``, then aggregate over each bucket's
    DISTINCT parents — a parent counts once per bucket no matter how many of
    its children land there (ES doc_count semantics in parent context;
    ``doc_count`` = distinct parents per bucket).

    Plan shape: the child side reduces to DISTINCT (bucket, parent-key)
    pairs BEFORE the join (map-side combinable), so the join carries at most
    |buckets| x |parents| rows and the parent table is scanned once,
    column-pruned to the key + metric inputs."""
    pairs = children.select(
        F.col(group_field), F.col(child_parent_key).alias("__pk")
    ).distinct()
    keyed = parents.withColumn("__pk", F.col(parent_key))
    return (
        pairs.join(keyed, "__pk")
        .groupBy(group_field)
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            parent_metric.alias(metric_name),
        )
        .orderBy(F.asc(group_field))
    )
