"""Relational operator coverage over the TPC-H-ish test tables.

Each function maps 1:1 to a SURVEY.md §2 operator row (cited inline) and is paired
with an ANSI-SQL oracle in ``__spark_entry__``. All plans are declarative DataFrame
algebra: Catalyst supplies pushdown, partial aggregation, and broadcast joins; the
explicit ``F.broadcast`` marks the small dimension sides (reference pattern J1-J3:
cached vocab/CSV lookups -> broadcast dimension joins).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def agg_partial_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: partial+final hash aggregation — group events by (type, hour) -> count
    + sum (reference: DataAccessServiceImpl.java:459-472 count-by-key merge)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def minmax_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: min/max fold over temporal values per group (TemporalUtils.java:24-60)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        F.count("*").alias("n_orders"),
    )


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J3: fact ⋈ broadcast dimension chain — customers per region with account
    stats (reference: cached vocab lookups VocabServiceImpl.java:299-335)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def related_record_links(
    records: DataFrame,
    assoc: DataFrame,
    *,
    id_col: str = "doc_id",
    rec_col: str = "record_id",
    rel_col: str = "rel",
    related_col: str = "related_id",
    title_col: str = "title",
    abstract_col: str = "description",
) -> DataFrame:
    """J4 — record ↔ related-records links, the reference's associated-records
    shape (AssociatedRecordsUtil.generateAssociatedRecords, indexer/.../utils/
    AssociatedRecordsUtil.java:16-61; consumed into STAC ``links[]`` at
    StacCollectionMapperService.java:857-859).

    ``assoc`` is the related-records dimension: one row per
    (record, relation, related record) with the related record's title and
    abstract. Per reference semantics each link is
    ``{href: "uuid:"+id, rel, title: json({title, recordAbstract}),
    type: "application/json"}`` and links are ordered parent → siblings →
    children (:21-39; ties by related id for determinism). Relations outside
    {parent, sibling, child} are ignored, exactly as generateAssociatedRecords
    only reads those three keys.

    Execution: the dimension aggregates FIRST (one hash agg on the dim,
    orders of magnitude smaller than the records fact), then broadcast
    left-joins onto the records — the fact table never shuffles."""
    rel = F.col(rel_col)
    rank = (
        F.when(rel == "parent", 0)
        .when(rel == "sibling", 1)
        .when(rel == "child", 2)
    )
    link = F.struct(
        F.concat(F.lit("uuid:"), F.col(related_col).cast("string")).alias("href"),
        rel.alias("rel"),
        F.to_json(
            F.struct(
                F.col(title_col).alias("title"),
                F.col(abstract_col).alias("recordAbstract"),
            )
        ).alias("title"),
        F.lit("application/json").alias("type"),
    )
    dim = (
        assoc.filter(rel.isin("parent", "sibling", "child"))
        .select(
            F.col(rec_col).alias("__rec"),
            F.struct(
                rank.alias("rank"),
                F.col(related_col).cast("string").alias("rid"),
                link.alias("link"),
            ).alias("entry"),
        )
        .groupBy("__rec")
        .agg(F.sort_array(F.collect_list("entry")).alias("entries"))
        .select(
            "__rec",
            F.transform("entries", lambda e: e["link"]).alias("links"),
        )
    )
    out = records.join(
        F.broadcast(dim), records[id_col] == dim["__rec"], "left"
    ).drop("__rec")
    empty = F.array().cast(
        "array<struct<href:string,rel:string,title:string,type:string>>"
    )
    return out.withColumn("links", F.coalesce(F.col("links"), empty))


def cloud_asset_entries(
    records: DataFrame,
    datasets: DataFrame,
    *,
    id_col: str = "doc_id",
    rec_col: str = "record_id",
    key_col: str = "key",
    dname_col: str = "dname",
) -> DataFrame:
    """J5 — record ↔ cloud-optimized assets, the reference's STAC ``assets``
    map (StacCollectionMapperService.java mapAssetsData:1244-1264; media type
    rule getMediaTypeFromDname:1266-1277).

    ``datasets`` is the data-access dimension: (record, dataset key, optional
    dname). Each entry becomes ``key -> {role: "summary", type:
    parquet/zarr/json by dname suffix, href: null, title: dname or key,
    description: "Summary of cloud optimized data points"}``; records with no
    datasets get a NULL map (the reference returns null, not {}).

    Same execution shape as :func:`related_record_links`: dim-side aggregate,
    broadcast left join, fact never shuffles."""
    dname = F.coalesce(F.col(dname_col), F.col(key_col))
    media = (
        F.when(dname.endswith(".parquet"), "application/x-parquet")
        .when(dname.endswith(".zarr"), "application/x-zarr")
        .otherwise("application/json")
    )
    asset = F.struct(
        F.lit("summary").alias("role"),
        media.alias("type"),
        F.lit(None).cast("string").alias("href"),
        dname.alias("title"),
        F.lit("Summary of cloud optimized data points").alias("description"),
    )
    dim = (
        datasets.select(
            F.col(rec_col).alias("__rec"),
            F.struct(F.col(key_col).alias("key"), asset.alias("asset")).alias("entry"),
        )
        .groupBy("__rec")
        .agg(F.sort_array(F.collect_list("entry")).alias("entries"))
        .select(
            "__rec",
            F.map_from_entries(
                F.transform("entries", lambda e: F.struct(e["key"], e["asset"]))
            ).alias("assets"),
        )
    )
    return records.join(
        F.broadcast(dim), records[id_col] == dim["__rec"], "left"
    ).drop("__rec")


def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/§2.5: max-by via row_number window — each customer's most recent order
    (reference: max-version citation pick, StacCollectionMapperService.java:271-301)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct — unique (event_type, user_id) pairs
    (reference: Stream.distinct / array_distinct merges)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_type", "user_id").distinct()


def topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-shape relational top-k: top 10 orders by discounted revenue with pushed
    filter + pruned columns (P1 projection pushdown + T5 order/limit)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1995-01-01"))
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def filter_project_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 + A1: TPC-H Q1 shape — pushed predicate, pruned columns, wide agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/S4: count-reconciliation — row counts per table for the publish gate
    (reference: indexed >= 90% of source, IndexerMetadataServiceImpl.java:639-655)."""
    rows = []
    for t in ("orders", "lineitem", "customer"):
        rows.append((t, load(spark, sf_dir, t).count()))
    return spark.createDataFrame(rows, "table_name string, n_rows long")


def set_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set ops: unionByName + array_distinct merge — per user, distinct sorted
    event types (reference: vocab list concat + distinct,
    IndexerMetadataServiceImpl.java:303-320)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_list("event_type")), ","
        ).alias("event_types"),
        F.count("*").alias("n_types"),
    )


def status_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: when/rlike classifier cascade — order priority class
    (reference: DeliveryModeUtils.java:26-103 status normalizer)."""
    o = load(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").rlike("^1|^2"), F.lit("urgent"))
        .when(F.col("o_orderpriority").rlike("^3"), F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return o.groupBy(cls.alias("priority_class")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def date_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: date widening/normalization — orders bucketed to month start, UTC
    (reference: 5-case date parser, StacCollectionMapperService.java:174-231)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").alias("n_orders")
    )


def ranking_score(spark, sf_dir: str):
    """Completeness/relevance ranking score — the reference's weighted-sum
    ranking (indexer/.../RankingServiceImpl.java:18-58 weights, :60-169 logic)
    re-expressed as pure vectorized column algebra over the documents table:
    capped description-length term (min(len*0.01, 25)), bucketed richness term
    (token count ≤50/≤150/>150 → 10/15/20), +10 per present metadata field.
    Fully whole-stage-codegen — no UDF."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_tok = F.size(F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""))
    score = (
        F.least(F.length("text") * 0.01, F.lit(25.0))
        + F.when(n_tok <= 50, 10.0).when(n_tok <= 150, 15.0).otherwise(20.0)
        + F.when(F.col("lang").isNotNull() & (F.col("lang") != ""), 10.0).otherwise(0.0)
        + F.when(F.col("source").isNotNull() & (F.col("source") != ""), 10.0).otherwise(0.0)
    )
    return docs.select(
        "doc_id", F.round(score, 4).alias("rank_score")
    )
