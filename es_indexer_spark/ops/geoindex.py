"""Cloud-optimized data-index assembly — the reference's SECOND pipeline
(cloudoptimized/ module, SURVEY.md §0): observation points → per-month count
aggregates → GeoJSON FeatureCollection documents for the ``es-coindexer-*``
data index (schema: stacmodel/src/main/resources/schema/data_index_schema.json:3-35
— nested ``features[]`` with Point geometry and
``properties.{date, count, collection}``), with the reference's oversize-doc
splitter: FeatureCollections are chunked at ``max_features`` features
(9000 — IndexCloudOptimizedServiceImpl.java:199-219).

Spark-first shape (pure column algebra, zero Python in the hot path):

1. partial+final hash agg of points by ``(collection, month, lon, lat)``
   (the reference's only true partial/final agg —
   DataAccessServiceImpl.java:459-472; Catalyst does map-side combine);
2. one window per ``(collection, month)`` assigns a deterministic feature
   rank (ORDER BY lon, lat) whose integer division yields the chunk id —
   the splitter as arithmetic, not iteration;
3. per-chunk assembly via ``sort_array(collect_list(struct(rank, feature)))``
   → ``array_join`` (collect_list alone has no order guarantee).

Scale: stage 1 reduces raw points to distinct cells before anything else, so
the stage-2 window runs over cell counts, not observations; its partition key
``(collection, month)`` is the reference's own fan-out unit
(DatasetProvider.java:29-34 runs one task per YearMonth). A month whose
DISTINCT-CELL count is itself huge would need a pre-bucketed rank (range
partition on lon) — at the reference's data shapes cells/month ≪ 10^8, which
one executor handles comfortably.

Cross-engine determinism note: feature JSON is built by string concat of the
raw column values, so lon/lat should be integral or decimal types when exact
byte-equality against another engine matters (double formatting differs);
production use with doubles is fine (the reference writes 15-digit doubles —
that writer lives in ops/mapper.py ``polygon_geojson``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")

# the reference's hard cap on nested features per document
MAX_FEATURES = 9000


def cell_counts(
    df: DataFrame,
    *,
    collection_col: str = "collection",
    time_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Partial+final hash agg of observation points into per-cell monthly
    counts: ``(collection, month, lon, lat, cnt)`` — the shared reduction
    under both the FeatureCollection writer and the queryable data index
    (reference: DataAccessServiceImpl.java:459-472)."""
    return (
        df.select(
            F.col(collection_col).alias("collection"),
            F.date_format(F.date_trunc("month", F.col(time_col)), "yyyy-MM").alias(
                "month"
            ),
            F.col(lon_col).alias("lon"),
            F.col(lat_col).alias("lat"),
        )
        .groupBy("collection", "month", "lon", "lat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def point_features(
    df: DataFrame,
    *,
    collection_col: str = "collection",
    time_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Aggregate observation points into per-cell monthly counts with the
    GeoJSON Feature string attached:
    ``(collection, month, lon, lat, cnt, feature)``."""
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    agg = cell_counts(
        df,
        collection_col=collection_col,
        time_col=time_col,
        lon_col=lon_col,
        lat_col=lat_col,
    )
    return agg.withColumn(
        "feature",
        F.concat(
            F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
            s("lon"), F.lit(","), s("lat"),
            F.lit(']},"properties":{"date":"'), F.col("month"),
            F.lit('","count":'), s("cnt"),
            F.lit(',"collection":"'), F.col("collection"),
            F.lit('"}}'),
        ),
    )


def feature_collections(
    df: DataFrame,
    *,
    collection_col: str = "collection",
    time_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_features: int = MAX_FEATURES,
) -> DataFrame:
    """Assemble the data-index documents:
    ``(collection, month, chunk_id, n_features, doc)`` where ``doc`` is a
    GeoJSON FeatureCollection of at most ``max_features`` features (the
    oversize splitter), features deterministically ordered by (lon, lat)."""
    feats = point_features(
        df,
        collection_col=collection_col,
        time_col=time_col,
        lon_col=lon_col,
        lat_col=lat_col,
    )
    w = Window.partitionBy("collection", "month").orderBy("lon", "lat")
    ranked = feats.withColumn("rn", F.row_number().over(w)).withColumn(
        "chunk_id", ((F.col("rn") - 1) / max_features).cast("long")
    )
    return (
        ranked.groupBy("collection", "month", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.array_join(
                # sort_array on struct(rn, feature) restores the window order —
                # collect_list has no ordering guarantee
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "feature"))),
                    lambda x: x["feature"],
                ),
                ",",
            ).alias("features_body"),
        )
        .select(
            "collection",
            "month",
            "chunk_id",
            "n_features",
            F.concat(
                F.lit('{"type":"FeatureCollection","features":['),
                F.col("features_body"),
                F.lit("]}"),
            ).alias("doc"),
        )
    )


# ------------------------------------------------------------------ read side
# The reference exists to SERVE this index: the portal's map hits the
# es-coindexer-* data index with a geo_bounding_box + date-range filter on
# every page load (README.md:5-7; geo_shape fields in
# stacmodel/src/main/resources/schema/data_index_schema.json:14-18). The
# write below lays the cell table out so that exactly that query prunes at
# every level Spark offers: directory (collection partition), file (range
# clustering on (month, cell_x)), and row-group (parquet min/max on the
# sorted month/lon/lat columns) — a bbox+month scan over a 100 TB index
# touches only the files whose lon range and month run intersect the query.


def write_geo_index(
    df: DataFrame,
    path: str,
    *,
    collection_col: str = "collection",
    time_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_deg: float = 5.0,
    n_files: int = 8,
) -> None:
    """Aggregate observation points and write the queryable per-cell monthly
    count table.

    Layout for pruning: ``partitionBy(collection)`` (directory pruning on the
    collection filter), ``repartitionByRange(month, cell_x)`` where ``cell_x
    = floor(lon / cell_deg)`` (each output file spans one narrow lon band of
    one month run — file-level min/max pruning for bbox scans), and
    ``sortWithinPartitions(month, cell_x, lon, lat)`` (row-group min/max
    stats stay tight inside each file). ``n_files`` is the range-partition
    count — size it so files land near the cluster's preferred file size
    (128–512 MB) at the real data volume."""
    cells = cell_counts(
        df,
        collection_col=collection_col,
        time_col=time_col,
        lon_col=lon_col,
        lat_col=lat_col,
    ).withColumn("cell_x", F.floor(F.col("lon") / F.lit(float(cell_deg))))
    (
        cells.repartitionByRange(n_files, "collection", "month", "cell_x")
        .sortWithinPartitions("collection", "month", "cell_x", "lon", "lat")
        .write.mode("overwrite")
        .partitionBy("collection")
        .parquet(path)
    )


def upsert_geo_collections(
    df: DataFrame,
    path: str,
    *,
    collection_col: str = "collection",
    time_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_deg: float = 5.0,
    n_files: int = 8,
) -> None:
    """Incrementally re-index the collections PRESENT in ``df``: their cell
    aggregates replace the stored ones; every other collection's files are
    untouched (the reference re-indexes cloud-optimized data per collection
    UUID — IndexerController.java:240-257 →
    IndexCloudOptimizedServiceImpl.java — rather than rebuilding the index).

    Execution: the same aggregate + layout as :func:`write_geo_index`, written
    with DYNAMIC partition overwrite — Spark replaces only the
    ``collection=<x>`` directories that receive rows, atomically per
    partition directory. That is the idiomatic Spark incremental rewrite: no
    read-modify-write of the untouched collections, no tombstones needed
    (the cell table is a derived aggregate, so replacement IS the upsert),
    and the pruning layout (range clustering + sorted row groups) is rebuilt
    only for the replaced collections."""
    cells = cell_counts(
        df,
        collection_col=collection_col,
        time_col=time_col,
        lon_col=lon_col,
        lat_col=lat_col,
    ).withColumn("cell_x", F.floor(F.col("lon") / F.lit(float(cell_deg))))
    (
        cells.repartitionByRange(n_files, "collection", "month", "cell_x")
        .sortWithinPartitions("collection", "month", "cell_x", "lon", "lat")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("collection")
        .parquet(path)
    )


def geo_bbox_query(
    spark,
    path: str,
    bbox: tuple[float, float, float, float],
    *,
    date_range: tuple[str, str] | None = None,
    collections: list[str] | tuple[str, ...] | None = None,
) -> DataFrame:
    """ES ``geo_bounding_box`` (+ optional date range / collection terms)
    over the data index written by :func:`write_geo_index` — the portal's
    map query. Returns the matching cells
    ``(collection, month, lon, lat, cnt)``.

    ``bbox = (min_lon, min_lat, max_lon, max_lat)``; a bbox with
    ``min_lon > max_lon`` crosses the antimeridian and splits into the OR of
    two lon ranges (ES geo_bounding_box semantics — both disjuncts still
    push into the parquet scan). ``date_range = ("yyyy-MM", "yyyy-MM")`` is
    inclusive on months (lexicographic = chronological for zero-padded
    months). Every predicate is a plain comparison on a stored column, so
    Catalyst pushes all of them to the scan; the write layout turns them
    into directory/file/row-group pruning."""
    import math

    min_lon, min_lat, max_lon, max_lat = bbox
    df = spark.read.parquet(path)
    # coerce bounds to the stored column's type: a float literal against an
    # integral lon/lat column makes Spark CAST THE COLUMN, and a cast column
    # is not parquet-pushable — ceil/floor keeps the predicate exactly
    # equivalent for integers while restoring row-group pruning
    dtypes = dict(df.dtypes)

    def lo(col, v):
        return int(math.ceil(v)) if dtypes[col] in _INT_TYPES else v

    def hi(col, v):
        return int(math.floor(v)) if dtypes[col] in _INT_TYPES else v

    if min_lon <= max_lon:
        lon_pred = (F.col("lon") >= lo("lon", min_lon)) & (
            F.col("lon") <= hi("lon", max_lon)
        )
    else:  # antimeridian-crossing box
        lon_pred = (F.col("lon") >= lo("lon", min_lon)) | (
            F.col("lon") <= hi("lon", max_lon)
        )
    df = df.filter(
        lon_pred
        & (F.col("lat") >= lo("lat", min_lat))
        & (F.col("lat") <= hi("lat", max_lat))
    )
    if collections is not None:
        df = df.filter(F.col("collection").isin(list(collections)))
    if date_range is not None:
        lo, hi = date_range
        df = df.filter((F.col("month") >= lo) & (F.col("month") <= hi))
    return df.select("collection", "month", "lon", "lat", "cnt")


def geo_bbox_features(
    spark,
    path: str,
    bbox: tuple[float, float, float, float],
    *,
    date_range: tuple[str, str] | None = None,
    collections: list[str] | tuple[str, ...] | None = None,
) -> DataFrame:
    """:func:`geo_bbox_query` with the GeoJSON Feature string attached —
    the map tile's render payload (same shape the FeatureCollection docs
    nest, data_index_schema.json:3-35)."""
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    return geo_bbox_query(
        spark, path, bbox, date_range=date_range, collections=collections
    ).withColumn(
        "feature",
        F.concat(
            F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
            s("lon"), F.lit(","), s("lat"),
            F.lit(']},"properties":{"date":"'), F.col("month"),
            F.lit('","count":'), s("cnt"),
            F.lit(',"collection":"'), F.col("collection"),
            F.lit('"}}'),
        ),
    )


EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius, the Lucene/ES constant


def geo_distance_query(
    spark,
    path: str,
    lon: float,
    lat: float,
    radius_km: float,
    *,
    date_range: tuple[str, str] | None = None,
    collections: list[str] | tuple[str, ...] | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """ES ``geo_distance`` filter over the data index: cells within
    ``radius_km`` of (lon, lat), with the great-circle distance attached.

    Two-phase, the same design ES/Lucene use: (1) a radius-derived bounding
    box is PUSHED into the parquet scan (lat window = r / R rad; lon window
    lat-scaled by the band edge nearest a pole, widening to a full lon scan
    when the cap crosses a pole — never an unsound shortcut), reusing
    :func:`geo_bbox_query` so an antimeridian-wrapping window still prunes;
    (2) the exact haversine — pure JVM column math inside whole-stage
    codegen — keeps true members and emits ``distance_km`` (rounded to
    ``ndigits`` for cross-engine replay stability)."""
    import math

    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    min_lat = max(-90.0, lat - dlat)
    max_lat = min(90.0, lat + dlat)
    band_edge = min(89.9999, max(abs(min_lat), abs(max_lat)))
    cos_edge = math.cos(math.radians(band_edge))
    dlon = (
        180.0
        if cos_edge <= 1e-9
        else min(180.0, math.degrees(radius_km / (EARTH_RADIUS_KM * cos_edge)))
    )
    if dlon >= 180.0 or lat + dlat > 90.0 or lat - dlat < -90.0:
        bbox = (-180.0, min_lat, 180.0, max_lat)  # cap wraps a pole: all lons
    else:
        wrap = lambda x: ((x + 180.0) % 360.0) - 180.0  # noqa: E731
        bbox = (wrap(lon - dlon), min_lat, wrap(lon + dlon), max_lat)
    cand = geo_bbox_query(
        spark, path, bbox, date_range=date_range, collections=collections
    )
    lam1, phi1 = math.radians(lon), math.radians(lat)
    lam2, phi2 = F.radians(F.col("lon")), F.radians(F.col("lat"))
    h = (
        F.pow(F.sin((phi2 - F.lit(phi1)) / 2), 2)
        + F.lit(math.cos(phi1)) * F.cos(phi2)
        * F.pow(F.sin((lam2 - F.lit(lam1)) / 2), 2)
    )
    dist = F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))
    return (
        cand.withColumn("distance_km", F.round(dist, ndigits))
        .filter(F.col("distance_km") <= float(radius_km))
    )
