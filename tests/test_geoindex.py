"""Cloud-optimized data-index assembly (ops/geoindex.py): per-month cell
counts -> GeoJSON FeatureCollection docs with the reference's oversize
splitter (>max_features features -> chunks;
IndexCloudOptimizedServiceImpl.java:199-219, data_index_schema.json:3-35)."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from es_indexer_spark.ops.geoindex import feature_collections, point_features


def _pts(spark):
    # 3 collections x 2 months; lon/lat cells from arithmetic, with repeats so
    # counts exceed 1 for some cells
    return spark.range(400).select(
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("collection"),
        F.to_timestamp(
            F.concat(F.lit("2024-0"), ((F.col("id") % 2) + 1).cast("string"),
                     F.lit("-15 12:00:00"))
        ).alias("ts"),
        (F.col("id") % 19).alias("lon"),
        ((F.col("id") * 3) % 11).alias("lat"),
    )


def test_chunking_invariants(spark):
    pts = _pts(spark)
    out = feature_collections(pts, max_features=7).collect()
    cells = point_features(pts).count()
    assert sum(r["n_features"] for r in out) == cells
    assert all(r["n_features"] <= 7 for r in out)
    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r["collection"], r["month"]), []).append(r)
    for (coll, month), chunks in by_group.items():
        ids = sorted(c["chunk_id"] for c in chunks)
        assert ids == list(range(len(ids))), "chunk ids contiguous from 0"
        n = sum(c["n_features"] for c in chunks)
        assert len(ids) == math.ceil(n / 7)
        # only the LAST chunk may be short
        for c in chunks:
            if c["chunk_id"] < len(ids) - 1:
                assert c["n_features"] == 7


def test_docs_are_valid_geojson_with_matching_counts(spark):
    pts = _pts(spark)
    out = feature_collections(pts, max_features=50).collect()
    total_points = 0
    for r in out:
        doc = json.loads(r["doc"])
        assert doc["type"] == "FeatureCollection"
        assert len(doc["features"]) == r["n_features"]
        for f in doc["features"]:
            assert f["geometry"]["type"] == "Point"
            assert f["properties"]["date"] == r["month"]
            assert f["properties"]["collection"] == r["collection"]
            total_points += f["properties"]["count"]
    assert total_points == pts.count()


def test_feature_order_deterministic(spark):
    pts = _pts(spark)
    a = feature_collections(pts, max_features=9).collect()
    b = feature_collections(pts.repartition(7), max_features=9).collect()
    key = lambda r: (r["collection"], r["month"], r["chunk_id"])  # noqa: E731
    assert sorted(((key(r), r["doc"]) for r in a)) == sorted(
        ((key(r), r["doc"]) for r in b)
    )


# ---- round 4: queryable data index + geo_bounding_box read surface ---------


def _geo_root(spark, tmp_path_factory):
    from es_indexer_spark.ops.geoindex import write_geo_index

    path = str(tmp_path_factory.mktemp("geoidx") / "cells")
    write_geo_index(_pts(spark), path, cell_deg=5.0, n_files=4)
    return path


def _brute_cells(spark, bbox, months=None, colls=None):
    """Independent per-row aggregation of _pts for the same bbox."""
    rows = _pts(spark).collect()
    agg: dict[tuple, int] = {}
    for r in rows:
        m = f"{r['ts'].year:04d}-{r['ts'].month:02d}"
        key = (r["collection"], m, r["lon"], r["lat"])
        agg[key] = agg.get(key, 0) + 1
    min_lon, min_lat, max_lon, max_lat = bbox
    out = []
    for (c, m, lon, lat), n in agg.items():
        if min_lon <= max_lon:
            ok_lon = min_lon <= lon <= max_lon
        else:
            ok_lon = lon >= min_lon or lon <= max_lon
        if not (ok_lon and min_lat <= lat <= max_lat):
            continue
        if months and not (months[0] <= m <= months[1]):
            continue
        if colls and c not in colls:
            continue
        out.append((c, m, lon, lat, n))
    return sorted(out)


def test_geo_bbox_query_matches_brute(spark, tmp_path_factory):
    from es_indexer_spark.ops.geoindex import geo_bbox_query

    path = _geo_root(spark, tmp_path_factory)
    bbox = (3, 2, 11, 8)
    got = sorted(
        tuple(r) for r in geo_bbox_query(spark, path, bbox).collect()
    )
    assert got == _brute_cells(spark, bbox)
    # with date range + collection terms
    got2 = sorted(
        tuple(r)
        for r in geo_bbox_query(
            spark, path, bbox,
            date_range=("2024-02", "2024-02"), collections=["c0", "c2"],
        ).collect()
    )
    assert got2 == _brute_cells(
        spark, bbox, months=("2024-02", "2024-02"), colls={"c0", "c2"}
    )
    assert got2 and got2 != got


def test_geo_bbox_antimeridian(spark, tmp_path_factory):
    from es_indexer_spark.ops.geoindex import geo_bbox_query

    path = _geo_root(spark, tmp_path_factory)
    # min_lon > max_lon: ES semantics — the box crosses the antimeridian,
    # matching lon >= 15 OR lon <= 2 (our synthetic lons are 0..18)
    bbox = (15, 0, 2, 10)
    got = sorted(tuple(r) for r in geo_bbox_query(spark, path, bbox).collect())
    assert got == _brute_cells(spark, bbox)
    lons = {r[2] for r in got}
    assert lons and all(lon >= 15 or lon <= 2 for lon in lons)


def test_geo_bbox_plan_prunes(spark, tmp_path_factory):
    """The portal-map query must push every predicate to the scan: collection
    as a PartitionFilter (directory pruning) and lon/lat/month as
    PushedFilters (file + row-group min/max pruning on the range-clustered,
    sorted layout). No Filter may sit above a full-table scan."""
    from es_indexer_spark.ops.geoindex import geo_bbox_query

    path = _geo_root(spark, tmp_path_factory)
    # default maxMetadataStringLength (100) truncates the PushedFilters list
    # mid-entry, which would break the assertions below
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        df = geo_bbox_query(
            spark, path, (3, 2, 11, 8),
            date_range=("2024-01", "2024-01"), collections=["c1"],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PartitionFilters" in plan
    # collection is a directory-level partition filter, not a data filter
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "collection" in pf
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    for col in ("lon", "lat", "month"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_geo_index_layout_files_span_narrow_lon(spark, tmp_path_factory):
    """Range clustering on (month, cell_x): with 4 range partitions over two
    months the per-file lon spread must be narrower than the global spread."""
    import pyarrow.parquet as pq
    import glob, os

    path = _geo_root(spark, tmp_path_factory)
    spans = []
    for f in glob.glob(os.path.join(path, "collection=*", "*.parquet")):
        t = pq.read_table(f, columns=["lon"])
        lons = t["lon"].to_pylist()
        if lons:
            spans.append(max(lons) - min(lons))
    assert spans
    global_span = 18  # lons are 0..18
    assert min(spans) < global_span


def test_geo_distance_matches_haversine_brute(spark, tmp_path_factory):
    import math

    from es_indexer_spark.ops.geoindex import EARTH_RADIUS_KM, geo_distance_query

    path = _geo_root(spark, tmp_path_factory)
    lon0, lat0, r = 10.0, 5.0, 700.0
    got = {
        (c, m, lon, lat): (n, d)
        for c, m, lon, lat, n, d in (
            tuple(r_) for r_ in geo_distance_query(spark, path, lon0, lat0, r).collect()
        )
    }

    def hav(lon, lat):
        p1, p2 = math.radians(lat0), math.radians(lat)
        dl = math.radians(lon - lon0)
        h = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return round(2 * EARTH_RADIUS_KM * math.asin(math.sqrt(h)), 4)

    want = {
        (c, m, lon, lat): (n, hav(lon, lat))
        for (c, m, lon, lat, n) in (tuple(x) for x in _brute_cells(spark, (-180, -90, 180, 90)))
        if hav(lon, lat) <= r
    }
    assert got == want
    assert got  # the radius actually selects something


def test_geo_distance_polar_cap_scans_all_lons(spark, tmp_path_factory):
    """A cap containing a pole cannot bound lon — the prefilter must widen to
    the full lon range instead of silently dropping cells."""
    from es_indexer_spark.ops.geoindex import geo_distance_query

    path = _geo_root(spark, tmp_path_factory)
    # center near the data's top lat; radius big enough that lat+r crosses 90
    out = geo_distance_query(spark, path, 0.0, 85.0, 2000.0).collect()
    # brute check: every returned row satisfies the distance predicate and
    # no qualifying cell is missing
    import math

    from es_indexer_spark.ops.geoindex import EARTH_RADIUS_KM

    def hav(lon, lat):
        p1, p2 = math.radians(85.0), math.radians(lat)
        dl = math.radians(lon - 0.0)
        h = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return round(2 * EARTH_RADIUS_KM * math.asin(math.sqrt(h)), 4)

    want_keys = {
        (c, m, lon, lat)
        for (c, m, lon, lat, n) in (tuple(x) for x in _brute_cells(spark, (-180, -90, 180, 90)))
        if hav(lon, lat) <= 2000.0
    }
    assert {(r["collection"], r["month"], r["lon"], r["lat"]) for r in out} == want_keys


def test_upsert_geo_collections_two_generations(spark, tmp_path_factory):
    """Per-collection incremental rewrite (the reference's per-UUID
    cloud-optimized re-index, IndexerController.java:240-257): upserting new
    data for c1 replaces ONLY c1's cells; untouched collections keep their
    exact rows AND their files; result identical to a full rebuild over the
    combined corpus; a second generation replaces the first."""
    import os

    from es_indexer_spark.ops.geoindex import (
        geo_bbox_query,
        upsert_geo_collections,
        write_geo_index,
    )

    base = _pts(spark)
    path = str(tmp_path_factory.mktemp("geoidx_upsert") / "idx")
    write_geo_index(base, path, cell_deg=5.0, n_files=4)

    def snap(p):
        return sorted(
            (r["collection"], r["month"], r["lon"], r["lat"], r["cnt"])
            for r in spark.read.parquet(p).collect()
        )

    def files(coll):
        d = os.path.join(path, f"collection={coll}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        ), max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
               if f.endswith(".parquet"))

    before = snap(path)
    c0_files_before = files("c0")

    # generation 1: shift c1's points
    gen1 = base.filter(F.col("collection") == "c1").withColumn(
        "lon", F.col("lon") + 40
    )
    upsert_geo_collections(gen1, path, cell_deg=5.0, n_files=4)

    # full-rebuild reference over (c0, c2 old) + (c1 new)
    ref1 = str(tmp_path_factory.mktemp("geoidx_ref1") / "idx")
    write_geo_index(
        base.filter(F.col("collection") != "c1").unionByName(gen1),
        ref1, cell_deg=5.0, n_files=4,
    )
    assert snap(path) == snap(ref1)
    # untouched collections: rows identical to before, files untouched
    assert [r for r in snap(path) if r[0] != "c1"] == [
        r for r in before if r[0] != "c1"
    ]
    assert files("c0") == c0_files_before

    # generation 2 replaces generation 1 (not appended)
    gen2 = base.filter(F.col("collection") == "c1").withColumn(
        "lon", F.col("lon") + 80
    )
    upsert_geo_collections(gen2, path, cell_deg=5.0, n_files=4)
    ref2 = str(tmp_path_factory.mktemp("geoidx_ref2") / "idx")
    write_geo_index(
        base.filter(F.col("collection") != "c1").unionByName(gen2),
        ref2, cell_deg=5.0, n_files=4,
    )
    assert snap(path) == snap(ref2)

    # the read path agrees end-to-end after the upsert
    got = sorted(
        (r["collection"], r["month"], r["lon"], r["lat"], r["cnt"])
        for r in geo_bbox_query(spark, path, (80, 0, 110, 90)).collect()
    )
    want = sorted(
        (r["collection"], r["month"], r["lon"], r["lat"], r["cnt"])
        for r in geo_bbox_query(spark, ref2, (80, 0, 110, 90)).collect()
    )
    assert got == want and got
