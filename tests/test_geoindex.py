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
