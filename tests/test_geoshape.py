"""geo_shape intersects (ops/geoshape.py) — box-vs-polygon with holes,
antimeridian split, pushed prefilter layout.

Reference anchor: the portal filters records by extent against the ES
``geo_shape`` field ``summaries.proj:geometry``
(stacmodel/.../portal_records_index_schema.json:262-267); intersects
semantics are public Lucene/ES spatial behavior, pinned here by handcrafted
geometries with hand-derived truth (every predicate branch covered)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops.geoshape import (
    assemble_shapes,
    geo_shape_query,
    shape_intersects_bbox,
    write_shape_index,
)

GEOM_SCHEMA = (
    "doc_id long, geom_idx int, geom_type string, ring_idx int, pt_idx int, "
    "lon double, lat double"
)


def _rows(doc_id, geom_idx, gtype, rings):
    out = []
    for ri, ring in enumerate(rings):
        for pi, (x, y) in enumerate(ring):
            out.append((doc_id, geom_idx, gtype, ri, pi, float(x), float(y)))
    return out


def _sq(cx, cy, half):
    return [
        (cx - half, cy - half), (cx + half, cy - half),
        (cx + half, cy + half), (cx - half, cy + half),
        (cx - half, cy - half),
    ]


@pytest.fixture(scope="module")
def shapes_df(spark):
    rows = []
    # 1: unit square at origin (vertex-in-box cases)
    rows += _rows(1, 0, "Polygon", [_sq(0, 0, 5)])
    # 2: big square with a hole; box-inside-polygon and box-inside-hole cases
    rows += _rows(2, 0, "Polygon", [_sq(50, 0, 20), _sq(50, 0, 5)])
    # 3: thin horizontal sliver crossing x=100..140 at |lat|<0.1 (edge-cross case)
    rows += _rows(3, 0, "Polygon", [
        [(100, -0.1), (140, -0.1), (140, 0.1), (100, 0.1), (100, -0.1)]
    ])
    # 4: point
    rows += _rows(4, 0, "Point", [[(10, 10)]])
    # 5: polygon hugging the antimeridian (east side, lon 170..179)
    rows += _rows(5, 0, "Polygon", [_sq(174.5, 0, 4.5)])
    # 6: two geometries on one doc
    rows += _rows(6, 0, "Polygon", [_sq(-100, -40, 3)])
    rows += _rows(6, 1, "Polygon", [_sq(-100, 40, 3)])
    return spark.createDataFrame(rows, GEOM_SCHEMA)


def _hits(shapes_or_geoms, bbox, assembled=False):
    df = (
        shape_intersects_bbox(shapes_or_geoms, bbox)
        if assembled
        else geo_shape_query(shapes_or_geoms, bbox)
    )
    return {(r["doc_id"], r["geom_idx"]) for r in df.collect()}


def test_vertex_in_box(spark, shapes_df):
    assert _hits(shapes_df, (4, 4, 20, 20)) == {(1, 0), (4, 0)}


def test_box_fully_inside_polygon(spark, shapes_df):
    # box inside doc-2's annulus solid part (between hole r=5 and shell r=20)
    assert (2, 0) in _hits(shapes_df, (58, 1, 62, 3))


def test_box_inside_hole_misses(spark, shapes_df):
    # entirely inside the hole -> even-odd says outside
    assert _hits(shapes_df, (48, -1, 52, 1)) == set()


def test_box_overlapping_hole_boundary(spark, shapes_df):
    # crosses the hole's edge: intersects the solid part
    assert (2, 0) in _hits(shapes_df, (52, -1, 58, 1))


def test_sliver_crosses_box_no_vertices(spark, shapes_df):
    # box 110..120 x -10..10: sliver passes through, no sliver vertex inside,
    # all four box corners outside the sliver -> the edge-cross branch
    assert _hits(shapes_df, (110, -10, 120, 10)) == {(3, 0)}


def test_disjoint(spark, shapes_df):
    assert _hits(shapes_df, (-50, -50, -40, -40)) == set()


def test_point_semantics(spark, shapes_df):
    assert (4, 0) in _hits(shapes_df, (9, 9, 11, 11))
    assert (4, 0) not in _hits(shapes_df, (11, 11, 12, 12))


def test_multi_geometry_doc(spark, shapes_df):
    got = _hits(shapes_df, (-105, 35, -95, 45))
    assert got == {(6, 1)}  # only the northern square


def test_antimeridian_split_box(spark, shapes_df):
    # box 178..-170 crosses the dateline: must catch the lon-170..179 polygon
    got = _hits(shapes_df, (178, -10, -170, 10))
    assert got == {(5, 0)}
    # and the same box must NOT catch anything when shifted into open ocean
    assert _hits(shapes_df, (-169, -10, -160, 10)) == set()


def test_touching_vertex_counts(spark, shapes_df):
    # closed-box semantics: box corner exactly on the square's corner (5,5)
    assert (1, 0) in _hits(shapes_df, (5, 5, 8, 8))


def test_assembled_layout_and_pushed_prefilter(spark, shapes_df, tmp_path):
    shapes = assemble_shapes(shapes_df)
    # bbox columns agree with the raw points
    row = {
        (r["doc_id"], r["geom_idx"]): r
        for r in shapes.collect()
    }[(2, 0)]
    assert (row["lon_min"], row["lon_max"]) == (30.0, 70.0)
    assert row["ring_ids"][:5] == [0, 0, 0, 0, 0] and len(row["xs"]) == 10
    # persisted layout: prefilter comparisons reach the parquet scan
    path = str(tmp_path / "shape_idx")
    write_shape_index(shapes, path, n_files=2)
    stored = spark.read.parquet(path)
    got = _hits(stored, (4, 4, 20, 20), assembled=True)
    assert got == {(1, 0), (4, 0)}
    plan = (
        stored.filter((F.col("lon_min") <= 20.0) & (F.col("lon_max") >= 4.0))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "lon_min" in plan.split("PushedFilters")[1][:200]


def test_query_matches_per_geometry_brute(spark, shapes_df):
    """Independent per-geometry truth: dense point containment + explicit
    segment clipping, written without the engine's vectorized predicate."""
    import numpy as np

    boxes = [(4, 4, 20, 20), (58, 1, 62, 3), (110, -10, 120, 10),
             (-105, 35, -95, 45), (52, -1, 58, 1), (30, -30, 45, -20)]
    pts = shapes_df.collect()
    geoms = {}
    for r in pts:
        geoms.setdefault((r["doc_id"], r["geom_idx"], r["geom_type"]), []).append(
            (r["ring_idx"], r["pt_idx"], r["lon"], r["lat"])
        )

    def seg_in_box(p, q, W, S, E, N, steps=2000):
        ts = np.linspace(0.0, 1.0, steps)
        x = p[0] + (q[0] - p[0]) * ts
        y = p[1] + (q[1] - p[1]) * ts
        return bool(np.any((x >= W) & (x <= E) & (y >= S) & (y <= N)))

    def pip(x, y, rings):
        inside = False
        for ring in rings:
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        return inside

    for W, S, E, N in boxes:
        want = set()
        for (did, gi, gt), rows in geoms.items():
            rows.sort()
            rings = {}
            for ri, _, x, y in rows:
                rings.setdefault(ri, []).append((x, y))
            rings = list(rings.values())
            if gt == "Point":
                (x, y), = rings[0]
                if W <= x <= E and S <= y <= N:
                    want.add((did, gi))
                continue
            hit = any(
                seg_in_box(p, q, W, S, E, N)
                for ring in rings
                for p, q in zip(ring, ring[1:])
            ) or pip(W + 1e-9, S + 1e-9, rings)
            if hit:
                want.add((did, gi))
        assert _hits(shapes_df, (W, S, E, N)) == want, (W, S, E, N)


# ------------------------------------------------- polygon query + relations
def _tri(cx, cy, r):
    return [(cx - r, cy - r), (cx + r, cy - r), (cx, cy + r)]


def _relate(shapes_df, rings, relation):
    from es_indexer_spark.ops.geoshape import assemble_shapes, shape_relate_polygon

    df = shape_relate_polygon(assemble_shapes(shapes_df), rings, relation=relation)
    return {(r["doc_id"], r["geom_idx"]) for r in df.collect()}


def test_polygon_query_intersects(spark, shapes_df):
    # triangle overlapping doc-1's square corner
    assert (1, 0) in _relate(shapes_df, [_tri(6, 6, 4)], "intersects")
    # triangle fully inside doc-2's hole: no intersection
    assert _relate(shapes_df, [_tri(50, 0, 2)], "intersects") == set()
    # triangle straddling the hole boundary: intersects the annulus
    assert (2, 0) in _relate(shapes_df, [_tri(55, 0, 3)], "intersects")
    # big triangle containing doc-6's southern square entirely
    assert (6, 0) in _relate(shapes_df, [_tri(-100, -40, 20)], "intersects")


def test_polygon_query_with_hole(spark, shapes_df):
    # query = big square with a hole exactly covering doc-4's point region:
    # even-odd says the point is OUTSIDE the query region
    outer = [(0, 0), (20, 0), (20, 20), (0, 20)]
    hole = [(8, 8), (12, 8), (12, 12), (8, 12)]
    got = _relate(shapes_df, [outer, hole], "intersects")
    assert (4, 0) not in got and (1, 0) in got


def test_polygon_query_within(spark, shapes_df):
    # doc-6's squares fit inside a big triangle around them
    assert _relate(shapes_df, [_tri(-100, 0, 80)], "within") >= {(6, 0), (6, 1)}
    # the annulus is NOT within a triangle that overlaps only partly
    assert (2, 0) not in _relate(shapes_df, [_tri(55, 0, 10)], "within")
    # a query with a hole strictly inside the stored polygon breaks within
    outer = [(-10, -10), (10, -10), (10, 10), (-10, 10)]
    hole = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    assert (1, 0) not in _relate(shapes_df, [outer, hole], "within")
    assert (1, 0) in _relate(shapes_df, [outer], "within")


def test_polygon_query_contains(spark, shapes_df):
    # doc-1's square contains a small triangle at its center
    assert _relate(shapes_df, [_tri(0, 0, 1)], "contains") == {(1, 0)}
    # the annulus does NOT contain a triangle inside its hole
    assert _relate(shapes_df, [_tri(50, 0, 2)], "contains") == set()
    # but DOES contain one drawn on the solid part
    assert _relate(shapes_df, [_tri(50, 10, 2)], "contains") == {(2, 0)}


def test_polygon_query_disjoint_complement(spark, shapes_df):
    from es_indexer_spark.ops.geoshape import assemble_shapes

    all_geoms = {
        (r["doc_id"], r["geom_idx"])
        for r in assemble_shapes(shapes_df).select("doc_id", "geom_idx").collect()
    }
    rings = [_tri(6, 6, 4)]
    inter = _relate(shapes_df, rings, "intersects")
    dis = _relate(shapes_df, rings, "disjoint")
    assert inter | dis == all_geoms and inter & dis == set()


def test_polygon_query_point_semantics(spark, shapes_df):
    assert (4, 0) in _relate(shapes_df, [_tri(10, 10, 3)], "intersects")
    assert (4, 0) in _relate(shapes_df, [_tri(10, 10, 3)], "within")
    assert (4, 0) not in _relate(shapes_df, [_tri(10, 10, 3)], "contains")


def test_cli_geo_shape_job(spark, shapes_df, tmp_path, capsys):
    import json as _json

    from es_indexer_spark.cli import main
    from es_indexer_spark.ops.geoshape import assemble_shapes, write_shape_index

    path = str(tmp_path / "shape_cli_idx")
    write_shape_index(assemble_shapes(shapes_df), path, n_files=2)

    rc = main(["--job", "geo-shape", "--index", path, "--bbox", "4,4,20,20"])
    assert rc == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {(r["doc_id"], r["geom_idx"]) for r in rows} == {(1, 0), (4, 0)}

    rc = main(["--job", "geo-shape", "--index", path,
               "--polygon", "-1,-1 1,-1 0,1", "--relation", "contains"])
    assert rc == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {(r["doc_id"], r["geom_idx"]) for r in rows} == {(1, 0)}
