"""§3.3 ``geo_shape`` intersects over record polygons (geo-lib-free).

The portal's map filter queries records by extent against the stored record
geometry — ``summaries.proj:geometry`` is an ES ``geo_shape`` field
(stacmodel/.../portal_records_index_schema.json:262-267) and the reference
delegates the intersects predicate to ES/Lucene (public spatial semantics,
GeometryUtils.java:162-212 builds the indexed shapes).  This module rebuilds
the box-vs-polygon INTERSECTS predicate natively over the flattened ring-point
layout that :mod:`.geoxml` extracts (one row per ring position), with holes
honored through even-odd semantics.

Predicate (exact, documented):
a geometry intersects the query box ``[W,E]x[S,N]`` iff

* Point: the point lies in the closed box;
* Polygon (any number of rings — exterior + holes, even-odd):
  (A) any ring VERTEX lies in the closed box, or
  (B) the box corner ``(W,S)`` lies inside the polygon (even-odd ray cast
      over ALL ring edges — covers box-fully-inside-polygon, and a box inside
      a hole correctly tests outside), or
  (C) any ring edge STRICTLY crosses one of the four box sides (orientation
      sign test — covers the thin-sliver case where a polygon crosses the box
      with no vertex inside and every box corner outside).

Degenerate tangencies (an edge passing exactly through a box corner with zero
crossing, collinear-overlap-only contact) are measure-zero and resolve by the
strict tests; both the engine and the DuckDB oracle implement the SAME
predicate so the contract is exact.

Execution shape (the 100 TB design):
* :func:`assemble_shapes` — ONE groupBy over (doc_id, geom_idx) turning point
  rows into per-geometry rows carrying bbox columns + point-parallel
  coordinate arrays.  This is a build-time artifact: persist it with
  :func:`write_shape_index` (range-clustered on ``lon_min``) and the query's
  bbox PREFILTER becomes plain column comparisons pushed into the parquet
  scan (file/row-group pruning) — no shuffle at query time.
* :func:`shape_intersects_bbox` — pushed bbox-overlap prefilter, then the
  exact ring test in ONE Arrow stage over the surviving candidates only
  (vectorized numpy per geometry; candidates ≪ corpus for portal-size boxes).
* Antimeridian: a box with ``min_lon > max_lon`` splits into the OR of two
  boxes (ES ``geo_shape`` box semantics), both prefilters still pushed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_SHAPE_COLS = (
    "doc_id", "geom_idx", "geom_type",
    "lon_min", "lon_max", "lat_min", "lat_max",
    "ring_ids", "xs", "ys",
)


def assemble_shapes(geoms: DataFrame) -> DataFrame:
    """Flattened ring points (geoxml.GEOM_SCHEMA) -> one row per geometry:
    ``(doc_id, geom_idx, geom_type, lon_min/max, lat_min/max, ring_ids, xs,
    ys)`` with the coordinate arrays sorted by (ring_idx, pt_idx).

    One hash-aggregate shuffle keyed by (doc_id, geom_idx) — map-side
    partials for the bbox mins/maxes; the collect_list payload is bounded by
    the geometry's own vertex count (the reference splits oversize feature
    collections long before this — ops/geoindex.py S13)."""
    pt = F.struct("ring_idx", "pt_idx", "lon", "lat")
    g = geoms.groupBy("doc_id", "geom_idx").agg(
        F.first("geom_type").alias("geom_type"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.sort_array(F.collect_list(pt)).alias("pts"),
    )
    return g.select(
        "doc_id", "geom_idx", "geom_type",
        "lon_min", "lon_max", "lat_min", "lat_max",
        F.transform("pts", lambda p: p["ring_idx"]).alias("ring_ids"),
        F.transform("pts", lambda p: p["lon"]).alias("xs"),
        F.transform("pts", lambda p: p["lat"]).alias("ys"),
    )


def write_shape_index(shapes: DataFrame, path: str, *, n_files: int = 8) -> None:
    """Persist assembled shapes range-clustered on ``lon_min`` (then
    ``lat_min``) so a bbox query's prefilter prunes files/row-groups via
    parquet min/max stats — the same layout discipline as
    :func:`es_indexer_spark.ops.geoindex.write_geo_index`."""
    (
        shapes.repartitionByRange(n_files, "lon_min", "lat_min")
        .sortWithinPartitions("lon_min", "lat_min")
        .write.mode("overwrite")
        .parquet(path)
    )


def _geom_box_intersects(
    ring_ids: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    gtype: str,
    W: float,
    E: float,
    S: float,
    N: float,
) -> bool:
    """Exact box-vs-geometry test per the module-docstring predicate."""
    if gtype == "Point":
        return bool(W <= xs[0] <= E and S <= ys[0] <= N)
    # (A) vertex in closed box
    if np.any((xs >= W) & (xs <= E) & (ys >= S) & (ys <= N)):
        return True
    # ring edges: consecutive points of the same ring (rings arrive closed,
    # last point == first point, so no wrap edge is needed)
    same = ring_ids[1:] == ring_ids[:-1]
    x1, y1 = xs[:-1][same], ys[:-1][same]
    x2, y2 = xs[1:][same], ys[1:][same]
    if x1.size == 0:
        return False
    # (B) box corner (W,S) inside polygon — even-odd ray cast to the east
    crosses = (y1 > S) != (y2 > S)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (S - y1) * (x2 - x1) / (y2 - y1)
    if int(np.count_nonzero(crosses & (xint > W))) % 2 == 1:
        return True
    # (C) any edge strictly crosses a box side (orientation sign test)
    for ax, ay, bx, by in ((W, S, E, S), (E, S, E, N), (E, N, W, N), (W, N, W, S)):
        d1 = (bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax)
        d2 = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
        d3 = (x2 - x1) * (ay - y1) - (y2 - y1) * (ax - x1)
        d4 = (x2 - x1) * (by - y1) - (y2 - y1) * (bx - x1)
        if np.any((d1 * d2 < 0) & (d3 * d4 < 0)):
            return True
    return False


def shape_intersects_bbox(
    shapes: DataFrame, bbox: tuple[float, float, float, float]
) -> DataFrame:
    """Geometries of ``shapes`` (assemble_shapes layout) intersecting
    ``bbox = (min_lon, min_lat, max_lon, max_lat)``.

    ``min_lon > max_lon`` crosses the antimeridian and evaluates as the OR of
    the two split boxes (ES semantics).  The bbox-overlap PREFILTER is plain
    column comparisons (pushed to the scan over a write_shape_index layout);
    the exact ring test runs in one Arrow stage over candidates only.
    Returns ``(doc_id, geom_idx, geom_type)``."""
    min_lon, min_lat, max_lon, max_lat = (float(v) for v in bbox)
    boxes = (
        [(min_lon, max_lon)]
        if min_lon <= max_lon
        else [(min_lon, 180.0), (-180.0, max_lon)]
    )

    overlap = F.lit(False)
    for w, e in boxes:
        overlap = overlap | (
            (F.col("lon_min") <= F.lit(e))
            & (F.col("lon_max") >= F.lit(w))
            & (F.col("lat_min") <= F.lit(max_lat))
            & (F.col("lat_max") >= F.lit(min_lat))
        )
    cand = shapes.filter(overlap)

    @F.pandas_udf("boolean")
    def hits(
        ring_ids: pd.Series, xs: pd.Series, ys: pd.Series, gtype: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(xs), dtype=bool)
        for i in range(len(xs)):
            r = np.asarray(ring_ids.iloc[i])
            x = np.asarray(xs.iloc[i], dtype=np.float64)
            y = np.asarray(ys.iloc[i], dtype=np.float64)
            gt = gtype.iloc[i]
            out[i] = any(
                _geom_box_intersects(r, x, y, gt, w, e, min_lat, max_lat)
                for w, e in boxes
            )
        return pd.Series(out)

    return cand.filter(hits("ring_ids", "xs", "ys", "geom_type")).select(
        "doc_id", "geom_idx", "geom_type"
    )


def geo_shape_query(
    geoms: DataFrame, bbox: tuple[float, float, float, float]
) -> DataFrame:
    """One-shot convenience: flattened ring points -> intersecting
    ``(doc_id, geom_idx, geom_type)``.  Production callers should persist
    :func:`assemble_shapes` via :func:`write_shape_index` once and query that
    (pushed prefilter, no per-query aggregation)."""
    return shape_intersects_bbox(assemble_shapes(geoms), bbox)


# ------------------------------------------------------- polygon query shapes
def _close_rings(
    rings: list[list[tuple[float, float]]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Query rings -> edge arrays (qx1, qy1, qx2, qy2); rings closed if not."""
    x1s, y1s, x2s, y2s = [], [], [], []
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            x1s.append(ax)
            y1s.append(ay)
            x2s.append(bx)
            y2s.append(by)
    return (
        np.asarray(x1s, dtype=np.float64),
        np.asarray(y1s, dtype=np.float64),
        np.asarray(x2s, dtype=np.float64),
        np.asarray(y2s, dtype=np.float64),
    )


def _points_in_region(
    px: np.ndarray, py: np.ndarray,
    ex1: np.ndarray, ey1: np.ndarray, ex2: np.ndarray, ey2: np.ndarray,
) -> np.ndarray:
    """Even-odd containment of points in the region bounded by the given
    edges (all rings together — holes fall out of the parity).  Vectorized
    points x edges; both sides are bounded (query rings are user-drawn,
    stored candidates are bbox-prefiltered)."""
    if px.size == 0 or ex1.size == 0:
        return np.zeros(px.shape, dtype=bool)
    py_c = py[:, None]
    crosses = (ey1[None, :] > py_c) != (ey2[None, :] > py_c)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ex1[None, :] + (py_c - ey1[None, :]) * (ex2 - ex1)[None, :] / (
            ey2 - ey1
        )[None, :]
    hits = crosses & (xint > px[:, None])
    return (np.count_nonzero(hits, axis=1) % 2) == 1


def _edges_cross(
    ax1, ay1, ax2, ay2, bx1, by1, bx2, by2
) -> bool:
    """Any STRICT crossing between edge set A and edge set B (orientation
    sign tests; loop over the smaller set, vectorized over the other)."""
    if ax1.size == 0 or bx1.size == 0:
        return False
    if bx1.size < ax1.size:  # iterate the smaller set
        ax1, ay1, ax2, ay2, bx1, by1, bx2, by2 = bx1, by1, bx2, by2, ax1, ay1, ax2, ay2
    for i in range(ax1.size):
        px1, py1, px2, py2 = ax1[i], ay1[i], ax2[i], ay2[i]
        d1 = (px2 - px1) * (by1 - py1) - (py2 - py1) * (bx1 - px1)
        d2 = (px2 - px1) * (by2 - py1) - (py2 - py1) * (bx2 - px1)
        d3 = (bx2 - bx1) * (py1 - by1) - (by2 - by1) * (px1 - bx1)
        d4 = (bx2 - bx1) * (py2 - by1) - (by2 - by1) * (px2 - bx1)
        if np.any((d1 * d2 < 0) & (d3 * d4 < 0)):
            return True
    return False


def _poly_poly_relate(
    ring_ids: np.ndarray, xs: np.ndarray, ys: np.ndarray, gtype: str,
    qx1, qy1, qx2, qy2, relation: str,
) -> bool:
    """Relate one stored geometry to the query polygon (even-odd regions,
    general-position semantics — tangency-only contact is measure-zero and
    resolves by the strict tests, same tolerance as the bbox predicate):

    - ``intersects``: a stored vertex in the query region, OR a query vertex
      in the stored region, OR any strict edge crossing;
    - ``within`` (stored ⊆ query): every stored vertex in the query region,
      no edge crossings, and NO query vertex inside the stored region (a
      query HOLE strictly inside the stored polygon would otherwise pass);
    - ``contains`` (query ⊆ stored): the mirror image.
    """
    if gtype == "Point":
        inside = bool(
            _points_in_region(xs[:1], ys[:1], qx1, qy1, qx2, qy2)[0]
        )
        if relation in ("intersects", "within"):
            return inside
        return False  # a point never contains a polygon
    same = ring_ids[1:] == ring_ids[:-1]
    sx1, sy1 = xs[:-1][same], ys[:-1][same]
    sx2, sy2 = xs[1:][same], ys[1:][same]
    s_in_q = _points_in_region(xs, ys, qx1, qy1, qx2, qy2)
    q_in_s = _points_in_region(qx1, qy1, sx1, sy1, sx2, sy2)
    if relation == "intersects":
        return (
            bool(s_in_q.any())
            or bool(q_in_s.any())
            or _edges_cross(sx1, sy1, sx2, sy2, qx1, qy1, qx2, qy2)
        )
    crossing = _edges_cross(sx1, sy1, sx2, sy2, qx1, qy1, qx2, qy2)
    if relation == "within":
        return bool(s_in_q.all()) and not crossing and not bool(q_in_s.any())
    if relation == "contains":
        return bool(q_in_s.all()) and not crossing and not bool(s_in_q.any())
    raise ValueError(f"unknown relation: {relation}")


def shape_relate_polygon(
    shapes: DataFrame,
    query_rings: list[list[tuple[float, float]]],
    *,
    relation: str = "intersects",
) -> DataFrame:
    """ES ``geo_shape`` with an arbitrary POLYGON query shape (exterior ring
    + optional holes, even-odd) and the full relation set: ``intersects``
    (default), ``within`` (stored inside the query shape), ``contains``
    (stored contains the query shape), ``disjoint`` (complement of
    intersects).

    Prefilter discipline: intersects/within push the query bbox overlap /
    containment bounds onto the stored bbox columns (pruned scan over a
    :func:`write_shape_index` layout); ``contains`` pushes the stored-bbox ⊇
    query-bbox bounds; ``disjoint`` is the one relation that cannot prune —
    it must scan every geometry (documented; still one pass, exact test only
    where the bbox OVERLAPS, everything else is disjoint by bbox alone).
    Returns ``(doc_id, geom_idx, geom_type)``."""
    if relation not in ("intersects", "within", "contains", "disjoint"):
        raise ValueError(f"unknown relation: {relation}")
    qx1, qy1, qx2, qy2 = _close_rings(query_rings)
    qw, qe = float(np.minimum(qx1, qx2).min()), float(np.maximum(qx1, qx2).max())
    qs, qn = float(np.minimum(qy1, qy2).min()), float(np.maximum(qy1, qy2).max())

    overlap = (
        (F.col("lon_min") <= F.lit(qe))
        & (F.col("lon_max") >= F.lit(qw))
        & (F.col("lat_min") <= F.lit(qn))
        & (F.col("lat_max") >= F.lit(qs))
    )

    @F.pandas_udf("boolean")
    def relates(
        ring_ids: pd.Series, xs: pd.Series, ys: pd.Series, gtype: pd.Series
    ) -> pd.Series:
        rel = "intersects" if relation == "disjoint" else relation
        out = np.zeros(len(xs), dtype=bool)
        for i in range(len(xs)):
            out[i] = _poly_poly_relate(
                np.asarray(ring_ids.iloc[i]),
                np.asarray(xs.iloc[i], dtype=np.float64),
                np.asarray(ys.iloc[i], dtype=np.float64),
                gtype.iloc[i],
                qx1, qy1, qx2, qy2, rel,
            )
        return pd.Series(out)

    keep = ("doc_id", "geom_idx", "geom_type")
    if relation == "disjoint":
        # bbox-disjoint geometries are disjoint without the exact test; only
        # bbox-overlapping candidates need the (negated) intersects check
        return shapes.filter(
            ~overlap | ~relates("ring_ids", "xs", "ys", "geom_type")
        ).select(*keep)
    if relation == "contains":
        pre = (
            (F.col("lon_min") <= F.lit(qw))
            & (F.col("lon_max") >= F.lit(qe))
            & (F.col("lat_min") <= F.lit(qs))
            & (F.col("lat_max") >= F.lit(qn))
        )
    elif relation == "within":
        # stored ⊆ query needs stored bbox ⊆ query bbox — tighter pruning
        # than mere overlap, still sound (the exact test decides)
        pre = (
            (F.col("lon_min") >= F.lit(qw))
            & (F.col("lon_max") <= F.lit(qe))
            & (F.col("lat_min") >= F.lit(qs))
            & (F.col("lat_max") <= F.lit(qn))
        )
    else:
        pre = overlap
    return (
        shapes.filter(pre)
        .filter(relates("ring_ids", "xs", "ys", "geom_type"))
        .select(*keep)
    )
