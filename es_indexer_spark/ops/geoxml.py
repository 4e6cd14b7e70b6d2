"""§2.9a — polygon extraction from ISO-19115 XML, geo-lib-free.

The reference parses JAXB-bound ISO-19115-3 extent elements into JTS
geometries (``GeometryBase.findPolygonsFrom``, indexer/src/main/java/au/org/
aodn/esindexer/utils/GeometryBase.java:49-65; polygon branch :67-160; bbox
branch :171-199; posList conversion :290-353).  This module re-implements the
same extraction semantics over raw XML strings with the Python stdlib parser
inside ``mapInPandas`` — XML parsing is genuinely not expressible in column
algebra (the reference needs a whole JAXB/geotools stack for it), so this is
the sanctioned Arrow-batched escape hatch.  The operator is embarrassingly
parallel: it inherits the input partitioning, shuffles nothing, and emits an
all-scalar flattened schema (one row per ring point), which is also the
100 TB-friendly shape — downstream ops (shoelace orientation, GeoJSON
writers, bbox union in :mod:`.mapper`) consume exactly this layout.

Behavior pinned to the reference (each line cites GeometryBase.java):

* CRS gate — only ``CRS:84`` records produce geometry (:72, :174).
* ``EX_BoundingPolygon`` / GML branch (:67-160):
  - a bare ``gml:Polygon`` yields exterior + interior rings; an interior
    ring is kept only when it lies **within** the exterior (:128-135 —
    GeoNetwork data sometimes stores stray "holes" outside the shell, which
    would violate the GeoJSON right-hand rule downstream);
  - polygons under ``gml:MultiSurface/surfaceMember`` are parsed
    **exterior-only** (:87-103 processes just the exterior posList);
  - ``posList`` is a flat ``lon lat lon lat …`` sequence; only
    ``srsDimension`` 2 (or absent) is handled (:293-295 "Handle 2D now");
  - a ring that is not closed or has < 4 positions cannot form a JTS
    polygon — the reference's ``createPolygon`` throws and the geometry is
    dropped with a warning (:337-350); we drop it the same way.
* ``EX_GeographicBoundingBox`` branch (:171-260):
  - any missing W/E/S/N decimal → record skipped with a warning (:183);
  - ``east >= 180`` is clamped to 180 (:209 "value bigger than 180 ...
    imply max value 180");
  - a latitude outside ±90 drops the whole box (:211-219);
  - all four corners identical → a **Point** (:221-224 ``verifyPoint``);
    otherwise the ring is closed and a Polygon emitted (:226-233).
* Malformed XML → zero geometries for that record (the reference's
  log-and-skip posture; cf. ``route_invalid`` in :mod:`.mapper`).

Known honest deviation: the reference repairs self-intersecting polygons via
JTS ``buffer(0)`` (:345) — a constructive-geometry rebuild that has no
geo-lib-free equivalent; such rings are emitted as parsed.  The ``within``
test is an even-odd ray cast over the interior ring's vertices (exact for
the simple/convex shells GeoNetwork emits; JTS's topological ``within`` also
rejects boundary-crossing rings, which vertex containment approximates).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CRS84 = "CRS:84"

#: One row per ring position; Points carry a single row (ring 0, pt 0).
GEOM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("geom_idx", IntegerType()),
        StructField("geom_type", StringType()),
        StructField("ring_idx", IntegerType()),
        StructField("pt_idx", IntegerType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ]
)


def _local(tag: str) -> str:
    """Namespace-agnostic localname ('{uri}Polygon' -> 'Polygon')."""
    return tag.rsplit("}", 1)[-1]


def _findall_local(root: ET.Element, name: str) -> list[ET.Element]:
    return [e for e in root.iter() if _local(e.tag) == name]


def _pos_list(ring_el: ET.Element) -> list[tuple[float, float]] | None:
    """posList -> [(lon, lat), ...] — GeometryBase.java:290-327.

    Pairs are (x=first, y=second) exactly as the reference's
    ``new Coordinate(v.get(z), v.get(z + 1))``; srsDimension != 2 -> None."""
    for el in ring_el.iter():
        if _local(el.tag) == "posList":
            dim = el.get("srsDimension")
            if dim is not None and float(dim) != 2.0:
                return None  # "TODO: Handle 2D now, can be 3D" (:295)
            try:
                vals = [float(v) for v in (el.text or "").split()]
            except ValueError:
                return None
            if len(vals) % 2:
                return None
            return [(vals[z], vals[z + 1]) for z in range(0, len(vals), 2)]
    return None


def _closed_ring(pts: list[tuple[float, float]] | None) -> list[tuple[float, float]] | None:
    """JTS createPolygon preconditions (GeometryBase.java:337-350): >= 4
    positions and first == last, else the geometry is dropped."""
    if pts is None or len(pts) < 4 or pts[0] != pts[-1]:
        return None
    return pts


def _point_in_ring(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Even-odd ray cast (vertex-containment stand-in for JTS ``within``)."""
    inside = False
    n = len(ring) - 1  # ring is closed
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xi:
                inside = not inside
    return inside


def _rings_from_polygon(
    poly: ET.Element, exterior_only: bool
) -> list[list[tuple[float, float]]] | None:
    """One gml:Polygon -> [exterior, kept-interiors...] or None (dropped)."""
    ext = None
    interiors: list[list[tuple[float, float]]] = []
    for child in poly:
        name = _local(child.tag)
        if name == "exterior":
            ext = _closed_ring(_pos_list(child))
        elif name == "interior" and not exterior_only:
            ring = _closed_ring(_pos_list(child))
            if ring is not None:
                interiors.append(ring)
    if ext is None:
        return None
    # interior kept only when within the exterior (GeometryBase.java:128-135)
    kept = [r for r in interiors if all(_point_in_ring(x, y, ext) for x, y in r[:-1])]
    return [ext] + kept


def _dec(el: ET.Element, name: str) -> float | None:
    """<gex:westBoundLongitude><gco:Decimal>146.8</gco:Decimal>... -> float."""
    for child in el.iter():
        if _local(child.tag) == name:
            for d in child.iter():
                if _local(d.tag) == "Decimal" and d.text and d.text.strip():
                    try:
                        return float(d.text)
                    except ValueError:
                        return None
            return None
    return None


def _geoms_from_xml(xml: str, crs: str) -> list[tuple[str, list[list[tuple[float, float]]]]]:
    """Parse one record's extent XML -> [(geom_type, rings), ...] in document
    order.  Mirrors findPolygonsFrom's type dispatch (GeometryBase.java:49-65)."""
    if crs != CRS84 or not xml:
        return []
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    out: list[tuple[str, list[list[tuple[float, float]]]]] = []
    for el in root.iter():
        name = _local(el.tag)
        if name == "EX_BoundingPolygon":
            # Polygons under MultiSurface/surfaceMember: exterior-only (:87-103)
            in_multi = {
                id(p)
                for ms in _findall_local(el, "MultiSurface")
                for p in _findall_local(ms, "Polygon")
            }
            for poly in _findall_local(el, "Polygon"):
                rings = _rings_from_polygon(poly, exterior_only=id(poly) in in_multi)
                if rings is not None:
                    out.append(("Polygon", rings))
        elif name == "EX_GeographicBoundingBox":
            w = _dec(el, "westBoundLongitude")
            e = _dec(el, "eastBoundLongitude")
            s = _dec(el, "southBoundLatitude")
            n = _dec(el, "northBoundLatitude")
            if w is None or e is None or s is None or n is None:
                continue  # "Invalid BBOX found" (:183)
            e = 180.0 if e >= 180 else e  # east clamp (:209)
            if not (-90 <= s <= 90) or not (-90 <= n <= 90):
                continue  # invalid latitude (:211-219)
            corners = [(w, s), (e, s), (e, n), (w, n)]
            if len(set(corners)) == 1:
                out.append(("Point", [[corners[0]]]))  # verifyPoint (:221-224)
            else:
                out.append(("Polygon", [corners + [corners[0]]]))
    return out


def extract_geometries_from_isoxml(
    df: DataFrame,
    id_col: str = "doc_id",
    xml_col: str = "extent_xml",
    crs_col: str | None = None,
) -> DataFrame:
    """ISO-XML extent strings -> flattened geometry rows (GEOM_SCHEMA).

    ``crs_col`` names a per-record CRS column; None assumes ``CRS:84`` for
    every record (the reference receives the CRS alongside the extent list).
    Arrow-batched, partition-parallel, shuffle-free."""

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            crs_vals = pdf[crs_col] if crs_col else None
            for i, (doc_id, xml) in enumerate(zip(pdf[id_col], pdf[xml_col])):
                crs = crs_vals.iloc[i] if crs_vals is not None else CRS84
                for gi, (gtype, rings) in enumerate(_geoms_from_xml(xml, crs)):
                    for ri, ring in enumerate(rings):
                        for pi, (x, y) in enumerate(ring):
                            rows.append((int(doc_id), gi, gtype, ri, pi, x, y))
            yield pd.DataFrame(
                rows, columns=[f.name for f in GEOM_SCHEMA.fields]
            )

    cols = [id_col, xml_col] + ([crs_col] if crs_col else [])
    return df.select(*cols).mapInPandas(parse, schema=GEOM_SCHEMA)


# --------------------------------------------------------------------------- contract entry
_NS = (
    'xmlns:gex="http://standards.iso.org/iso/19115/-3/gex/1.0" '
    'xmlns:gml="http://www.opengis.net/gml/3.2" '
    'xmlns:gco="http://standards.iso.org/iso/19115/-3/gco/1.0"'
)


def _ring_xml(pos_list):  # Column -> Column
    from pyspark.sql import functions as F

    return F.concat(
        F.lit('<gml:LinearRing><gml:posList srsDimension="2">'),
        pos_list,
        F.lit("</gml:posList></gml:LinearRing>"),
    )


def _sq_poslist(x, y, size: float):
    """posList text for a closed axis-aligned square: 'x y x+s y ... x y'."""
    from pyspark.sql import functions as F

    fmt = lambda c: F.format_string("%.2f", c)
    pts = [(0.0, 0.0), (size, 0.0), (size, size), (0.0, size), (0.0, 0.0)]
    return F.concat_ws(" ", *[f for dx, dy in pts for f in (fmt(x + dx), fmt(y + dy))])


def geoxml_extract(spark, sf_dir: str) -> DataFrame:
    """§2.9a contract entry: build deterministic ISO-19115 extent XML per
    document in-plan (pure column concat), run the real extractor over it, and
    flatten.  The oracle derives the expected coordinates directly from the
    same doc_id arithmetic, so a hash match proves the parser implements the
    reference's documented branch semantics (GeometryBase.java:49-260):

    doc_id % 6 == 0  MultiSurface, two polygons, 2nd carries an interior that
                     MUST be ignored (exterior-only branch, :87-103)
               == 1  bare Polygon, interior within exterior -> kept (:128-135)
               == 2  bare Polygon, interior OUTSIDE exterior -> dropped
               == 3  bbox whose raw east may exceed 180 -> clamped (:209)
               == 4  degenerate bbox (4 equal corners) -> Point (:221-224)
               == 5  bbox with south < -90 -> record dropped (:211-219)
    doc_id % 7 == 3  CRS 'EPSG:3857' -> gated out entirely (:72, :174)
    """
    from pyspark.sql import functions as F

    from .mapper import _load

    docs = _load(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    cls = did % 6
    x0 = (did * 7 % 280 - 140 + 0.25).cast("double")
    y0 = (did * 11 % 130 - 65 + 0.25).cast("double")
    east_raw = (did % 100 + 120 + 0.25).cast("double")
    fmt = lambda c: F.format_string("%.2f", c)

    def polygon(ext_ring, *interior_rings):
        parts = [F.lit("<gml:Polygon><gml:exterior>"), ext_ring, F.lit("</gml:exterior>")]
        for r in interior_rings:
            parts += [F.lit("<gml:interior>"), r, F.lit("</gml:interior>")]
        parts.append(F.lit("</gml:Polygon>"))
        return F.concat(*parts)

    def bounding_polygon(body):
        return F.concat(
            F.lit("<gex:EX_BoundingPolygon><gex:polygon>"),
            body,
            F.lit("</gex:polygon></gex:EX_BoundingPolygon>"),
        )

    def bbox(w, e, s, n):
        def side(tag, dec_col):
            return F.concat(
                F.lit(f"<gex:{tag}><gco:Decimal>"), dec_col, F.lit(f"</gco:Decimal></gex:{tag}>")
            )

        return F.concat(
            F.lit("<gex:EX_GeographicBoundingBox>"),
            side("westBoundLongitude", w),
            side("eastBoundLongitude", e),
            side("southBoundLatitude", s),
            side("northBoundLatitude", n),
            F.lit("</gex:EX_GeographicBoundingBox>"),
        )

    ext = _ring_xml(_sq_poslist(x0, y0, 10.0))
    ext2 = _ring_xml(_sq_poslist(x0 + 12, y0, 6.0))
    inner_in = _ring_xml(_sq_poslist(x0 + 2, y0 + 2, 2.0))
    inner_in2 = _ring_xml(_sq_poslist(x0 + 14, y0 + 2, 2.0))
    inner_out = _ring_xml(_sq_poslist(x0 + 20, y0 + 2, 2.0))

    multi = F.concat(
        F.lit("<gml:MultiSurface><gml:surfaceMember>"),
        polygon(ext),
        F.lit("</gml:surfaceMember><gml:surfaceMember>"),
        polygon(ext2, inner_in2),  # interior under MultiSurface: ignored
        F.lit("</gml:surfaceMember></gml:MultiSurface>"),
    )
    body = (
        F.when(cls == 0, bounding_polygon(multi))
        .when(cls == 1, bounding_polygon(polygon(ext, inner_in)))
        .when(cls == 2, bounding_polygon(polygon(ext, inner_out)))
        .when(cls == 3, bbox(fmt(x0), fmt(east_raw), fmt(y0), fmt(y0 + 5)))
        .when(cls == 4, bbox(fmt(x0), fmt(x0), fmt(y0), fmt(y0)))
        .otherwise(bbox(fmt(x0), fmt(x0 + 10), F.lit("-95.50"), fmt(y0)))
    )
    xml = F.concat(
        F.lit(f"<gex:EX_Extent {_NS}><gex:geographicElement>"),
        body,
        F.lit("</gex:geographicElement></gex:EX_Extent>"),
    )
    crs = F.when(did % 7 == 3, F.lit("EPSG:3857")).otherwise(F.lit(CRS84))
    src = docs.select("doc_id", xml.alias("extent_xml"), crs.alias("crs"))
    return extract_geometries_from_isoxml(src, "doc_id", "extent_xml", "crs")
