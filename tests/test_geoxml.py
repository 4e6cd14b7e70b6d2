"""STRICT behavior tests for §2.9a ISO-XML geometry extraction
(ops/geoxml.py vs GeometryBase.java:49-260 semantics)."""

from es_indexer_spark.ops.geoxml import (
    CRS84,
    _geoms_from_xml,
    extract_geometries_from_isoxml,
    geoxml_extract,
)

NS = (
    'xmlns:gex="http://standards.iso.org/iso/19115/-3/gex/1.0" '
    'xmlns:gml="http://www.opengis.net/gml/3.2" '
    'xmlns:gco="http://standards.iso.org/iso/19115/-3/gco/1.0"'
)


def ring(pos, dim='srsDimension="2"'):
    return f"<gml:LinearRing><gml:posList {dim}>{pos}</gml:posList></gml:LinearRing>"


def polygon(ext, *interiors):
    inner = "".join(f"<gml:interior>{r}</gml:interior>" for r in interiors)
    return f"<gml:Polygon><gml:exterior>{ext}</gml:exterior>{inner}</gml:Polygon>"


def bounding_polygon(body):
    return (
        f"<gex:EX_Extent {NS}><gex:geographicElement><gex:EX_BoundingPolygon>"
        f"<gex:polygon>{body}</gex:polygon>"
        "</gex:EX_BoundingPolygon></gex:geographicElement></gex:EX_Extent>"
    )


def bbox(w, e, s, n):
    def side(tag, v):
        return f"<gex:{tag}><gco:Decimal>{v}</gco:Decimal></gex:{tag}>"

    return (
        f"<gex:EX_Extent {NS}><gex:geographicElement><gex:EX_GeographicBoundingBox>"
        + side("westBoundLongitude", w)
        + side("eastBoundLongitude", e)
        + side("southBoundLatitude", s)
        + side("northBoundLatitude", n)
        + "</gex:EX_GeographicBoundingBox></gex:geographicElement></gex:EX_Extent>"
    )


SQUARE = "0 0 10 0 10 10 0 10 0 0"  # closed CCW 10x10 at origin
INNER = "2 2 4 2 4 4 2 4 2 2"  # within SQUARE
OUTER = "20 2 22 2 22 4 20 4 20 2"  # outside SQUARE


def test_polygon_interior_within_kept():
    geoms = _geoms_from_xml(bounding_polygon(polygon(ring(SQUARE), ring(INNER))), CRS84)
    assert geoms == [
        (
            "Polygon",
            [
                [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],
            ],
        )
    ]


def test_polygon_interior_outside_dropped():
    # GeometryBase.java:128-135 — stray "holes" outside the shell are dropped
    geoms = _geoms_from_xml(bounding_polygon(polygon(ring(SQUARE), ring(OUTER))), CRS84)
    assert len(geoms) == 1 and len(geoms[0][1]) == 1


def test_multisurface_exterior_only():
    # GeometryBase.java:87-103 — the MultiSurface branch reads just the exterior
    body = (
        "<gml:MultiSurface><gml:surfaceMember>"
        + polygon(ring(SQUARE), ring(INNER))
        + "</gml:surfaceMember></gml:MultiSurface>"
    )
    geoms = _geoms_from_xml(bounding_polygon(body), CRS84)
    assert len(geoms) == 1 and len(geoms[0][1]) == 1  # interior ignored


def test_unclosed_and_short_rings_dropped():
    assert _geoms_from_xml(bounding_polygon(polygon(ring("0 0 10 0 10 10 0 10"))), CRS84) == []
    assert _geoms_from_xml(bounding_polygon(polygon(ring("0 0 10 0 0 0"))), CRS84) == []


def test_3d_poslist_skipped():
    # "TODO: Handle 2D now, can be 3D" (GeometryBase.java:295)
    pos3d = "0 0 1 10 0 1 10 10 1 0 10 1 0 0 1"
    assert _geoms_from_xml(
        bounding_polygon(polygon(ring(pos3d, 'srsDimension="3"'))), CRS84
    ) == []


def test_odd_poslist_dropped():
    assert _geoms_from_xml(bounding_polygon(polygon(ring(SQUARE + " 5"))), CRS84) == []


def test_bbox_polygon_and_east_clamp():
    # east >= 180 clamps to 180 (GeometryBase.java:209)
    geoms = _geoms_from_xml(bbox("150.5", "200.25", "-10", "5"), CRS84)
    assert geoms == [
        ("Polygon", [[(150.5, -10), (180, -10), (180, 5), (150.5, 5), (150.5, -10)]])
    ]


def test_bbox_invalid_latitude_dropped():
    # |lat| > 90 drops the whole box (GeometryBase.java:211-219)
    assert _geoms_from_xml(bbox("0", "10", "-95", "5"), CRS84) == []
    assert _geoms_from_xml(bbox("0", "10", "-5", "95"), CRS84) == []


def test_bbox_degenerate_is_point():
    # all four corners identical -> Point (GeometryBase.java:221-224)
    assert _geoms_from_xml(bbox("146.86", "146.86", "-19.1", "-19.1"), CRS84) == [
        ("Point", [[(146.86, -19.1)]])
    ]


def test_bbox_missing_decimal_dropped():
    xml = (
        f"<gex:EX_Extent {NS}><gex:geographicElement><gex:EX_GeographicBoundingBox>"
        "<gex:westBoundLongitude><gco:Decimal>1</gco:Decimal></gex:westBoundLongitude>"
        "<gex:eastBoundLongitude><gco:Decimal>2</gco:Decimal></gex:eastBoundLongitude>"
        "<gex:southBoundLatitude><gco:Decimal>3</gco:Decimal></gex:southBoundLatitude>"
        "<gex:northBoundLatitude></gex:northBoundLatitude>"
        "</gex:EX_GeographicBoundingBox></gex:geographicElement></gex:EX_Extent>"
    )
    assert _geoms_from_xml(xml, CRS84) == []


def test_crs_gate_and_malformed_xml():
    xml = bounding_polygon(polygon(ring(SQUARE)))
    assert _geoms_from_xml(xml, "EPSG:3857") == []  # CRS:84 only (:72, :174)
    assert _geoms_from_xml("<not<valid<xml", CRS84) == []
    assert _geoms_from_xml("", CRS84) == []


def test_spark_flattening_and_plan(spark):
    rows = [
        (1, bounding_polygon(polygon(ring(SQUARE), ring(INNER))), CRS84),
        (2, bbox("0", "0", "5", "5"), CRS84),
        (3, bbox("0", "10", "-95", "5"), CRS84),
        (4, bounding_polygon(polygon(ring(SQUARE))), "EPSG:3857"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "extent_xml", "crs"])
    out = extract_geometries_from_isoxml(df, "doc_id", "extent_xml", "crs")
    got = {(r.doc_id, r.geom_type, r.ring_idx, r.pt_idx, r.lon, r.lat) for r in out.collect()}
    assert (1, "Polygon", 1, 0, 2.0, 2.0) in got
    assert (2, "Point", 0, 0, 0.0, 5.0) in got
    assert {t[0] for t in got} == {1, 2}  # 3 (bad lat) and 4 (CRS) gated out
    # shuffle-free: the plan must contain no Exchange
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_contract_entry_counts(spark):
    out = geoxml_extract(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 2226  # pinned: matches the DuckDB oracle hash check
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id % 6, set()).add((r.geom_idx, r.ring_idx))
    assert len(by_doc[0]) == 2  # two MultiSurface polygons, exterior-only
    assert len(by_doc[1]) == 2  # exterior + kept interior
    assert len(by_doc[2]) == 1  # outside interior dropped
    assert 5 not in by_doc  # invalid-latitude class fully dropped
