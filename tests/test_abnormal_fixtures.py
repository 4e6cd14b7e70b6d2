"""Abnormal-input golden fixtures for the mapper/transform surface — the analog
of the reference's abnormal canned corpus (indexer/src/test/resources/canned/:
``sample_abnormal_structure_GA.xml``, ``keywords_null.xml``; JSONAssert STRICT,
StacCollectionMapperServiceTest.java:107-116). Every case asserts the EXACT
output (STRICT), pinning the log-and-skip semantics: malformed input degrades
to NULL / a routed error row, never to a job abort or a fabricated value.

The date cases double as ANSI-mode regression tests: Spark 4 runs with
spark.sql.ansi.enabled=true, where a bare to_timestamp on a regex-shaped but
invalid date ("2021-13-45") KILLS the whole job — and a when-cascade evaluates
every branch columnar-ly, so one malformed row would take down the batch.
widen_datetime therefore uses try_to_timestamp (found round 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops.mapper import (
    MAPPERS,
    extract_citation,
    flatten_vocab_tree,
    route_invalid,
    shoelace_signed_area2,
    widen_datetime,
)

ABNORMAL_DATES = [
    # (raw, expected_start_iso, expected_end_iso) — None = reference log-and-skip
    ("2021-13-45", None, None),              # regex-shaped, impossible month/day
    ("2021-02-30", None, None),              # impossible day in valid month
    ("2021-02-29T10:00:00Z", None, None),    # invalid leap day, Z-suffixed form
    ("not-a-date", None, None),              # free text
    ("2020-1-1", None, None),                # non-padded: not a recognized shape
    ("", None, None),                        # empty string
    (None, None, None),                      # NULL
    ("  2020  ", "2020-01-01 00:00:00", "2020-12-31 23:59:59"),  # trim + widen
    ("2020-02-29", "2020-02-29 00:00:00", "2020-02-29 23:59:59"),  # valid leap
]


@pytest.mark.parametrize("raw,start,end", ABNORMAL_DATES)
def test_widen_datetime_abnormal(spark, raw, start, end):
    row = (
        spark.createDataFrame([(raw,)], "raw string")
        .select(
            widen_datetime(F.col("raw")).alias("s"),
            widen_datetime(F.col("raw"), end=True).alias("e"),
        )
        .collect()[0]
    )
    got_s = row["s"].strftime("%Y-%m-%d %H:%M:%S") if row["s"] else None
    got_e = row["e"].strftime("%Y-%m-%d %H:%M:%S") if row["e"] else None
    assert (got_s, got_e) == (start, end)


def test_widen_datetime_one_bad_row_does_not_kill_batch(spark):
    """One malformed row among valid ones: the valid rows still parse — the
    reference's per-record log-and-skip, not a batch abort."""
    df = spark.createDataFrame(
        [(1, "2021-06-15"), (2, "2021-13-45"), (3, "2021")], "id long, raw string"
    )
    rows = {r["id"]: r["s"] for r in df.select("id", widen_datetime(F.col("raw")).alias("s")).collect()}
    assert rows[2] is None
    assert rows[1].strftime("%Y-%m-%d") == "2021-06-15"
    assert rows[3].strftime("%Y-%m-%d") == "2021-01-01"


def test_stac_projection_null_text_golden_row(spark):
    """STRICT golden row: a doc with NULL text/lang/source (keywords_null.xml
    analog). Text-derived fields are NULL; constants and null-safe fields keep
    their pinned values; the JSON packing emits href:'' (coalesced — Spark
    drops NULL struct fields, which would change the serialized shape)."""
    df = spark.createDataFrame(
        [(1, None, None, None)], "doc_id long, text string, lang string, source string"
    )
    row = df.select(*[b().alias(n) for n, b in MAPPERS.items()]).collect()[0]
    assert row.asDict() == {
        "id": 1,
        "title": None,
        "description": None,
        "description_length": None,
        "n_tokens": None,
        "language": None,
        "language_name": "English",  # unknown/NULL code -> reference default
        "source": None,
        "checksum_sha256": None,
        "status": "planned",  # length NULL falls through the %3 cascade
        "rank_score": 45.0,   # NULL-length ranks: 25 cap + 20 bucket fallthrough
        "links_json": '{"href":""}',
        "stac_version": "1.0.0",
        "type": "Collection",
    }


def test_stac_projection_empty_text_golden_row(spark):
    """STRICT golden row: empty-string text (abnormal-structure analog) —
    sha256 of b'' is the well-known constant, counts are 0, not NULL."""
    df = spark.createDataFrame(
        [(2, "", "zz", "")], "doc_id long, text string, lang string, source string"
    )
    row = df.select(*[b().alias(n) for n, b in MAPPERS.items()]).collect()[0]
    assert row["description_length"] == 0
    assert row["n_tokens"] == 0
    assert (
        row["checksum_sha256"]
        == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert row["language_name"] == "English"  # unknown code 'zz' -> default
    assert row["status"] == "completed"  # length 0 % 3 == 0
    assert row["links_json"] == '{"title":"","href":""}'


def test_route_invalid_abnormal_corpus(spark):
    """NULL, empty, and whitespace-only docs all route as 'empty'; an
    over-long doc routes 'oversize'; a short-but-real doc routes 'undersized';
    a healthy doc does not appear (S7 error-reduction: keep only failures)."""
    df = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "x " * 300),          # 600 bytes > default max_bytes=400
            (5, "just four tokens here"),
            (6, "a perfectly healthy document with enough tokens inside"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in route_invalid(df, "doc_id", "text").collect()}
    assert got == {1: "empty", 2: "empty", 3: "empty", 4: "oversize", 5: "undersized"}


def test_extract_citation_null_and_unmatched(spark):
    rows = (
        spark.createDataFrame(
            [(1, None), (2, ""), (3, "no citation markers in this text")],
            "id long, t string",
        )
        .select("id", extract_citation(F.col("t")).alias("cit"))
        .collect()
    )
    assert all(r["cit"] is None for r in rows)


def test_empty_vocab_tree_matches_nothing(spark):
    """An empty vocabulary tree (keywords_null analog on the J2 path): the
    flatten produces zero label rows and a probe join yields zero matches —
    not an error."""
    nodes = spark.createDataFrame([], "node_id int, name string, broader_id int")
    flat = flatten_vocab_tree(nodes)
    assert flat.count() == 0
    probes = spark.createDataFrame([(1, "NATION_3")], "k long, probe string")
    assert probes.join(F.broadcast(flat), probes.probe == flat.label).count() == 0


def test_shoelace_degenerate_rings(spark):
    """0-, 1- and 2-point rings have signed area exactly 0.0 (ADVICE r2: the
    1-point case used to evaluate a DESCENDING sequence -> NULL/ANSI error)."""
    df = spark.createDataFrame(
        [
            (0, [], []),
            (1, [1.0], [2.0]),
            (2, [1.0, 4.0], [2.0, 6.0]),
            (3, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),  # CCW square: 2A=32
        ],
        "id long, xs array<double>, ys array<double>",
    )
    got = {
        r["id"]: r["a2"]
        for r in df.select(
            "id", shoelace_signed_area2(F.col("xs"), F.col("ys")).alias("a2")
        ).collect()
    }
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 32.0}


def test_polygon_geojson_orientation_and_closure(spark):
    """§2.9d polygon writer STRICT: a CLOCKWISE input ring is reversed to CCW
    (RFC 7946 shell rule, GeometryUtils.java:162-212 analog) and the ring is
    closed (first point repeated last); a CCW input is kept as-is."""
    from es_indexer_spark.ops.mapper import ring_to_geojson_polygon

    def ring(points):
        return [{"k": i, "x": float(x), "y": float(y)} for i, (x, y) in enumerate(points)]

    df = spark.createDataFrame(
        [
            (1, ring([(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0)])),  # CW
            (2, ring([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])),  # CCW
        ],
        "id long, ring array<struct<k:long,x:double,y:double>>",
    )
    got = {
        r["id"]: r["gj"]
        for r in df.select(
            "id", ring_to_geojson_polygon(F.col("ring")).alias("gj")
        ).collect()
    }
    ccw = (
        '{"type":"Polygon","coordinates":'
        "[[[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0],[4.0,0.0]]]}"
    )
    assert got[1] == ccw  # CW input: reversed, then closed
    assert got[2] == (
        '{"type":"Polygon","coordinates":'
        "[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]]]}"
    )
