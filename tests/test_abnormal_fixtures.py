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


# ---- abnormal inputs through the late-round-3 query surfaces --------------------


@pytest.fixture(scope="module")
def abnormal_index(spark, tmp_path_factory):
    """Tiny index with null/empty meta and degenerate docs."""
    from es_indexer_spark.index.builder import build_index

    rows = [
        (1, "data stream batch", "en", 17),
        (2, "data stream", None, None),      # null lang AND null n_chars
        (3, "", "fr", 0),                    # empty text -> zero tokens
        (4, "data data data", "en", 14),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    root = str(tmp_path_factory.mktemp("idx_abn"))
    build_index(
        spark, df, root, content_col="text", id_col="doc_id",
        meta_cols=("lang", "n_chars"), tokenizer="standard",
        n_buckets=2, shard_size=8, n_ckpt_batches=1, store_positions=True,
    )
    return root


def test_function_score_missing_substitution(spark, abnormal_index):
    """ES `missing`: a null field value scores as the substitute, never NULL."""
    import math

    from es_indexer_spark.query.engine import function_score_topk, topk

    base = {
        r["docid"]: r["score"]
        for r in topk(spark, abnormal_index, "stream", k=10).collect()
    }
    got = {
        r["docid"]: r["score"]
        for r in function_score_topk(
            spark, abnormal_index, "stream", "n_chars", k=10, missing=5.0
        ).collect()
    }
    assert set(got) == set(base)  # the null-field doc is scored, not dropped
    assert got[2] == pytest.approx(round(base[2] * math.log(1 + 5.0), 6))
    assert got[1] == pytest.approx(round(base[1] * math.log(1 + 17.0), 6))


def test_collapse_null_key_group(spark, abnormal_index):
    """A null collapse key forms its own group (docs are never dropped from
    the ranked result by a missing field)."""
    from es_indexer_spark.query.engine import collapse_topk

    got = [(r["docid"], r["lang"]) for r in collapse_topk(
        spark, abnormal_index, "data stream", "lang", k=10).collect()]
    langs = [l for _, l in got]
    assert None in langs and len(langs) == len(set(langs))


def test_range_and_exists_skip_null_field(spark, abnormal_index):
    from es_indexer_spark.query.lookup import exists_query, range_query

    ex = {r["docid"] for r in exists_query(spark, abnormal_index, "n_chars").collect()}
    assert ex == {1, 3, 4}
    rng = {r["docid"] for r in range_query(
        spark, abnormal_index, "n_chars", {"gte": 0}).collect()}
    assert rng == {1, 3, 4}  # null never passes a range bound


def test_wildcard_and_mpp_on_degenerate_docs(spark, abnormal_index):
    from es_indexer_spark.query.phrase import match_phrase_prefix
    from es_indexer_spark.query.suggest import wildcard_query

    # empty doc 3 matches nothing; '*' alone expands the whole dictionary
    assert {r["docid"] for r in wildcard_query(
        spark, abnormal_index, "*", k=100).collect()} == {1, 2, 4}
    got = {r["docid"] for r in match_phrase_prefix(
        spark, abnormal_index, "data st", k=None).collect()}
    assert got == {1, 2}


def test_simple_qs_degenerate_inputs(spark, abnormal_index):
    from es_indexer_spark.query.querystring import simple_query_string

    assert simple_query_string(spark, abnormal_index, "   ").collect() == []
    assert simple_query_string(spark, abnormal_index, "+ - \"\"").collect() == []
    # a must_not-only string: documented empty (nothing to exclude from)
    assert simple_query_string(spark, abnormal_index, "-data").collect() == []


def test_packing_zero_and_oversize_docs(spark):
    from es_indexer_spark.ops.packing import pack_documents

    rows = [(1, "g", 0), (2, "g", 0), (3, "g", 5000), (4, "g", 10)]
    df = spark.createDataFrame(rows, "id long, g string, tok long")
    got = {
        r["id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, "id", "tok", budget=1024, group_col="g").collect()
    }
    # zero-token docs take no budget; the oversize doc starts pack 0 at its
    # offset and pushes the next doc into the pack where its budget window
    # lands (floor(5000/1024) = 4)
    assert got == {1: (0, 0), 2: (0, 0), 3: (0, 0), 4: (4, 904)}


# ---- round 4: curation / geo / sort-by-field abnormal inputs ----------------


def test_contamination_empty_benchmark_all_clean(spark):
    """An empty benchmark table must yield a zero row per doc — never a crash
    or a dropped doc (log-and-skip semantics)."""
    from es_indexer_spark.ops.curation import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([], "text string")
    out = {r["doc_id"]: (r["n_contaminated"], r["contamination"])
           for r in ngram_contamination(docs, bench, n=2).collect()}
    assert out == {1: (0, 0.0), 2: (0, 0.0), 3: (0, 0.0)}


def test_contamination_null_text_doc_is_clean(spark):
    from es_indexer_spark.ops.curation import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_grams"]
           for r in ngram_contamination(docs, docs, n=2).collect()}
    assert out[2] == 0 and out[1] == 2


def test_sample_corpus_empty_weights_keeps_all(spark):
    from es_indexer_spark.ops.curation import sample_corpus

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    assert sample_corpus(docs, {}).count() == 100


def test_sample_corpus_null_source_keeps_row(spark):
    """A NULL source has no weight entry: the default weight (1.0) applies —
    the row is never silently dropped by the map lookup's NULL."""
    from es_indexer_spark.ops.curation import sample_corpus

    docs = spark.createDataFrame(
        [(1, None), (2, "s0")], "doc_id long, source string"
    )
    kept = {r["doc_id"] for r in sample_corpus(docs, {"s0": 1.0}).collect()}
    assert kept == {1, 2}


def test_geo_bbox_zero_area_box(spark, tmp_path):
    """min == max on both axes: the degenerate box matches exactly that
    cell's column (ES treats bounds inclusively)."""
    from es_indexer_spark.ops.geoindex import geo_bbox_query, write_geo_index

    pts = spark.createDataFrame(
        [("c", "2024-01-05 00:00:00", 3, 4), ("c", "2024-01-05 00:00:00", 3, 5)],
        "collection string, ts string, lon long, lat long",
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "geo")
    write_geo_index(pts, path, n_files=1)
    out = geo_bbox_query(spark, path, (3, 4, 3, 4)).collect()
    assert [(r["lon"], r["lat"], r["cnt"]) for r in out] == [(3, 4, 1)]


def test_topk_sorted_nulls_last_both_directions(spark, tmp_path):
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.engine import topk_sorted

    docs = spark.createDataFrame(
        [(1, "alpha term", "x"), (2, "alpha term", None), (3, "alpha other", "a")],
        "doc_id long, text string, tag string",
    )
    root = str(tmp_path / "idx")
    build_index(
        spark, docs, root, content_col="text", id_col="doc_id",
        meta_cols=("tag",), tokenizer="standard", n_buckets=2,
        shard_size=10, n_ckpt_batches=1,
    )
    up = topk_sorted(spark, root, "alpha", sort=[("tag", "asc"), "_score"], k=3).collect()
    dn = topk_sorted(spark, root, "alpha", sort=[("tag", "desc"), "_score"], k=3).collect()
    # ES missing:_last default — the NULL-tag doc sorts last either way
    assert up[-1]["docid"] == 2 and dn[-1]["docid"] == 2
    assert [r["tag"] for r in up[:2]] == ["a", "x"]
    assert [r["tag"] for r in dn[:2]] == ["x", "a"]


def test_ppm_wav_truncated_payloads_raise_cleanly(spark):
    import numpy as np
    import pytest as _pt

    from es_indexer_spark.ops.multimodal import decode_ppm, decode_wav, encode_ppm, encode_wav

    good_ppm = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    with _pt.raises(ValueError):
        decode_ppm(good_ppm[: len(good_ppm) // 2])  # truncated raster
    good_wav = encode_wav(np.zeros(64), 8000)
    with _pt.raises(ValueError):
        decode_wav(good_wav[:16])  # header only — no fmt/data chunks
    with _pt.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM (P3) unsupported


def test_range_agg_unbounded_only(spark):
    from es_indexer_spark.query.aggs import range_agg

    df = spark.range(7).select(F.col("id").cast("double").alias("v"))
    out = range_agg(df, "v", [(None, None)]).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("*-*", 7)]


def test_topk_sorted_search_after_pages_concatenate(spark, tmp_path):
    """Keyset pagination on the sorted surface: pages concatenate exactly to
    one larger-k result, INCLUDING across the null region (nulls-last keyset
    semantics) and under a desc sort."""
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.engine import topk_sorted

    rows = []
    for i in range(40):
        tag = None if i % 5 == 0 else f"t{i % 7}"
        rows.append((i, "alpha term " + ("extra " * (i % 3)), tag))
    docs = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    root = str(tmp_path / "idx_sa")
    build_index(
        spark, docs, root, content_col="text", id_col="doc_id",
        meta_cols=("tag",), tokenizer="standard", n_buckets=2,
        shard_size=10, n_ckpt_batches=1,
    )
    for srt in ([("tag", "asc"), "_score"], [("tag", "desc"), ("_score", "asc")]):
        full = topk_sorted(spark, root, "alpha", sort=srt, k=40).collect()
        paged, after = [], None
        for _ in range(10):
            page = topk_sorted(spark, root, "alpha", sort=srt, k=5, after=after).collect()
            if not page:
                break
            paged.extend(page)
            last = page[-1]
            after = (last["tag"], last["score"], last["docid"])
        assert [(r["docid"], r["tag"], r["score"]) for r in paged] == [
            (r["docid"], r["tag"], r["score"]) for r in full
        ], srt
    # wrong cursor arity is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        topk_sorted(spark, root, "alpha", sort=[("tag", "asc")], k=5, after=(1,))


# ---- abnormal inputs through the round-5d surfaces ------------------------------


def test_query_string_degenerate_inputs(spark, abnormal_index):
    """Operator remnants and absent terms degrade to empty/valid results,
    never a crash; null-meta docs survive field filters correctly."""
    from es_indexer_spark.query.classic import query_string

    # bare operators and empty string -> no clauses -> empty result
    assert query_string(spark, abnormal_index, "", k=10).count() == 0
    assert query_string(spark, abnormal_index, "+ - ^2", k=10).count() == 0
    # absent must term -> empty, not error
    assert query_string(spark, abnormal_index, "zzzqqq AND data", k=10).count() == 0
    # _exists_ drops the null-lang doc 2
    ids = {r["docid"] for r in
           query_string(spark, abnormal_index, "data _exists_:lang", k=10).collect()}
    assert 2 not in ids and 1 in ids


def test_script_score_null_field_and_empty_matchset(spark, abnormal_index):
    """A script reading a NULL stored field yields a NULL score for that doc;
    the null-scored row sorts last, never aborts (ANSI-safe)."""
    from es_indexer_spark.query.engine import script_score_topk

    rows = script_score_topk(
        spark, abnormal_index, "data", "_score * n_chars", fields=("n_chars",),
        k=10,
    ).collect()
    by_id = {r["docid"]: r["score"] for r in rows}
    assert by_id[2] is None  # null n_chars -> null score, row kept
    assert rows[-1]["docid"] == 2  # desc sort puts the null last
    assert script_score_topk(
        spark, abnormal_index, "zzzqqq", "_score * 2", k=10
    ).count() == 0


def test_percolate_empty_and_null_shapes(spark):
    """Null clause arrays, empty docs frame, and an empty queries frame all
    produce empty results without errors."""
    from es_indexer_spark.query.percolate import percolate

    qdf = spark.createDataFrame(
        [("q1", ["alpha"], None, None, None)],
        "query_id string, must array<string>, should array<string>, "
        "must_not array<string>, minimum_should_match int",
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert percolate(qdf, empty_docs).count() == 0
    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    empty_q = spark.createDataFrame(
        [], "query_id string, must array<string>, should array<string>, "
            "must_not array<string>, minimum_should_match int",
    )
    assert percolate(empty_q, docs).count() == 0
    null_text = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert percolate(qdf, null_text).count() == 0


def test_knn_dimension_mismatch_and_empty(spark):
    """A query vector of the wrong dimensionality raises at evaluation (the
    zip_with dot product nulls out -> no silent wrong answer); an empty
    frame returns empty."""
    from es_indexer_spark.ops.similarity import knn_search

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = knn_search(emb, "vec_id", "embedding", [1.0, 0.0], k=5)
    assert [r["vec_id"] for r in out.collect()] == [1, 2]
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert knn_search(empty, "vec_id", "embedding", [1.0, 0.0], k=5).count() == 0
    # mismatched dims: zip_with pads with NULL -> cosine NULL -> rows drop
    # from the similarity floor rather than scoring garbage
    bad = knn_search(emb, "vec_id", "embedding", [1.0, 0.0, 5.0], k=5,
                     similarity=-1.0)
    assert bad.count() == 0


def test_significant_text_no_hits(spark, abnormal_index):
    from es_indexer_spark.query.aggs import significant_text

    docs = spark.createDataFrame(
        [(1, "data stream batch"), (2, "data stream"), (3, ""), (4, "data data data")],
        "doc_id long, text string",
    )
    assert significant_text(
        spark, abnormal_index, "zzzqqq", docs, size=10, min_doc_count=1
    ).count() == 0


def test_dsl_empty_and_unknown_fields(spark, abnormal_index):
    from es_indexer_spark.query.dsl import search

    # body with no query defaults to match_all over the live docs
    assert search(spark, abnormal_index, {"size": 10}).count() == 4
    # a match against an absent term -> empty, not error
    assert search(
        spark, abnormal_index, {"query": {"match": {"text": "zzzqqq"}}}
    ).count() == 0


def test_bool_leaves_degenerate_inputs(spark, abnormal_index):
    """Round 5f leaves under degenerate input: empty phrase text, empty
    filter(terms) value list, null stored values — empty results or named
    errors, never garbage."""
    from es_indexer_spark.query.boolean import bool_query

    # a must phrase that analyzes to nothing = MatchNoDocs
    assert bool_query(spark, abnormal_index, must_phrase=["  ..  "], k=5).count() == 0
    # empty filter(terms) value list: no doc can match the membership
    assert bool_query(
        spark, abnormal_index, must=["data"], filter_fields=[("lang", [])], k=5
    ).count() == 0
    # null stored lang never matches a membership list (SQL isin semantics)
    got = {r["docid"] for r in bool_query(
        spark, abnormal_index, must=["data"],
        filter_fields=[("lang", ["en", "fr"])], k=5,
    ).collect()}
    assert got == {1, 4}
    # a should phrase over an index without positions raises by name
    # (abnormal_index stores positions, so build the check on the spec level:
    # empty should phrase clauses are dropped, query still runs)
    assert bool_query(
        spark, abnormal_index, must=["data"], should_phrase=["   "], k=5
    ).count() == 3


def test_dsl_bool_leaf_error_shapes(spark, abnormal_index):
    from es_indexer_spark.query.dsl import search, validate_query

    # span_multi wrapping a non-prefix match raises naming the constraint
    out = validate_query(spark, abnormal_index, {"query": {"span_near": {
        "clauses": [{"span_term": {"text": "data"}},
                    {"span_multi": {"match": {"regexp": {"text": "d.*"}}}}]}}})
    assert out["valid"] is False and "prefix" in out["error"]
    # range in should is a SCORED clause since round 5f — validates clean
    out = validate_query(spark, abnormal_index, {"query": {"bool": {
        "should": [{"range": {"n_chars": {"gte": 1}}}]}}})
    assert out == {"valid": True, "error": None}
    # non-scoring/wrapper nested bools flatten since round 5g; SCORING
    # nested bools compose since round 5h — both validate clean
    out = validate_query(spark, abnormal_index, {"query": {"bool": {
        "must": [{"bool": {"must": []}}]}}})
    assert out == {"valid": True, "error": None}
    out = validate_query(spark, abnormal_index, {"query": {"bool": {
        "must": [{"bool": {"should": [{"match": {"text": "a"}},
                                      {"match": {"text": "b"}}],
                           "minimum_should_match": 2}}]}}})
    assert out == {"valid": True, "error": None}
    # an unsupported leaf inside the composed tree still surfaces by name
    out = validate_query(spark, abnormal_index, {"query": {"bool": {
        "must": [{"bool": {"should": [{"ids": {"values": [1]}}],
                           "minimum_should_match": 1}}]}}})
    assert out["valid"] is False and "supports" in out["error"]


def test_round5g_abnormal_shapes(spark, tmp_path):
    """Round-5g degenerate inputs: empty mget batch, empty reindex match
    set, snapshot of an unpublished root, bad alias actions, empty
    mtermvectors batch."""
    import os

    from es_indexer_spark.index.aliases import update_aliases
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.index.reindex import reindex
    from es_indexer_spark.index.snapshot import create_snapshot
    from es_indexer_spark.query.lookup import mget, mterm_vectors

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}", "en") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    root = str(tmp_path / "idx")
    build_index(
        spark, docs, root, content_col="text", id_col="doc_id",
        meta_cols=("lang",), tokenizer="standard", n_buckets=2,
        shard_size=16, n_ckpt_batches=1, resume=False,
    )

    # empty mget batch: empty frame, stable schema
    out = mget(spark, root, [])
    assert out.count() == 0 and "found" in out.columns

    # empty mtermvectors batch: empty frame, stable schema
    out = mterm_vectors(spark, root, {})
    assert out.count() == 0 and "doc_key" in out.columns

    # reindex whose query matches nothing: created == 0, dst still publishes
    dst = str(tmp_path / "idx_dst")
    res = reindex(
        spark, docs, root, dst,
        query={"term": {"lang": {"value": "zz"}}},
        content_col="text", id_col="doc_id", meta_cols=("lang",),
    )
    assert res["created"] == 0
    from es_indexer_spark.index import catalog

    assert catalog.index_exists(dst)

    # snapshot of a root with no published version raises cleanly
    with pytest.raises(FileNotFoundError):
        create_snapshot(str(tmp_path / "nope"), str(tmp_path / "repo"), "s")
    # bad snapshot ids rejected before any IO
    with pytest.raises(ValueError, match="bad snapshot id"):
        create_snapshot(root, str(tmp_path / "repo"), "a/b")

    # alias actions: malformed shapes raise naming the constraint
    cd = str(tmp_path / "cluster")
    with pytest.raises(ValueError, match="single-key"):
        update_aliases(cd, [{"add": {}, "remove": {}}])
    with pytest.raises(ValueError, match="add/remove/remove_index"):
        update_aliases(cd, [{"frob": {"alias": "a", "index": "i"}}])
    # registry untouched after failed batches
    assert not os.path.exists(os.path.join(cd, "_aliases.json"))


def test_empty_index_is_valid_and_queryable(spark, tmp_path):
    """An empty corpus builds a VALID empty index (ES semantics): every read
    path returns empty instead of failing on schema-less parquet dirs."""
    from es_indexer_spark.index import catalog
    from es_indexer_spark.index.builder import build_index
    from es_indexer_spark.query.engine import topk
    from es_indexer_spark.query.lookup import mget, scan_after

    root = str(tmp_path / "idx_empty")
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    vdir = build_index(
        spark, empty, root, content_col="text", id_col="doc_id",
        meta_cols=("lang",), tokenizer="standard", n_buckets=2,
        shard_size=16, n_ckpt_batches=1, resume=False,
    )
    assert catalog.resolve(root) == vdir
    assert catalog.read_stats(vdir)["n_docs"] == 0
    assert topk(spark, root, "anything at all", k=5).count() == 0
    assert scan_after(spark, root).count() == 0
    rows = mget(spark, root, [1, 2]).collect()
    assert [r["found"] for r in rows] == [False, False]
