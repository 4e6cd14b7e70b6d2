"""percolate (reverse search) — clause semantics against a tiny hand-checked
corpus plus the Lucene minimum_should_match defaults.
"""

from __future__ import annotations

import pytest

from es_indexer_spark.query.percolate import percolate

QSCHEMA = (
    "query_id string, must array<string>, should array<string>, "
    "must_not array<string>, minimum_should_match int"
)


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "beta delta"),
            (4, "alpha beta gamma delta"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    return docs


def _pairs(df):
    return sorted((r["doc_id"], r["query_id"]) for r in df.collect())


def test_must_conjunction_and_must_not(spark, tiny):
    queries = spark.createDataFrame(
        [
            ("both", ["alpha", "beta"], None, None, None),
            ("no_delta", ["alpha"], None, ["delta"], None),
        ],
        QSCHEMA,
    )
    got = _pairs(percolate(queries, tiny))
    assert got == [
        (1, "both"), (1, "no_delta"),
        (2, "both"), (2, "no_delta"),
        (4, "both"),
    ]


def test_pure_should_default_msm_1_and_explicit(spark, tiny):
    queries = spark.createDataFrame(
        [
            ("any", None, ["gamma", "delta"], None, None),
            ("two_of", None, ["alpha", "beta", "delta"], None, 2),
        ],
        QSCHEMA,
    )
    got = _pairs(percolate(queries, tiny))
    assert got == [
        (1, "any"), (1, "two_of"),
        (2, "two_of"),
        (3, "any"), (3, "two_of"),
        (4, "any"), (4, "two_of"),
    ]


def test_must_with_should_msm_default_zero(spark, tiny):
    """With a must present the Lucene default requires no should match —
    shoulds only add scoring in ES, so every must match percolates."""
    queries = spark.createDataFrame(
        [("m_plus_s", ["beta"], ["zzz"], None, None)], QSCHEMA
    )
    got = _pairs(percolate(queries, tiny))
    assert got == [(1, "m_plus_s"), (2, "m_plus_s"), (3, "m_plus_s"), (4, "m_plus_s")]


def test_duplicate_terms_count_once(spark, tiny):
    queries = spark.createDataFrame(
        [("dup", ["alpha", "alpha"], None, None, None)], QSCHEMA
    )
    got = _pairs(percolate(queries, tiny))
    assert got == [(1, "dup"), (2, "dup"), (4, "dup")]


def test_pure_negative_matches_by_absence(spark, tiny):
    """Round 5g: only-must_not percolators match every doc NOT containing
    the terms (ES semantics — the broadcast absence pass), next to a
    positive query in the same call; the empty doc matches by absence."""
    queries = spark.createDataFrame(
        [
            ("neg", None, None, ["alpha"], None),
            ("neg2", None, None, ["alpha", "delta"], None),
            ("pos", ["beta"], None, None, None),
        ],
        QSCHEMA,
    )
    got = _pairs(percolate(queries, tiny))
    assert got == [
        (1, "pos"), (2, "pos"),
        (3, "neg"), (3, "pos"),  # no alpha; beta present
        (4, "pos"),
        (5, "neg"), (5, "neg2"),  # empty doc contains nothing
    ]
    # an empty percolator (no clauses at all) is match_all
    q_all = spark.createDataFrame([("all", None, None, None, None)], QSCHEMA)
    assert _pairs(percolate(q_all, tiny)) == [(d, "all") for d in (1, 2, 3, 4, 5)]


def test_empty_doc_never_matches(spark, tiny):
    queries = spark.createDataFrame(
        [("any", None, ["alpha", "beta", "gamma", "delta"], None, None)],
        QSCHEMA,
    )
    assert all(d != 5 for d, _ in _pairs(percolate(queries, tiny)))


def test_pure_negative_null_text_matches_by_absence(spark):
    """A token-less (null-text) doc contains nothing, so it matches every
    pure-negative percolator."""
    docs = spark.createDataFrame([(9, None)], "doc_id long, text string")
    queries = spark.createDataFrame(
        [("neg", None, None, ["alpha"], None)], QSCHEMA
    )
    assert _pairs(percolate(queries, docs)) == [(9, "neg")]
