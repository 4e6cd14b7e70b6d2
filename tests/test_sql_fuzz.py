"""Randomized ES-SQL grammar fuzz: hypothesis composes WHERE predicates
from the full supported grammar (comparisons, [NOT] LIKE / BETWEEN / IN,
AND / OR / NOT, parens) and runs the same statement through the engine's
`_sql` layer AND DuckDB over the identical documents table. Counts and
grouped tables must agree exactly — the script-filter lowering
(negations/disjunctions into one Catalyst predicate) must preserve SQL
three-valued semantics on every composition, not just the pinned oracle
entries."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.essql import sql_query

SF_DIR_DOCS = "/root/testdata/sf0.001/documents.parquet"

LEAVES = [
    "lang = 'en'",
    "lang <> 'fr'",
    "n_chars > 300",
    "n_chars <= 150",
    "lang LIKE 'e%'",
    "lang NOT LIKE '%s'",
    "n_chars BETWEEN 200 AND 600",
    "n_chars NOT BETWEEN 100 AND 900",
    "lang IN ('en', 'es')",
    "lang NOT IN ('fr')",
    "source = 'src3'",
]

PRED = st.recursive(
    st.sampled_from(LEAVES),
    lambda kids: st.one_of(
        st.tuples(kids, kids).map(lambda t: f"({t[0]} AND {t[1]})"),
        st.tuples(kids, kids).map(lambda t: f"({t[0]} OR {t[1]})"),
        kids.map(lambda a: f"(NOT {a})"),
    ),
    max_leaves=4,
)


@pytest.fixture(scope="module")
def sql_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_sqlfuzz"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2,
    )
    return root


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR_DOCS}')"
    )
    return con


@settings(max_examples=40, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(PRED)
def test_where_grammar_count_matches_duckdb(spark, sql_index, duck, pred):
    got = sql_query(
        spark, sql_index, f"SELECT COUNT(*) AS n FROM idx WHERE {pred}"
    ).collect()[0]["n"]
    want = duck.sql(
        f"SELECT COUNT(*) AS n FROM documents WHERE {pred}"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(PRED)
def test_where_grammar_group_by_matches_duckdb(spark, sql_index, duck, pred):
    rows = sql_query(
        spark, sql_index,
        f"SELECT lang, COUNT(*) AS n FROM idx WHERE {pred} "
        "GROUP BY lang ORDER BY lang",
    ).collect()
    got = [(r["lang"], r["n"]) for r in rows]
    want = duck.sql(
        f"SELECT lang, COUNT(*) AS n FROM documents WHERE {pred} "
        "AND lang IS NOT NULL GROUP BY lang ORDER BY lang"
    ).fetchall()
    assert got == [(l, int(n)) for l, n in want]
