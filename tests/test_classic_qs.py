"""Lucene classic query_string parser + lowering onto the bool engine.

The classic grammar is public Lucene behavior (the default ES query_string
surface every Kibana/curl user hits on the reference's indices). Parser unit
table + rank/score parity against directly-constructed bool_query calls +
an independent Python brute force for the prefix (scoring_boolean) group.
"""

from __future__ import annotations

import math

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.boolean import bool_query
from es_indexer_spark.query.classic import parse_query_string, query_string

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def qs_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_qs"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    rows = documents.select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    return root, toks


def _rows(df):
    return [(r["docid"], round(r["score"], 9)) for r in df.collect()]


# ---------------------------------------------------------------- parser unit

def test_parse_bare_terms_default_or():
    p = parse_query_string("data stream")
    assert p["should"] == [("data", 1.0), ("stream", 1.0)]
    assert p["must"] == [] and p["must_not"] == []


def test_parse_default_operator_and():
    p = parse_query_string("data stream", default_operator="and")
    assert p["must"] == [("data", 1.0), ("stream", 1.0)]


def test_parse_and_or_adjacency():
    p = parse_query_string("a OR b AND c")
    assert p["should"] == [("a", 1.0)]
    assert p["must"] == [("b", 1.0), ("c", 1.0)]


def test_parse_unary_and_not():
    p = parse_query_string("+a -b NOT c !d")
    assert p["must"] == [("a", 1.0)]
    assert sorted(p["must_not"]) == ["b", "c", "d"]


def test_parse_boost_fuzzy_prefix():
    p = parse_query_string("batch^2.5 strea~1 pre*")
    assert p["should"] == [("batch", 2.5)]
    assert p["should_fuzzy"] == [("strea", 1.0)]
    assert p["should_prefix"] == [("pre", 1.0)]
    assert p["fuzziness"] == 1


def test_parse_phrase_slop_fields_ranges_exists():
    p = parse_query_string(
        'x "data stream"~2 lang:en n_chars:[200 TO 5000} size:>3 _exists_:lang'
    )
    assert p["phrase"] == ("data stream", 2)
    assert p["filter_fields"] == [("lang", "en")]
    assert ("n_chars", "gte", 200) in p["ranges"]
    assert ("n_chars", "lt", 5000) in p["ranges"]
    assert ("size", "gt", 3) in p["ranges"]
    assert p["filter_exists"] == ["lang"]


def test_parse_match_all():
    assert parse_query_string("*:*")["match_all"]
    assert parse_query_string("*")["match_all"]


@pytest.mark.parametrize(
    "bad",
    [
        '-"a phrase"',             # negated phrase
        '"a" "b"',                 # two phrases
        "a~1 b~2",                 # disagreeing fuzziness
        "in*er",                   # inner wildcard
        "?data",                   # leading wildcard
        "lang:e*",                 # wildcard field value
        '"a phrase"^2',            # phrase boost
        "-lang:en",                # negated field filter
        "NOT n_chars:[1 TO 2]",    # negated range
    ],
)
def test_parse_raises_by_name(bad):
    with pytest.raises(ValueError):
        parse_query_string(bad)


# ----------------------------------------------------------- engine parity

def test_qs_or_parity(spark, qs_index):
    root, _ = qs_index
    got = _rows(query_string(spark, root, "data stream", k=10))
    exp = _rows(bool_query(spark, root, should=["data", "stream"], k=10))
    assert got == exp and got


def test_qs_and_not_boost_parity(spark, qs_index):
    root, _ = qs_index
    got = _rows(query_string(spark, root, "data AND stream -key batch^2", k=10))
    exp = _rows(
        bool_query(
            spark, root, must=["data", "stream"], must_not=["key"],
            should=[("batch", 2.0)], k=10,
        )
    )
    assert got == exp and got


def test_qs_phrase_slop_parity(spark, qs_index):
    root, _ = qs_index
    got = _rows(query_string(spark, root, 'customer "data stream"~1', k=10))
    exp = _rows(
        bool_query(
            spark, root, must=["customer"], filter_phrase="data stream",
            filter_phrase_slop=1, k=10,
        )
    )
    assert got == exp and got


def test_qs_filters_parity(spark, qs_index):
    root, _ = qs_index
    got = _rows(
        query_string(
            spark, root,
            "data lang:en n_chars:[200 TO 5000] _exists_:lang", k=10,
        )
    )
    exp = _rows(
        bool_query(
            spark, root, should=["data"],
            filter_fields=[("lang", "en")],
            filter_range=("n_chars", {"gte": 200, "lte": 5000}),
            filter_exists=["lang"], k=10,
        )
    )
    assert got == exp and got


def test_qs_fuzzy_parity(spark, qs_index):
    root, _ = qs_index
    got = _rows(query_string(spark, root, "customer AND strea~1", k=10))
    exp = _rows(
        bool_query(spark, root, must=["customer"], must_fuzzy=["strea"],
                   fuzziness=1, k=10)
    )
    assert got == exp and got


def test_qs_match_all_constant_score(spark, qs_index, documents):
    root, _ = qs_index
    n = documents.count()
    rows = query_string(spark, root, "*:*", k=None).collect()
    assert len(rows) == n
    assert all(r["score"] == 0.0 for r in rows)


# -------------------------------------------- prefix group: independent brute

def test_must_prefix_scoring_boolean_brute(spark, qs_index):
    """bool_query(must_prefix=) = required any-of over the dictionary
    expansion, each present expansion scoring its own BM25 (rewrite=
    scoring_boolean). Independent Python reference over the tokenized corpus."""
    root, toks = qs_index
    prefix = "stre"
    n = len(toks)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    vocab = sorted({t for ts in toks.values() for t in ts if t.startswith(prefix)})
    df = {
        v: sum(1 for ts in toks.values() if v in ts) for v in vocab
    }
    # engine expansion order: df desc, term asc, top-50
    exp = sorted(vocab, key=lambda v: (-df[v], v))[:50]
    scores = {}
    for d, ts in toks.items():
        s, matched = 0.0, False
        for v in exp:
            tf = ts.count(v)
            if tf:
                matched = True
                idf = math.log(1 + (n - df[v] + 0.5) / (df[v] + 0.5))
                s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dls[d] / avgdl))
        if matched:
            scores[d] = s
    exp_rows = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["docid"], r["score"])
        for r in bool_query(spark, root, must_prefix=[prefix], k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp_rows]
    for (gd, gs), (ed, es) in zip(got, exp_rows):
        assert gs == pytest.approx(es, rel=1e-9)


def test_must_prefix_no_expansions_empty(spark, qs_index):
    root, _ = qs_index
    assert query_string(spark, root, "zzzqqqxx* AND data", k=10).count() == 0


# ------------------------------------------------- round 5h: groups + regex

def _sc(df):
    return [(r["docid"], round(r["score"], 6)) for r in df.collect()]


def test_grouped_required_filter_disjunction(spark, qs_index):
    """`+(lang:en OR lang:fr) data` — a REQUIRED group of OR'd field
    filters is a true non-scoring disjunction (parens-only upgrade over
    the flat form, where field filters always conjoin)."""
    root, _ = qs_index
    got = query_string(spark, root, "+(lang:en OR lang:fr) data", k=None)
    en = bool_query(spark, root, should=["data"],
                    filter_fields=[("lang", "en")], k=None)
    fr = bool_query(spark, root, should=["data"],
                    filter_fields=[("lang", "fr")], k=None)
    want = dict(_sc(en))
    want.update(dict(_sc(fr)))
    assert dict(_sc(got)) == want and got.count()


def test_grouped_or_group_is_optional(spark, qs_index):
    """Without +, an OR-adjacent group is itself a should (Lucene
    adjacency): `(a OR b) AND c` requires c AND (a or b), scores sum."""
    root, _ = qs_index
    got = query_string(spark, root, "(data OR stream) AND customer", k=None)
    # reference: the group is its OWN BooleanQuery — pure-should, so it
    # requires >=1 of data/stream (Lucene msm default), unlike a flat
    # should next to a must
    data = dict(_sc(bool_query(spark, root, should=["data", "stream"],
                               must=["customer"], k=None)))
    ds = {d for d, _ in _sc(bool_query(spark, root,
                                       should=["data", "stream"], k=None))}
    want = {d: s for d, s in data.items() if d in ds}
    assert dict(_sc(got)) == want and got.count()


def test_grouped_boost_multiplies_subtree(spark, qs_index):
    """`(data stream)^2 OR batch` — the group boost multiplies the whole
    subtree sum (Lucene BoostQuery), equal to boosting each clause."""
    root, _ = qs_index
    got = query_string(spark, root, "(data stream)^2 OR batch", k=None)
    want = bool_query(
        spark, root, should=[("data", 2.0), ("stream", 2.0), "batch"], k=None
    )
    assert dict(_sc(got)) == dict(_sc(want)) and got.count()


def test_grouped_de_morgan_negated_group(spark, qs_index):
    """`customer -(error AND lang:en)` — NOT over a conjunction excludes
    exactly the docs matching both conjuncts."""
    root, _ = qs_index
    got = query_string(spark, root, "customer -(error AND lang:en)", k=None)
    base = bool_query(spark, root, should=["customer"], k=None)
    both = bool_query(spark, root, must=["error"],
                      filter_fields=[("lang", "en")], k=None)
    want = dict(_sc(base))
    for d, _s in _sc(both):
        want.pop(d, None)
    assert dict(_sc(got)) == want and got.count()


def test_grouped_nested_two_levels(spark, qs_index):
    """Nesting: `((data OR stream) AND customer) OR batch`."""
    root, _ = qs_index
    got = query_string(
        spark, root, "((data OR stream) AND customer) OR batch", k=None
    )
    inner = dict(_sc(bool_query(spark, root, should=["data", "stream"],
                                must=["customer"], k=None)))
    ds = {d for d, _ in _sc(bool_query(spark, root,
                                       should=["data", "stream"], k=None))}
    inner = {d: s for d, s in inner.items() if d in ds}
    batch = dict(_sc(bool_query(spark, root, should=["batch"], k=None)))
    want = {}
    for d in set(inner) | set(batch):
        want[d] = round(inner.get(d, 0.0) + batch.get(d, 0.0), 6)
    got_d = {d: round(s, 4) for d, s in _sc(got)}
    assert got_d == {d: round(s, 4) for d, s in want.items()} and got.count()


def test_grouped_phrase_per_level(spark, qs_index):
    root, _ = qs_index
    got = query_string(spark, root, '("data stream") AND customer', k=None)
    want = bool_query(spark, root, must=["customer"],
                      filter_phrase="data stream", k=None)
    assert dict(_sc(got)) == dict(_sc(want)) and got.count()


def test_grouped_raises_by_name(spark, qs_index):
    root, _ = qs_index
    with pytest.raises(ValueError, match="unbalanced"):
        query_string(spark, root, "(data OR stream", k=5)
    with pytest.raises(ValueError, match="empty"):
        query_string(spark, root, "() AND data", k=5)
    with pytest.raises(ValueError, match="regex"):
        query_string(spark, root, "(/da.a/ OR stream)", k=5)
    with pytest.raises(ValueError, match="match_all"):
        query_string(spark, root, "(* OR data)", k=5)


def test_regexp_flat_expansion_parity(spark, qs_index):
    """`/st.eam/ AND data` — the regexp expands against the dictionary and
    scores as a required constant-score group next to BM25(data)."""
    root, toks = qs_index
    got = query_string(spark, root, "/st.eam/ AND data", k=None)
    import re as _re

    vocab = sorted({t for ts in toks.values() for t in ts})
    exps = [v for v in vocab if _re.fullmatch("st.eam", v)]
    assert exps  # the corpus carries 'stream'
    want = bool_query(spark, root, must=["data"],
                      must_terms=[(exps, 1.0)], k=None)
    assert dict(_sc(got)) == dict(_sc(want)) and got.count()


def test_regexp_negated_excludes_expansions(spark, qs_index):
    root, _ = qs_index
    got = query_string(spark, root, "data -/st.eam/", k=None)
    base = bool_query(spark, root, should=["data"], k=None)
    excl = bool_query(spark, root, should=["stream"], k=None)
    want = dict(_sc(base))
    for d, _s in _sc(excl):
        want.pop(d, None)
    assert dict(_sc(got)) == want and got.count()


def test_regexp_required_empty_expansion(spark, qs_index):
    root, _ = qs_index
    assert query_string(spark, root, "+/zzzqq.*/ data", k=10).count() == 0
