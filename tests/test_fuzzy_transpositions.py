"""ES ``transpositions`` (Damerau-Levenshtein) for the fuzzy family.

ES's default fuzzy semantics count an adjacent swap as ONE edit
(``fuzzy_transpositions``, default true); this engine defaults to classic
Levenshtein (documented divergence) and exposes ``transpositions=True`` on
fuzzy_topk / fuzzy_expansions / bool_query fuzzy clauses / suggest_fuzzy and
through the DSL. The distance is the UNRESTRICTED Damerau variant — exactly
DuckDB's ``damerau_levenshtein`` (pinned below), so every transpositions
query stays oracle-replayable.

Reference anchor: the reference's search surface inherits ES match/fuzzy
semantics (geonetwork4-api/.../GeoNetworkServiceImpl.java bool queries);
fuzziness options are public ES API.
"""
from __future__ import annotations

import pytest

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.engine import (
    _damerau,
    _levenshtein,
    fuzzy_expansions,
    fuzzy_topk,
    topk,
)


@pytest.fixture(scope="module")
def tr_index(spark, tmp_path_factory):
    """Tiny corpus whose vocabulary makes transposition semantics visible:
    'stream' is reachable from 'tsream' only when a swap is one edit."""
    root = str(tmp_path_factory.mktemp("idx_transpositions"))
    rows = [
        (1, "stream processing stream engine"),
        (2, "data stream pipeline"),
        (3, "saturn orbit probe"),
        (4, "stamp collection stack"),
        (5, "random filler words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, docs, root, content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=1,
    )
    return root


# ---------------------------------------------------------------- distance
def test_damerau_table():
    """Hand-checked table incl. the unrestricted-vs-OSA distinguishing case."""
    table = [
        ("abc", "abc", 0),
        ("ab", "ba", 1),       # lev 2
        ("stream", "tsream", 1),
        ("abc", "acb", 1),
        ("abcd", "badc", 2),
        ("ca", "abc", 2),      # unrestricted: ca -> ac -> abc (OSA gives 3)
        ("", "ab", 2),
        ("xy", "yx", 1),
        ("kitten", "sitting", 3),
    ]
    for a, b, want in table:
        assert _damerau(a, b) == want, (a, b)
        assert _damerau(b, a) == want, (b, a)


def test_damerau_matches_duckdb_exactly():
    """The oracle contract: _damerau == DuckDB damerau_levenshtein on a
    deterministic cross-product of short strings (covers empty, repeats,
    swaps, long-range transpositions)."""
    import duckdb

    words = ["", "a", "ab", "ba", "abc", "acb", "ca", "aab", "stream",
             "tsream", "stmea", "satrun", "saturn", "abcd", "badc"]
    pairs = [(a, b) for a in words for b in words]
    got = [_damerau(a, b) for a, b in pairs]
    want = [
        duckdb.sql(
            f"SELECT damerau_levenshtein('{a}', '{b}')"
        ).fetchone()[0]
        for a, b in pairs
    ]
    assert got == want


def test_damerau_never_exceeds_levenshtein():
    words = ["stream", "tsream", "saturn", "satrun", "stack", "stamp", "ab",
             "ba", "abcd", "dcba"]
    for a in words:
        for b in words:
            d, l = _damerau(a, b), _levenshtein(a, b)
            assert d <= l
            assert l <= 2 * d or d == l == 0


# ---------------------------------------------------------------- fuzzy query
def test_fuzzy_transposed_term_matches_only_with_transpositions(spark, tr_index):
    """'tsream' is 1 Damerau edit / 2 Levenshtein edits from 'stream':
    transpositions=True ranks like topk('stream') damped by 1 - 1/6;
    the classic default finds nothing at fuzziness=1 (prefix_length=0 —
    the transposed head means the first char differs)."""
    got = [
        (r["docid"], r["score"])
        for r in fuzzy_topk(
            spark, tr_index, "tsream", k=10,
            fuzziness=1, prefix_length=0, transpositions=True,
        ).collect()
    ]
    exact = [
        (r["docid"], r["score"])
        for r in topk(spark, tr_index, "stream", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exact] and got
    boost = 1.0 - 1.0 / 6.0
    assert [s for _, s in got] == pytest.approx([boost * s for _, s in exact])

    assert (
        fuzzy_topk(
            spark, tr_index, "tsream", k=10, fuzziness=1, prefix_length=0,
        ).collect()
        == []
    )


def test_fuzzy_expansions_superset_and_boost_uses_damerau(spark, tr_index):
    """The transpositions expansion set contains the classic one (damerau <=
    lev), and the boost divides by the DAMERAU distance: 'satrun' is 1 swap
    from 'saturn' => boost 1 - 1/6 even though lev = 2."""
    from es_indexer_spark.index import catalog

    vdir = catalog.resolve(tr_index)
    classic = {t for t, *_ in fuzzy_expansions(
        spark, vdir, "saturn", fuzziness=1, prefix_length=0)}
    with_tr = {t: boost for t, _df, _bkt, boost in fuzzy_expansions(
        spark, vdir, "satrun", fuzziness=1, prefix_length=0,
        transpositions=True)}
    assert "saturn" in with_tr
    assert with_tr["saturn"] == pytest.approx(1.0 - 1.0 / 6.0)
    # same-term sanity: expanding 'saturn' classically finds itself too
    assert "saturn" in classic
    lev_only = {t for t, *_ in fuzzy_expansions(
        spark, vdir, "satrun", fuzziness=1, prefix_length=0)}
    assert lev_only <= set(with_tr)
    assert "saturn" not in lev_only  # lev('satrun','saturn') = 2 > 1


def test_bool_fuzzy_clause_transpositions_parity(spark, tr_index):
    """A one-clause bool fuzzy with transpositions == the standalone fuzzy
    query (same expansion, same similarity boosts)."""
    from es_indexer_spark.query.boolean import bool_query

    got = [
        (r["docid"], round(r["score"], 9))
        for r in bool_query(
            spark, tr_index, must_fuzzy=["tsream"], minimum_should_match=0,
            fuzziness=1, prefix_length=0, transpositions=True, k=10,
        ).collect()
    ]
    want = [
        (r["docid"], round(r["score"], 9))
        for r in fuzzy_topk(
            spark, tr_index, "tsream", k=10,
            fuzziness=1, prefix_length=0, transpositions=True,
        ).collect()
    ]
    assert got == want and got


# ---------------------------------------------------------------- suggester
def test_suggest_fuzzy_transpositions(spark, tr_index):
    """Completion with a transposed head: 'tsre' is 1 Damerau edit from the
    'stre' prefix of 'stream' but >= 2 Levenshtein edits from every prefix
    window, so only transpositions=True completes it (prefix_length=0 —
    the swap sits in position 1)."""
    from es_indexer_spark.query.suggest import suggest_fuzzy

    got = suggest_fuzzy(
        spark, tr_index, "tsre", k=10, fuzziness=1, prefix_length=0,
        transpositions=True,
    ).collect()
    assert [r["term"] for r in got] == ["stream"]
    assert got[0]["edits"] == 1

    assert (
        suggest_fuzzy(
            spark, tr_index, "tsre", k=10, fuzziness=1, prefix_length=0,
        ).collect()
        == []
    )


def test_suggest_fuzzy_transpositions_matches_classic_when_no_swaps(spark, tr_index):
    """On an input whose candidates involve no transposition, both distances
    agree: same terms, same edits, same order."""
    from es_indexer_spark.query.suggest import suggest_fuzzy

    a = [
        (r["term"], r["edits"])
        for r in suggest_fuzzy(spark, tr_index, "sta", k=10, fuzziness=1).collect()
    ]
    b = [
        (r["term"], r["edits"])
        for r in suggest_fuzzy(
            spark, tr_index, "sta", k=10, fuzziness=1, transpositions=True
        ).collect()
    ]
    assert a == b and a


# ----------------------------------------------------- term suggester distance
def test_suggest_terms_string_distance(spark, tr_index):
    """ES term-suggester string_distance: 'damerau_levenshtein' (and its
    'internal' alias) count the satrun->saturn swap as 1 edit; the default
    'levenshtein' sees 2; unknown names raise."""
    from es_indexer_spark.query.suggest import suggest_terms

    kw = dict(max_edits=1, prefix_length=1, min_word_length=4)
    classic = suggest_terms(spark, tr_index, "satrun", **kw).collect()
    assert classic == []
    for dist in ("damerau_levenshtein", "internal"):
        got = suggest_terms(
            spark, tr_index, "satrun", string_distance=dist, **kw
        ).collect()
        assert [(r["term"], r["edits"]) for r in got] == [("saturn", 1)]

    # at max_edits=2 both admit saturn, damerau ranks it closer (edits 1 vs 2)
    lev2 = suggest_terms(spark, tr_index, "satrun", max_edits=2).collect()
    dam2 = suggest_terms(
        spark, tr_index, "satrun", max_edits=2,
        string_distance="damerau_levenshtein",
    ).collect()
    assert ("saturn", 2) in [(r["term"], r["edits"]) for r in lev2]
    assert ("saturn", 1) in [(r["term"], r["edits"]) for r in dam2]

    with pytest.raises(ValueError, match="unknown string_distance"):
        suggest_terms(spark, tr_index, "satrun", string_distance="cosine")


def test_suggest_terms_jaro_winkler(spark, tr_index):
    """string_distance='jaro_winkler': candidates stay gated by max_edits
    Levenshtein (Lucene generates from the edit automaton; the distance only
    re-scores), the result gains a score column equal to DuckDB's
    jaro_winkler_similarity rounded to 6 dp, ranked score desc."""
    import duckdb

    from es_indexer_spark.query.suggest import _jaro_winkler, suggest_terms

    got = suggest_terms(
        spark, tr_index, "satrun", max_edits=2,
        string_distance="jaro_winkler",
    ).collect()
    assert got, "the max_edits=2 gate admits saturn"
    lev_terms = {
        r["term"]
        for r in suggest_terms(spark, tr_index, "satrun", max_edits=2).collect()
    }
    assert {r["term"] for r in got} == lev_terms  # same candidate gate
    con = duckdb.connect()
    for r in got:
        want = con.execute(
            "select round(jaro_winkler_similarity(?, 'satrun'), 6)", [r["term"]]
        ).fetchone()[0]
        assert r["score"] == want
        assert r["score"] == round(_jaro_winkler(r["term"], "satrun"), 6)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_ngram_similarity_scalar():
    """Kondrak bigram similarity: pinned values + invariants (bounds,
    self-similarity 1, disjoint-alphabet 0, degenerate-length conventions)."""
    import random

    from es_indexer_spark.query.suggest import _ngram_similarity as ng

    assert ng("", "") == 1.0
    assert ng("", "a") == 0.0
    assert ng("a", "a") == 1.0
    assert ng("a", "b") == 0.0
    assert ng("a", "ab") == 0.5  # sub-n inputs: positional agreement / max len
    assert ng("ab", "ab") == 1.0
    assert ng("abcd", "wxyz") == 0.0
    assert round(ng("stream", "strem"), 6) == 0.75
    assert round(ng("saturn", "satrun"), 6) == 0.666667
    assert round(ng("data", "date"), 6) == 0.875
    assert round(ng("kitten", "sitting"), 6) == 0.5
    rng = random.Random(3)
    for _ in range(2000):
        s = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        t = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        v = ng(s, t)
        assert 0.0 <= v <= 1.0
        assert ng(s, s) == 1.0


def test_suggest_terms_ngram(spark, tr_index):
    """string_distance='ngram': same max_edits-Levenshtein candidate gate as
    jaro_winkler, score column = the Kondrak bigram similarity, ranked desc."""
    from es_indexer_spark.query.suggest import _ngram_similarity, suggest_terms

    got = suggest_terms(
        spark, tr_index, "satrun", max_edits=2, string_distance="ngram"
    ).collect()
    assert got
    lev_terms = {
        r["term"]
        for r in suggest_terms(spark, tr_index, "satrun", max_edits=2).collect()
    }
    assert {r["term"] for r in got} == lev_terms
    for r in got:
        assert r["score"] == round(_ngram_similarity(r["term"], "satrun"), 6)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_jaro_winkler_matches_duckdb_exactly():
    """Fuzz the scalar against DuckDB's jaro_winkler_similarity — the oracle
    replay depends on bit-identity (incl. the 0.7 boost threshold, the 4-char
    prefix cap, and the empty-string convention)."""
    import random

    import duckdb

    from es_indexer_spark.query.suggest import _jaro_winkler

    con = duckdb.connect()
    rng = random.Random(7)
    pairs = [("", ""), ("", "a"), ("ab", "ba"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("aaaaaab", "aaaaaba")]
    pairs += [
        (
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8))),
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8))),
        )
        for _ in range(3000)
    ]
    for s, t in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s, t]
        ).fetchone()[0]
        assert abs(_jaro_winkler(s, t) - want) < 1e-12, (s, t)


def test_suggest_terms_sort_frequency(spark, tr_index):
    """sort='frequency' puts df ahead of closeness: 'stream' (df 2) outranks
    a closer lower-df candidate; sort='score' keeps edits first; bad sort
    values raise."""
    from es_indexer_spark.query.suggest import suggest_terms

    # 'stramp' -> stream (2 edits, df 2) vs stamp (1 edit? st(r)amp drop r =
    # 1 edit, df 1): score-sort puts stamp first, frequency-sort stream first
    score = [
        (r["term"], r["edits"], r["df"])
        for r in suggest_terms(
            spark, tr_index, "stramp", max_edits=2, suggest_mode="always"
        ).collect()
    ]
    freq = [
        (r["term"], r["edits"], r["df"])
        for r in suggest_terms(
            spark, tr_index, "stramp", max_edits=2, suggest_mode="always",
            sort="frequency",
        ).collect()
    ]
    assert set(score) == set(freq) and score
    assert score == sorted(score, key=lambda t: (t[1], -t[2], t[0]))
    assert freq == sorted(freq, key=lambda t: (-t[2], t[1], t[0]))
    assert score != freq  # the fixture makes the orders genuinely differ

    with pytest.raises(ValueError, match="sort must be"):
        suggest_terms(spark, tr_index, "stramp", sort="recency")


def test_suggest_terms_popular_mode(spark, tmp_path):
    """suggest_mode='popular': candidates must out-df the input term —
    'strews' (df 1) keeps 'stream' (df 2) and drops same-df 'stress';
    an absent input (df 0) behaves like 'always'; bad modes raise."""
    from es_indexer_spark.query.suggest import suggest_terms

    root = str(tmp_path / "idx_popular")
    rows = [
        (1, "stream merges"),
        (2, "stream splits"),
        (3, "strews gravel"),
        (4, "stress tested"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, docs, root, content_col="text", id_col="doc_id",
        tokenizer="standard", n_buckets=4, shard_size=100, n_ckpt_batches=1,
    )

    kw = dict(max_edits=2, min_word_length=4)
    always = {
        (r["term"], r["df"])
        for r in suggest_terms(
            spark, root, "strews", suggest_mode="always", **kw
        ).collect()
    }
    popular = {
        (r["term"], r["df"])
        for r in suggest_terms(
            spark, root, "strews", suggest_mode="popular", **kw
        ).collect()
    }
    assert ("stress", 1) in always and ("stream", 2) in always
    assert popular == {t for t in always if t[1] > 1} == {("stream", 2)}

    # absent input (df 0): popular == always
    pop_absent = suggest_terms(
        spark, root, "strem", suggest_mode="popular", **kw
    ).collect()
    alw_absent = suggest_terms(
        spark, root, "strem", suggest_mode="always", **kw
    ).collect()
    assert [r.asDict() for r in pop_absent] == [r.asDict() for r in alw_absent]
    assert pop_absent

    with pytest.raises(ValueError, match="suggest_mode"):
        suggest_terms(spark, root, "strews", suggest_mode="weird")


def test_dsl_suggest_terms_string_distance(spark, tr_index):
    """The suggest section passes string_distance through to suggest_terms."""
    from es_indexer_spark.query.dsl import suggest

    out = suggest(spark, tr_index, {
        "fix": {"text": "satrun", "term": {
            "max_edits": 1, "string_distance": "internal",
        }},
    })
    rows = out["fix"].collect()
    assert [(r["term"], r["edits"]) for r in rows] == [("saturn", 1)]


# ---------------------------------------------------------------- DSL
def test_dsl_fuzzy_transpositions_dispatch(spark, tr_index):
    """{"fuzzy": {field: {..., transpositions: true}}} ≡ the direct call, and
    match + fuzzy_transpositions routes the bool fuzzy clause."""
    from es_indexer_spark.query.dsl import search

    via_dsl = [
        (r["docid"], round(r["score"], 9))
        for r in search(spark, tr_index, {
            "query": {"fuzzy": {"content": {
                "value": "tsream", "fuzziness": 1, "prefix_length": 0,
                "transpositions": True,
            }}},
            "size": 10,
        }).collect()
    ]
    direct = [
        (r["docid"], round(r["score"], 9))
        for r in fuzzy_topk(
            spark, tr_index, "tsream", k=10,
            fuzziness=1, prefix_length=0, transpositions=True,
        ).collect()
    ]
    assert via_dsl == direct and via_dsl

    # match + fuzzy_transpositions: the transposed term reaches the bool
    # engine's fuzzy clause (prefix_length defaults to 1 there, so use an
    # in-place swap past the first char: 'straem' -> 'stream')
    via_match = search(spark, tr_index, {
        "query": {"match": {"content": {
            "query": "straem", "fuzziness": 1, "fuzzy_transpositions": True,
        }}},
        "size": 10,
    }).collect()
    assert [r["docid"] for r in via_match] == [
        r["docid"] for r in topk(spark, tr_index, "stream", k=10).collect()
    ]
    without = search(spark, tr_index, {
        "query": {"match": {"content": {"query": "straem", "fuzziness": 1}}},
        "size": 10,
    }).collect()
    assert without == []
