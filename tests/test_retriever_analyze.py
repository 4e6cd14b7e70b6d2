"""Round 5i: the ES 8.14 ``retriever`` tree, ``track_total_hits``, and the
``_analyze`` endpoint with offsets.

Retriever semantics are pinned by IDENTITY to the engine calls they compose
(a standard retriever ≡ its plain query body; rrf over [standard, knn] ≡ the
fixed-pair ``rrf_topk``); ``_analyze`` is pinned by token-stream identity to
``tokenize_one`` plus the slice-equality offsets invariant
(``text[start:end].lower() == token``), fuzzed.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.analysis.analyze import analyze, analyze_offsets, analyze_text
from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl import search

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def r_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_retr"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id", meta_cols=("lang", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2, store_positions=True,
    )
    return root


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


# ---- retriever tree ---------------------------------------------------------


def test_standard_retriever_equals_plain_query(spark, r_index):
    a = search(spark, r_index, {
        "retriever": {"standard": {"query": {"match": {"text": "data stream"}}}},
        "size": 7,
    })
    b = search(spark, r_index, {"query": {"match": {"text": "data stream"}}, "size": 7})
    assert _rows(a, "docid", "score") == _rows(b, "docid", "score")


def test_standard_retriever_filter_is_bool_filter_context(spark, r_index):
    a = search(spark, r_index, {
        "retriever": {"standard": {
            "query": {"match": {"text": "data stream"}},
            "filter": [{"term": {"lang": "en"}}],
        }}, "size": 10,
    })
    b = search(spark, r_index, {"query": {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"lang": "en"}}],
    }}, "size": 10})
    assert _rows(a, "docid", "score") == _rows(b, "docid", "score") and a.count()


def test_rrf_retriever_equals_rrf_topk(spark, r_index, emb):
    from es_indexer_spark.ops.similarity import rrf_topk

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    body = {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "data stream"}}}},
        {"knn": {"field": "embedding", "query_vector": qvec,
                 "k": 50, "num_candidates": 50}},
    ], "rank_constant": 60, "rank_window_size": 50}}, "size": 10}
    got = _rows(search(spark, r_index, body, emb_df=emb), "docid", "score")
    want = _rows(
        rrf_topk(spark, r_index, "data stream", emb, "vec_id", "embedding",
                 qvec, k=10, rank_constant=60, rank_window_size=50),
        "docid", "score",
    )
    assert got == want and len(got) == 10


def test_rrf_three_legs_fused_score(spark, r_index):
    """rrf generalizes past the fixed BM25+knn pair: three standard legs;
    the winner's fused score is Σ over legs of 1/(60+rank_leg)."""
    legs = [{"standard": {"query": {"match": {"text": t}}}}
            for t in ("data stream", "customer order", "spark")]
    flat = search(spark, r_index, {
        "retriever": {"rrf": {"retrievers": legs, "rank_window_size": 20}},
        "size": 10,
    })
    assert flat.count() == 10
    top = flat.collect()[0]
    # recompute the winner's fused score from the three legs directly
    expect = 0.0
    for leg in legs:
        hits = _rows(search(spark, r_index, {**leg["standard"], "size": 20}),
                     "docid")
        ranked = [d for (d,) in hits]
        if top["docid"] in ranked:
            expect += 1.0 / (60 + ranked.index(top["docid"]) + 1)
    assert top["score"] == round(expect, 8)


def test_retriever_mixing_and_unknown_raise(spark, r_index):
    with pytest.raises(ValueError, match="cannot be combined"):
        search(spark, r_index, {
            "retriever": {"standard": {"query": {"match": {"text": "x"}}}},
            "query": {"match": {"text": "x"}},
        })
    with pytest.raises(ValueError, match="unsupported retriever"):
        search(spark, r_index, {"retriever": {"bm42": {}}})
    with pytest.raises(NotImplementedError, match="text_similarity_reranker"):
        search(spark, r_index, {"retriever": {"text_similarity_reranker": {}}})
    with pytest.raises(ValueError, match="non-empty retrievers"):
        search(spark, r_index, {"retriever": {"rrf": {"retrievers": []}}})


# ---- track_total_hits -------------------------------------------------------


def test_track_total_hits_exact_and_bounded(spark, r_index, documents):
    base = {"query": {"match": {"text": "data stream"}}, "size": 3}
    plain = search(spark, r_index, base)
    assert "total_value" not in plain.columns  # opt-in, no schema change
    exact = search(spark, r_index, {**base, "track_total_hits": True}).collect()
    # ES total = the FULL match set (docs containing >= 1 query term)
    want = (
        documents.select(
            "doc_id",
            F.split(F.lower("text"), "[^a-z0-9]+").alias("t"),
        )
        .filter(
            F.arrays_overlap("t", F.array(F.lit("data"), F.lit("stream")))
        )
        .count()
    )
    assert len(exact) == 3
    assert all(r["total_value"] == want and r["total_relation"] == "eq"
               for r in exact)
    bounded = search(
        spark, r_index, {**base, "track_total_hits": 5}
    ).collect()
    assert all(r["total_value"] == 5 and r["total_relation"] == "gte"
               for r in bounded)
    under = search(
        spark, r_index, {**base, "track_total_hits": want + 100}
    ).collect()
    assert all(r["total_value"] == want and r["total_relation"] == "eq"
               for r in under)


# ---- _analyze ---------------------------------------------------------------


def test_analyze_endpoint_shape(spark):
    rows = analyze(spark, "Spark Joins 42", "standard").collect()
    assert [(r["token"], r["start_offset"], r["end_offset"], r["position"],
             r["type"]) for r in rows] == [
        ("spark", 0, 5, 0, "<ALPHANUM>"),
        ("joins", 6, 11, 1, "<ALPHANUM>"),
        ("42", 12, 14, 2, "<NUM>"),
    ]
    assert analyze(spark, "", "standard").count() == 0


def test_analyze_code_chain_offsets(spark):
    rows = analyze_text("getUserName __init__ a1", "code", lang="py")
    assert [r["token"] for r in rows] == tokenize_one(
        "getUserName __init__ a1", "code", lang="py"
    )
    src = "getUserName __init__ a1"
    for r in rows:
        if r["type"] == "lang_marker":
            assert (r["token"], r["start_offset"], r["end_offset"]) == (
                "lang:py", 0, 0)
        else:
            assert src[r["start_offset"]:r["end_offset"]].lower() == r["token"]
    # whole-identifier token spans the identifier minus stripped underscores
    whole = next(r for r in rows if r["token"] == "getusername")
    assert (whole["start_offset"], whole["end_offset"]) == (0, 11)
    init = next(r for r in rows if r["token"] == "init")
    assert src[init["start_offset"]:init["end_offset"]] == "init"


def test_analyze_fuzz_matches_tokenizer_and_slices():
    rng = random.Random(11)
    chars = "abXY_01 .-("
    for _ in range(1500):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 40)))
        for chain in ("standard", "code"):
            toks = analyze_text(s, chain)
            assert [t["token"] for t in toks] == tokenize_one(s, chain), (s, chain)
            assert [t["position"] for t in toks] == list(range(len(toks)))
            for t in toks:
                assert s[t["start_offset"]:t["end_offset"]].lower() == t["token"]


def test_analyze_offsets_distributed_matches_driver(spark, documents):
    sample = documents.orderBy("doc_id").limit(3)
    got = analyze_offsets(sample, "doc_id", "text").collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["id"], []).append(r)
    for row in sample.collect():
        want = analyze_text(row["text"], "standard")
        have = sorted(by_doc.get(row["doc_id"], []), key=lambda r: r["position"])
        assert [(r["token"], r["start_offset"], r["end_offset"], r["position"])
                for r in have] == [
            (t["token"], t["start_offset"], t["end_offset"], t["position"])
            for t in want
        ]


def test_analyze_unknown_and_shingle_raise(spark):
    with pytest.raises(NotImplementedError, match="shingle"):
        analyze_text("x", "shingle")
    with pytest.raises(ValueError, match="unknown tokenizer"):
        analyze_text("x", "nope")


# ---- _terms_enum ------------------------------------------------------------


def test_terms_enum_text_lexicographic_and_paged(spark, r_index, documents):
    from es_indexer_spark.query.lookup import terms_enum

    want = sorted(
        r["term"]
        for r in documents.select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term")
        ).filter("term LIKE 'st%'").distinct().collect()
    )
    page1 = [r["term"] for r in
             terms_enum(spark, r_index, "text", "st", size=5).collect()]
    assert page1 == want[:5]
    page2 = [r["term"] for r in
             terms_enum(spark, r_index, "text", "st", size=5,
                        search_after=page1[-1]).collect()]
    assert page2 == want[5:10]


def test_terms_enum_meta_distinct_and_ci(spark, r_index, documents):
    from es_indexer_spark.query.lookup import terms_enum

    want = sorted(
        r["lang"] for r in documents.select("lang").distinct().collect()
        if r["lang"] is not None
    )
    got = [r["term"] for r in
           terms_enum(spark, r_index, "lang", "", size=100).collect()]
    assert got == want
    # case_insensitive prefix matches the lowercase stored values
    lo = [r["term"] for r in
          terms_enum(spark, r_index, "lang", want[0].upper(), size=10,
                     case_insensitive=True).collect()]
    assert want[0] in lo
    assert terms_enum(spark, r_index, "lang", want[0].upper(),
                      size=10).count() == 0


# ---- batched _explain / body explain=true -----------------------------------


def test_explain_many_matches_single_and_topk(spark, r_index):
    from es_indexer_spark.query.engine import explain, explain_many, topk

    hits = topk(spark, r_index, "data stream", k=8).collect()
    ids = [r["docid"] for r in hits]
    em = explain_many(spark, r_index, "data stream", ids).collect()
    cols = ("term", "tf", "df", "doc_len", "idf", "contribution")
    one = explain(spark, r_index, "data stream", ids[0]).collect()
    assert [tuple(r[c] for c in cols) for r in em if r["docid"] == ids[0]] == [
        tuple(r[c] for c in cols) for r in one
    ]
    sums: dict[int, float] = {}
    for r in em:
        sums[r["docid"]] = sums.get(r["docid"], 0.0) + r["contribution"]
    for h in hits:
        assert abs(sums[h["docid"]] - h["score"]) < 1e-9


def test_explain_many_dead_and_absent(spark, r_index):
    from es_indexer_spark.query.engine import explain_many

    assert explain_many(spark, r_index, "data stream", [10**9]).count() == 0
    assert explain_many(spark, r_index, "zzzznotaterm", [1]).count() == 0


def test_search_body_explain_flag(spark, r_index):
    import json as _json

    from es_indexer_spark.query.engine import topk

    res = search(spark, r_index, {
        "query": {"match": {"text": "data stream"}}, "size": 5,
        "explain": True,
    }).collect()
    want = topk(spark, r_index, "data stream", k=5).collect()
    assert [r["docid"] for r in res] == [r["docid"] for r in want]  # order kept
    for r in res:
        parts = _json.loads(r["explanation"])
        assert [p["term"] for p in parts] == sorted(p["term"] for p in parts)
        assert abs(sum(p["contribution"] for p in parts) - r["score"]) < 1e-9
    with pytest.raises(ValueError, match="explain supports a match"):
        search(spark, r_index, {
            "query": {"term": {"lang": "en"}}, "explain": True,
        })


# ---- completion-suggester contexts -------------------------------------------


@pytest.fixture(scope="module")
def ctx_artifact(spark, documents, r_index):
    from es_indexer_spark.query.suggest import build_completion_contexts

    return build_completion_contexts(
        spark, documents, r_index, content_col="text", context_col="lang"
    )


def test_suggest_ctx_matches_brute_filter(spark, r_index, documents, ctx_artifact):
    from es_indexer_spark.query.suggest import suggest_prefix_ctx

    got = [(r["term"], r["df"], r["cf"]) for r in
           suggest_prefix_ctx(spark, r_index, "st", "lang", ["en"], k=5).collect()]
    brute = (
        documents.filter("lang = 'en'")
        .select("doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"))
        .filter("term LIKE 'st%' AND term <> ''")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term")).limit(5).collect()
    )
    assert got == [(r["term"], r["df"], r["cf"]) for r in brute] and got


def test_suggest_ctx_dsl_dispatch_and_errors(spark, r_index, ctx_artifact):
    from es_indexer_spark.query.dsl import suggest as dsl_suggest
    from es_indexer_spark.query.suggest import suggest_prefix_ctx

    body = {"suggest": {"c": {"prefix": "st", "completion": {
        "contexts": {"lang": ["en", {"context": "fr"}]}, "size": 4}}}}
    got = [r["term"] for r in dsl_suggest(spark, r_index, body)["c"].collect()]
    want = [r["term"] for r in
            suggest_prefix_ctx(spark, r_index, "st", "lang", ["en", "fr"], k=4).collect()]
    assert got == want and got
    with pytest.raises(ValueError, match="contexts \\+ fuzzy"):
        dsl_suggest(spark, r_index, {"suggest": {"c": {
            "prefix": "st",
            "completion": {"contexts": {"lang": ["en"]}, "fuzzy": {}},
        }}})
    with pytest.raises(FileNotFoundError, match="completion-context"):
        suggest_prefix_ctx(spark, r_index, "st", "source", ["x"])


# ---- ES SQL (_sql) ------------------------------------------------------------


def test_sql_translate_shapes():
    from es_indexer_spark.query.essql import translate_sql

    b = translate_sql(
        "SELECT lang, SCORE() FROM idx WHERE MATCH(text, 'data stream') "
        "AND lang = 'en' AND n_chars >= 200 ORDER BY SCORE() DESC LIMIT 5"
    )
    assert b["query"] == {"bool": {
        "must": [{"match": {"text": "data stream"}}],
        "filter": [{"term": {"lang": {"value": "en"}}},
                   {"range": {"n_chars": {"gte": 200}}}],
    }}
    assert b["size"] == 5 and "sort" not in b and b["fields"] == ["lang"]
    b2 = translate_sql("SELECT * FROM idx WHERE lang IN ('en','fr') "
                       "AND source IS NOT NULL AND lang != 'de' "
                       "ORDER BY n_chars DESC, docid LIMIT 3")
    assert {"script": {"script": {"source": "NOT (`lang` = 'de')"}}} \
        in b2["query"]["bool"]["filter"]
    assert b2["sort"] == [{"n_chars": {"order": "desc"}},
                          {"docid": {"order": "asc"}}]
    assert b2["_source"] is True
    assert translate_sql("SELECT lang FROM idx")["query"] == {"match_all": {}}
    for bad, msg in [
        ("SELECT * FROM idx WHERE MATCH(text, 3)", "string literal"),
        ("SELECT * FROM idx LIMIT 5 x", "trailing"),
        ("SELECT * FROM idx ORDER BY SCORE() ASC", "ASC is not lowered"),
        ("SELECT * FROM idx WHERE a LIKE 'x*'", "literal [*] or [?]"),
        ("SELECT lang, COUNT(*) FROM idx GROUP BY lang HAVING SUM(n) > 2",
         "must also appear in the SELECT"),
    ]:
        with pytest.raises(ValueError, match=msg):
            translate_sql(bad)


def test_sql_translate_boolean_grammar():
    from es_indexer_spark.query.essql import translate_sql

    # OR of field predicates → ONE pushed script filter (SQL three-valued
    # semantics, single docs scan — never a composed bool)
    b = translate_sql("SELECT * FROM idx WHERE lang = 'en' OR lang = 'fr'")
    (node,) = b["query"]["bool"]["filter"]
    assert node == {"script": {"script": {
        "source": "(`lang` = 'en' OR `lang` = 'fr')"}}}
    # LIKE → wildcard filter; BETWEEN → closed range; NOT x → script filter
    b = translate_sql(
        "SELECT * FROM idx WHERE source LIKE 'a%b_c' "
        "AND n_chars BETWEEN 10 AND 99 AND NOT lang = 'de'"
    )
    f = b["query"]["bool"]["filter"]
    assert {"wildcard": {"source": {"value": "a*b?c"}}} in f
    assert {"range": {"n_chars": {"gte": 10, "lte": 99}}} in f
    assert {"script": {"script": {"source": "NOT (`lang` = 'de')"}}} in f
    assert "must_not" not in b["query"]["bool"]
    # scoring OR (MATCH on a side): a single top-level clause unwraps to the
    # should-bool itself; with another conjunct it lands in must, not filter
    b = translate_sql(
        "SELECT * FROM idx WHERE MATCH(text, 'data') OR lang = 'fr'"
    )
    kinds = [next(iter(c)) for c in b["query"]["bool"]["should"]]
    assert kinds == ["match", "bool"]
    assert b["query"]["bool"]["minimum_should_match"] == 1
    b = translate_sql(
        "SELECT * FROM idx WHERE n_chars > 0 AND "
        "(MATCH(text, 'data') OR lang = 'fr')"
    )
    (node,) = b["query"]["bool"]["must"]
    assert [next(iter(c)) for c in node["bool"]["should"]] == ["match", "bool"]
    # NOT over a parenthesized conjunction → one negated script filter
    b = translate_sql(
        "SELECT * FROM idx WHERE lang = 'en' AND NOT (source = 'x' AND n_chars > 5)"
    )
    f = b["query"]["bool"]["filter"]
    assert {"script": {"script": {
        "source": "NOT ((`source` = 'x' AND `n_chars` > 5))"}}} in f
    # NOT IN / NOT BETWEEN / NOT LIKE negate their positive SQL forms
    b = translate_sql(
        "SELECT * FROM idx WHERE lang NOT IN ('de','es') "
        "AND n_chars NOT BETWEEN 1 AND 5 AND source NOT LIKE 'tmp%'"
    )
    srcs = [c["script"]["script"]["source"]
            for c in b["query"]["bool"]["filter"]]
    assert srcs == [
        "NOT (`lang` IN ('de', 'es'))",
        "NOT ((`n_chars` >= 1 AND `n_chars` <= 5))",
        "NOT (`source` LIKE 'tmp%')",
    ]
    # NOT over a scoring MATCH stays the analyzed-term must_not
    b = translate_sql(
        "SELECT * FROM idx WHERE lang = 'en' AND NOT MATCH(text, 'spam')"
    )
    assert b["query"]["bool"]["must_not"] == [{"match": {"text": "spam"}}]


def test_sql_query_matches_engine(spark, r_index):
    from es_indexer_spark.query.engine import topk
    from es_indexer_spark.query.essql import sql_query

    got = sql_query(
        spark, r_index,
        "SELECT lang, SCORE() FROM idx WHERE MATCH(text, 'data stream') "
        "ORDER BY SCORE() DESC LIMIT 5",
    ).collect()
    want = topk(spark, r_index, "data stream", k=5).collect()
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]
    assert all(r["lang"] is not None for r in got)
    filt = sql_query(
        spark, r_index,
        "SELECT * FROM idx WHERE MATCH(text, 'data stream') AND lang = 'fr' "
        "LIMIT 4",
    ).collect()
    assert filt and all(r["lang"] == "fr" for r in filt)
    assert "score" not in filt[0].asDict()  # SCORE() not selected
    srt = sql_query(
        spark, r_index,
        "SELECT lang FROM idx WHERE lang IN ('en','fr') ORDER BY docid LIMIT 4",
    ).collect()
    assert [r["docid"] for r in srt] == sorted(r["docid"] for r in srt)
    assert all(r["lang"] in ("en", "fr") for r in srt)


def test_sql_group_by_and_count(spark, r_index, documents):
    from es_indexer_spark.query.essql import sql_query

    got = [(r["lang"], r["n"], r["a"]) for r in sql_query(
        spark, r_index,
        "SELECT lang, COUNT(*) AS n, AVG(n_chars) AS a FROM idx "
        "WHERE MATCH(text, 'data') GROUP BY lang ORDER BY n DESC, lang LIMIT 3",
    ).collect()]
    brute = (
        documents.select("doc_id", "lang", "n_chars",
                         F.split(F.lower("text"), "[^a-z0-9]+").alias("t"))
        .filter(F.array_contains("t", "data"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.round(F.avg("n_chars"), 6).alias("a"))
        .orderBy(F.desc("n"), F.asc("lang")).limit(3).collect()
    )
    assert got == [(r["lang"], r["n"], r["a"]) for r in brute] and got
    total = sql_query(
        spark, r_index,
        "SELECT COUNT(*) AS total FROM idx WHERE MATCH(text, 'data')",
    ).collect()
    assert total[0]["total"] == sum(
        r["n"] for r in documents.select(
            "lang", F.split(F.lower("text"), "[^a-z0-9]+").alias("t")
        ).filter(F.array_contains("t", "data"))
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    with pytest.raises(ValueError, match="GROUP BY"):
        sql_query(spark, r_index, "SELECT lang, AVG(n_chars) FROM idx")
    with pytest.raises(ValueError, match="neither grouped"):
        sql_query(spark, r_index,
                  "SELECT source, COUNT(*) FROM idx GROUP BY lang")


def test_sql_or_like_between_execution(spark, r_index, documents):
    from es_indexer_spark.query.essql import sql_query

    # OR of field predicates (composed filter-context disjunction)
    got = sorted(r["docid"] for r in sql_query(
        spark, r_index,
        "SELECT lang FROM idx WHERE lang = 'fr' OR n_chars > 900 "
        "ORDER BY docid LIMIT 10000",
    ).collect())
    want = sorted(
        r["doc_id"] for r in documents.filter(
            (F.col("lang") == "fr") | (F.col("n_chars") > 900)
        ).select("doc_id").collect()
    )
    # docids are key-ordered doc_id ranks — compare by count + lang check
    assert len(got) == len(want) and got
    # LIKE on a stored keyword column
    likes = sql_query(
        spark, r_index,
        "SELECT lang FROM idx WHERE lang LIKE 'e%' ORDER BY docid LIMIT 10000",
    ).collect()
    n_en = documents.filter(F.col("lang").startswith("e")).count()
    assert len(likes) == n_en and all(r["lang"].startswith("e") for r in likes)
    # BETWEEN is the closed range
    bw = sql_query(
        spark, r_index,
        "SELECT n_chars FROM idx WHERE n_chars BETWEEN 100 AND 200 "
        "ORDER BY docid LIMIT 10000",
    ).collect()
    n_bw = documents.filter(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 200)
    ).count()
    assert len(bw) == n_bw and all(100 <= r["n_chars"] <= 200 for r in bw)
    # scoring OR: MATCH side keeps its BM25 contribution
    sc = sql_query(
        spark, r_index,
        "SELECT lang, SCORE() FROM idx WHERE MATCH(text, 'data') OR lang = 'fr' "
        "ORDER BY SCORE() DESC LIMIT 5",
    ).collect()
    assert sc and sc[0]["score"] > 0.0


def test_sql_having_execution(spark, r_index, documents):
    import pytest as _pt

    from es_indexer_spark.query.essql import sql_query

    with _pt.raises(ValueError, match="must also appear in the SELECT"):
        sql_query(
            spark, r_index,
            "SELECT lang, COUNT(*) AS n FROM idx GROUP BY lang "
            "HAVING AVG(n_chars) > 0",
        )
    got = [(r["lang"], r["n"]) for r in sql_query(
        spark, r_index,
        "SELECT lang, COUNT(*) AS n FROM idx GROUP BY lang "
        "HAVING n > 2 ORDER BY lang LIMIT 50",
    ).collect()]
    brute = (
        documents.groupBy("lang").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 2).orderBy("lang").collect()
    )
    assert got == [(r["lang"], r["n"]) for r in brute] and got
    # HAVING COUNT(*) works without selecting the count
    got2 = [r["lang"] for r in sql_query(
        spark, r_index,
        "SELECT lang FROM idx GROUP BY lang HAVING COUNT(*) > 2 "
        "ORDER BY lang LIMIT 50",
    ).collect()]
    assert got2 == [r["lang"] for r in brute]
    # multi-column GROUP BY → multi_terms lowering
    got3 = [(r["lang"], r["n_chars"], r["n"]) for r in sql_query(
        spark, r_index,
        "SELECT lang, n_chars, COUNT(*) AS n FROM idx "
        "GROUP BY lang, n_chars ORDER BY n DESC, lang, n_chars LIMIT 5",
    ).collect()]
    brute3 = (
        documents.groupBy("lang", "n_chars").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"), F.asc("n_chars")).limit(5).collect()
    )
    assert got3 == [(r["lang"], r["n_chars"], r["n"]) for r in brute3] and got3


def test_sql_count_distinct_and_ungrouped_metrics(spark, r_index, documents):
    from es_indexer_spark.query.essql import sql_query

    row = sql_query(
        spark, r_index,
        "SELECT COUNT(DISTINCT lang) AS nl, AVG(n_chars) AS a, COUNT(*) AS n "
        "FROM idx WHERE n_chars > 100",
    ).collect()[0]
    sub = documents.filter(F.col("n_chars") > 100)
    assert row["nl"] == sub.select("lang").distinct().count()
    assert abs(row["a"] - round(sub.agg(F.avg("n_chars")).collect()[0][0], 6)) < 1e-9
    assert row["n"] == sub.count()
    # grouped COUNT(DISTINCT) is exact (cardinality with exact=True)
    got = [(r["lang"], r["ns"]) for r in sql_query(
        spark, r_index,
        "SELECT lang, COUNT(DISTINCT n_chars) AS ns FROM idx "
        "GROUP BY lang ORDER BY lang LIMIT 50",
    ).collect()]
    brute = (
        documents.groupBy("lang")
        .agg(F.count_distinct("n_chars").alias("ns"))
        .orderBy("lang").collect()
    )
    assert got == [(r["lang"], r["ns"]) for r in brute] and got
    with pytest.raises(ValueError, match="cannot mix in plain columns"):
        sql_query(spark, r_index, "SELECT lang, COUNT(DISTINCT n_chars) FROM idx")
