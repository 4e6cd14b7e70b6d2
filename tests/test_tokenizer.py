"""Tokenizer chains: analogs of the reference's analyzer spec
(portal_records_index_schema.json:2-78; SURVEY.md §1.3)."""

from __future__ import annotations

import pandas as pd

from es_indexer_spark.analysis.tokenizer import (
    code_tokenize_series,
    shingle_series,
    standard_tokenize_series,
    tokenize_one,
)


def test_standard_basic():
    out = standard_tokenize_series(pd.Series(["Hello, World! x1 --", None, ""]))
    assert list(out.iloc[0]) == ["hello", "world", "x1"]
    assert list(out.iloc[1]) == []
    assert list(out.iloc[2]) == []


def test_standard_matches_sql_contract():
    # the DuckDB oracle uses string_split_regex(lower(text),'[^a-z0-9]+'):
    # same result modulo empty strings
    import re

    text = "The quick-brown FOX jumps 42 times!"
    expected = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    assert tokenize_one(text, "standard") == expected


def test_code_camel_snake_splits():
    out = code_tokenize_series(pd.Series(["def getUserName(user_id): return XMLParser"]))
    toks = set(out.iloc[0])
    # sub-tokens
    assert {"def", "get", "user", "name", "id", "xml", "parser", "return"} <= toks
    # whole identifiers preserved alongside their splits
    assert "getusername" in toks
    assert "user_id" in toks
    assert "xmlparser" in toks


def test_code_lang_tag_and_number_filter():
    out = code_tokenize_series(pd.Series(["x = 12345 + foo"]), pd.Series(["Python"]))
    toks = list(out.iloc[0])
    assert "lang:python" in toks
    assert "12345" not in toks  # pure numbers dropped (remove_numbers analog)
    assert "foo" in toks


def test_shingles_2_4_grams_and_filters():
    text = "<p>The Ocean Temperature Data 12345 collected by et al.</p>"
    out = set(shingle_series(pd.Series([text])).iloc[0])
    assert "ocean" in out
    assert "ocean temperature" in out
    assert "ocean temperature data" in out
    assert "ocean temperature data collected" in out
    # stop words, numbers, html are gone
    assert "the" not in out and "12345" not in out and "p" not in out
    assert "et" not in out and "al" not in out


# ---------------------------------------------------------------- term stats UDF core
def test_term_stats_frame_counts_and_positions():
    import numpy as np
    import pandas as pd

    from es_indexer_spark.analysis.tokenizer import term_stats_frame

    toks = pd.Series([["b", "a", "b", "c", "a", "b"], [], ["x"]])
    out = term_stats_frame(toks, with_positions=True)
    # doc 0: terms sorted unique, tfs match counts, doc_len = total tokens
    assert out.loc[0, "terms"] == ["a", "b", "c"]
    assert list(out.loc[0, "tfs"]) == [2, 3, 1]
    assert out.loc[0, "doc_len"] == 6
    # flat_pos grouped by term, ascending within term; starts index into it
    starts, flat = list(out.loc[0, "starts"]), list(out.loc[0, "flat_pos"])
    assert starts == [0, 2, 5]
    assert flat[0:2] == [1, 4]      # 'a' at positions 1, 4
    assert flat[2:5] == [0, 2, 5]   # 'b' at positions 0, 2, 5
    assert flat[5:6] == [3]         # 'c' at position 3
    # empty doc
    assert out.loc[1, "terms"] == [] and out.loc[1, "doc_len"] == 0
    # positions off → empty pos arrays, counts still present
    out2 = term_stats_frame(toks, with_positions=False)
    assert list(out2.loc[0, "tfs"]) == [2, 3, 1]
    assert len(out2.loc[0, "flat_pos"]) == 0


def test_term_stats_frame_random_roundtrip():
    import numpy as np
    import pandas as pd

    from es_indexer_spark.analysis.tokenizer import term_stats_frame

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(20)]
    docs = [
        [vocab[j] for j in rng.integers(0, 20, size=rng.integers(0, 50))]
        for _ in range(50)
    ]
    out = term_stats_frame(pd.Series(docs), with_positions=True)
    for i, d in enumerate(docs):
        terms = out.loc[i, "terms"]
        tfs = list(out.loc[i, "tfs"])
        starts = list(out.loc[i, "starts"])
        flat = list(out.loc[i, "flat_pos"])
        assert out.loc[i, "doc_len"] == len(d)
        assert sum(tfs) == len(d)
        for t, tf, s in zip(terms, tfs, starts):
            pos = flat[s : s + tf]
            assert pos == sorted(pos)
            assert [d[p] for p in pos] == [t] * tf
        assert sorted(terms) == sorted(set(d))
