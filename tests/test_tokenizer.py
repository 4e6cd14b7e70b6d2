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
