"""Text-analysis operators for a training-data pipeline, as pure Column algebra.

Everything here stays JVM-side (whole-stage codegen, no Python at all) — the
deliberate contrast to the tokenizer UDFs: where semantics fit builtin
``pyspark.sql.functions``, we never leave the JVM.

Operators: language-ID (stopword-ratio heuristic), quality scoring
(length/stopword/punctuation ratios — the column-expression scoring pattern of the
reference's completeness ranker, indexer/.../RankingServiceImpl.java:18-169),
token counting (whitespace + alnum-regex), and a deterministic position-weighted
document fingerprint (rolling-hash style).

Each operator is mirrored 1:1 by an ANSI-SQL oracle in ``__spark_entry__.oracle_sql``
— the expressions are written to be bit-reproducible across Spark and DuckDB
(integer arithmetic, or doubles rounded at the boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# shared with the SQL oracles — keep in sync with __spark_entry__
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
FINGERPRINT_MOD = 1_000_000_007


def _alnum_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != "")


# GPT-2-style pre-tokenizer pattern, simplified to the lowercase alphabet and
# restricted to constructs BOTH Java regex (Spark) and RE2 (DuckDB) support
# (no lookaheads): contractions, letter runs, digit runs, symbol runs — each
# optionally space-prefixed — and whitespace runs (filtered out of the count).
BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_alnum_tokens, n_unique_tokens, n_bpe_tokens) —
    whitespace, alnum-regex, and BPE-ish-regex token counting (the last is the
    GPT-2 pre-tokenizer shape: what a byte-pair encoder would see as merge
    units before learned merges — the cheap JVM-side proxy for LLM token
    budgeting)."""
    text = F.col(text_col)
    toks = _alnum_tokens(text)
    ws = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))
    )
    bpe = F.size(
        F.filter(
            F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0),
            lambda x: F.trim(x) != "",
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_alnum_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


def stopword_ratio(text: Column) -> Column:
    toks = _alnum_tokens(text)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks).cast("double")
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: English-stopword ratio thresholding (the n-gram
    heuristic class of detector; extend with per-language stop sets as needed)."""
    ratio = stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias(
            "lang_guess"
        ),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/stopword/punctuation quality score in [0,1] — weighted-sum column
    expression (the reference's ranking-score pattern, RankingServiceImpl.java)."""
    text = F.col(text_col)
    toks = _alnum_tokens(text)
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / 100.0, F.lit(1.0))
    stop = stopword_ratio(text)
    stop_score = F.least(stop * 5.0, F.lit(1.0))  # saturates at 20% stopwords
    n_chars = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")).cast(
        "double"
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        (n_chars - n_alpha) / n_chars
    )
    score = 0.4 * len_score + 0.3 * stop_score + 0.3 * (1.0 - punct_ratio)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic position-weighted rolling-hash fingerprint:
    sum_i (i+1) * codepoint(text[i]) mod 1e9+7 — pure integer arithmetic, so it is
    exactly reproducible in any SQL engine. (At 100 TB this moves into the tokenizer
    pandas UDF batch; the column expression keeps it JVM-side here.)"""
    expr = F.expr(
        f"""aggregate(
              transform(sequence(1, length({text_col})),
                        i -> cast(i as bigint) * cast(ascii(substring({text_col}, i, 1)) as bigint)),
              cast(0 as bigint),
              (acc, x) -> (acc + x) % {FINGERPRINT_MOD}L
            )"""
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(expr, F.lit(0)).cast("long").alias("fingerprint"),
    )
