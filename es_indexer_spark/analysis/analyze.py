"""ES ``_analyze`` API analog: tokens WITH offsets/positions/types.

The reference drives its analysis chains through ES ``_analyze`` (query
parsing reuses the document chain — indexer/.../IndexerMetadataServiceImpl.java:172-195);
ES's response carries ``token / start_offset / end_offset / position / type``
per token. The engine's chains (analysis/tokenizer.py) emit bare term lists —
this module re-runs the SAME chains tracking character spans, so
``[t["token"] for t in analyze_text(x, c)] == tokenize_one(x, c)`` exactly
(pinned by tests), and ``text[start:end].lower() == token`` for every
non-synthetic token (the offsets invariant, fuzz-pinned).

Chains: ``standard`` (alnum runs on the lowercased text — spans map 1:1
because lowercasing is length-preserving here) and ``code`` (identifier
camelCase/snake_case sub-tokens: the camel splits only INSERT spaces, so a
sub-token's span in the split string maps back by subtracting the inserted
spaces before it; the whole-identifier token spans the identifier minus its
stripped underscores; the ``lang:<x>`` marker is synthetic — offsets 0/0,
type ``lang_marker``). ``shingle`` raises: shingles are html-stripped
multi-token strings whose offsets have no single contiguous source span in
this engine's chain.

Scale: :func:`analyze` is the request-sized endpoint (one string, driver
side, like ES). :func:`analyze_offsets` is the distributed form — one
Arrow-batched pandas UDF producing an array-of-struct column, exploded
JVM-side; per-batch work is the same regex pass the tokenizer hot path runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.analysis.tokenizer import (
    _ALL_DIGITS_RE,
    _CAMEL1_RE,
    _CAMEL2_RE,
    _IDENT_RE,
    _STANDARD_RE,
    _SUB_RE,
    _ident_tokens,
)

_TOKEN_FIELDS = (
    "token string, start_offset int, end_offset int, position int, type string"
)
_TOKEN_STRUCT = (
    "token:string,start_offset:int,end_offset:int,position:int,type:string"
)


def _standard_tokens(text: str) -> list[tuple]:
    low = (text or "").lower()
    out = []
    for pos, m in enumerate(_STANDARD_RE.finditer(low)):
        tok = m.group(0)
        ttype = "<NUM>" if _ALL_DIGITS_RE.match(tok) else "<ALPHANUM>"
        out.append((tok, m.start(), m.end(), pos, ttype))
    return out


def _code_ident_spans(ident: str) -> list[tuple[str, int, int]]:
    """(sub_token, start, end) spans INSIDE one identifier, mirroring
    ``_ident_tokens`` emission order; the whole-identifier token (when that
    chain emits it) spans the identifier minus stripped underscores."""
    split = _CAMEL2_RE.sub(r"\1 \2", ident)
    split = _CAMEL1_RE.sub(r"\1 \2", split)
    low_split = split.lower()
    # split only inserts spaces: orig index = split index - #spaces before it
    spaces_before = [0] * (len(split) + 1)
    n = 0
    for i, ch in enumerate(split):
        spaces_before[i] = n
        if ch == " ":
            n += 1
    spaces_before[len(split)] = n
    spans = []
    for m in _SUB_RE.finditer(low_split):
        tok = m.group(0)
        if len(tok) < 2 or _ALL_DIGITS_RE.match(tok):
            continue
        spans.append(
            (tok, m.start() - spaces_before[m.start()],
             m.end() - spaces_before[m.end()])
        )
    emitted = _ident_tokens(ident)
    if len(emitted) == len(spans) + 1:
        # the chain appended the whole lowercased identifier (strip("_"))
        lead = len(ident) - len(ident.lstrip("_"))
        trail = len(ident) - len(ident.rstrip("_"))
        spans.append((emitted[-1], lead, len(ident) - trail))
    return spans


def _code_tokens(text: str, lang: str | None) -> list[tuple]:
    out = []
    pos = 0
    for m in _IDENT_RE.finditer(text or ""):
        a = m.start()
        for tok, s, e in _code_ident_spans(m.group(0)):
            out.append((tok, a + s, a + e, pos, "<IDENT>"))
            pos += 1
    if lang:
        out.append((f"lang:{lang.lower()}", 0, 0, pos, "lang_marker"))
    return out


def analyze_text(
    text: str, tokenizer: str = "standard", lang: str | None = None
) -> list[dict]:
    """Driver-side ``_analyze`` of one string: list of ES-shaped token dicts
    (``token/start_offset/end_offset/position/type``), token stream identical
    to :func:`~es_indexer_spark.analysis.tokenizer.tokenize_one`."""
    if tokenizer == "standard":
        rows = _standard_tokens(text)
    elif tokenizer == "code":
        rows = _code_tokens(text, lang)
    elif tokenizer == "shingle":
        raise NotImplementedError(
            "offsets for the shingle chain are undefined (html-strip + "
            "multi-token shingles) — use shingle_series for the terms"
        )
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")
    return [
        dict(zip(("token", "start_offset", "end_offset", "position", "type"), r))
        for r in rows
    ]


def analyze(
    spark: SparkSession,
    text: str,
    tokenizer: str = "standard",
    lang: str | None = None,
) -> DataFrame:
    """ES ``_analyze`` endpoint shape: one row per token of ``text``."""
    return spark.createDataFrame(
        analyze_text(text, tokenizer, lang) or [], _TOKEN_FIELDS
    )


def analyze_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer: str = "standard",
    lang_col: str | None = None,
) -> DataFrame:
    """Distributed ``_analyze`` over a corpus column: ``(id, token,
    start_offset, end_offset, position, type)``, one row per token — the
    offsets-bearing sibling of the index builder's term-stats UDF (same
    chains, same order)."""
    from pyspark.sql.functions import pandas_udf

    if tokenizer not in ("standard", "code"):
        # surface the same chain gate as analyze_text before launching a job
        analyze_text("", tokenizer)

    @pandas_udf(f"array<struct<{_TOKEN_STRUCT}>>")
    def _ana(texts: pd.Series, langs: pd.Series) -> pd.Series:
        lv = langs.tolist()
        return pd.Series(
            [
                _standard_tokens(t)
                if tokenizer == "standard"
                else _code_tokens(t, lv[i] or None)
                for i, t in enumerate(texts.fillna("").tolist())
            ],
            index=texts.index,
            dtype=object,
        )

    lang_expr = F.col(lang_col) if lang_col else F.lit(None).cast("string")
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_ana(F.col(text_col), lang_expr)).alias("t"),
        )
        .select("id", "t.*")
    )
