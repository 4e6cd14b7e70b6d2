"""Analysis chains (tokenizers) as vectorized pandas operations.

The reference defines its analysis as an Elasticsearch analyzer spec
(reference: stacmodel/src/main/resources/schema/portal_records_index_schema.json:2-78):

- plain ``text`` fields use the ES ``standard`` analyzer (word break + lowercase) and
  are BM25-scored — our ``standard`` chain reproduces that for natural-language text;
- ``shingle_analyser`` (schema :15-32) produces 2-4-gram suggestion phrases after a
  filter chain (html strip, lowercase, number/uuid/non-alpha removal, stop words,
  min-length 2, token cap 350) — our ``shingle`` chain mirrors that behaviorally;
- the graft target is source code (BASELINE.json:input_hint), so the primary chain is
  ``code``: identifier extraction + camelCase/snake_case sub-token splits +
  lang-tagged terms, per BASELINE.json:north_star.

All chains are implemented as pandas ``Series -> Series[list[str]]`` transforms and
wrapped in Arrow-batched ``pandas_udf``s — no per-row Python UDFs in the hot path
(pinned by BASELINE.json:input_hint).

The ``standard`` chain is intentionally expressible in ANSI SQL
(``string_split_regex(lower(text), '[^a-z0-9]+')`` minus empties) so the DuckDB
correctness oracle can replay it exactly.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# English stop words: the ES `_english_` stop set (public Lucene constant), used by the
# reference's english_stop filter (portal_records_index_schema.json:34-37).
ENGLISH_STOP = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such that
the their then there these they this to was will with""".split()
)

_STANDARD_RE = re.compile(r"[a-z0-9]+")
# camelCase boundaries: lower/digit->Upper, and ABBRWord -> ABBR Word
_CAMEL1_RE = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL2_RE = re.compile(r"([A-Z]+)([A-Z][a-z])")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_SUB_RE = re.compile(r"[a-z0-9]+")
_ALL_DIGITS_RE = re.compile(r"^[0-9]+$")
_HTML_RE = re.compile(r"<[^>]+>")
_UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
)
_NON_STANDARD_RE = re.compile(r"[^a-z\- ]")

SHINGLE_TOKEN_LIMIT = 350  # reference token_limit (schema :65-68)
SHINGLE_MIN_LEN = 2  # reference length_filter min 2 (schema :69-72)


def standard_tokenize_series(texts: pd.Series) -> pd.Series:
    """ES-standard-analyzer analog: lowercase + alnum word break.

    Equivalent SQL (the DuckDB oracle uses exactly this):
    ``unnest(string_split_regex(lower(text), '[^a-z0-9]+'))`` filtered non-empty.
    """
    return texts.fillna("").str.lower().str.findall(_STANDARD_RE)


def _ident_tokens(ident: str) -> list[str]:
    """Terms emitted for one identifier: camelCase/snake_case sub-tokens
    (lowercased, min length 2, pure-number dropped) plus the whole lowercased
    identifier when it differs from its single sub-token."""
    low = ident.lower().strip("_")
    split = _CAMEL2_RE.sub(r"\1 \2", ident)
    split = _CAMEL1_RE.sub(r"\1 \2", split)
    subs = [
        t
        for t in _SUB_RE.findall(split.lower())
        if len(t) >= 2 and not _ALL_DIGITS_RE.match(t)
    ]
    if (low and len(subs) != 1 or (subs and subs[0] != low)) and (
        len(low) >= 2 and not _ALL_DIGITS_RE.match(low)
    ):
        return subs + [low]
    return subs


def code_tokenize_series(texts: pd.Series, langs: pd.Series | None = None) -> pd.Series:
    """Code-aware chain (BASELINE.json:north_star).

    Per document emits:
    - every identifier sub-token (camelCase / snake_case split, lowercased,
      pure-number tokens dropped, min length 2);
    - the whole identifier lowercased when it differs from its single sub-token
      (so both ``getUserName`` and ``get``/``user``/``name`` match);
    - one ``lang:<lang>`` marker term when a language column is supplied
      (the "lang-tagged terms" of the north_star; lets queries filter by language).

    The camel/snake regex splitting is memoized per UNIQUE identifier within
    each Arrow batch: source code has a small identifier vocabulary relative to
    occurrence count, so the per-occurrence work collapses to a dict lookup +
    list extend (~4x tokenizer throughput on code-shaped corpora; output
    identical to the unmemoized chain by construction).
    """
    from itertools import chain

    s = texts.fillna("")
    out: list[list[str]] = []
    lang_vals = langs.fillna("").tolist() if langs is not None else None
    cache: dict[str, list[str]] = {}
    lookup = cache.__getitem__
    for i, text in enumerate(s.tolist()):
        idents = _IDENT_RE.findall(text)
        for ident in idents:
            if ident not in cache:
                cache[ident] = _ident_tokens(ident)
        toks = list(chain.from_iterable(map(lookup, idents)))
        if lang_vals is not None and lang_vals[i]:
            toks.append(f"lang:{lang_vals[i].lower()}")
        out.append(toks)
    return pd.Series(out, index=texts.index, dtype=object)


def shingle_series(texts: pd.Series) -> pd.Series:
    """Suggestion-phrase chain, behavioral analog of the reference's
    ``shingle_analyser`` (portal_records_index_schema.json:15-32):

    html_strip -> lowercase (asciifold approximated by ascii filter) -> drop numbers
    -> drop uuids -> drop tokens with chars outside [a-z- ] -> drop stop words
    -> min length 2 -> cap 350 tokens -> 2-4-gram shingles + unigrams -> unique.
    """
    out: list[list[str]] = []
    for text in texts.fillna("").tolist():
        text = _HTML_RE.sub(" ", text).lower()
        toks = []
        for t in re.findall(r"[a-z0-9\-]+", text):
            if _ALL_DIGITS_RE.match(t) or _UUID_RE.match(t):
                continue
            if _NON_STANDARD_RE.search(t):
                continue
            if t in ENGLISH_STOP or t in ("et", "al"):
                continue
            if len(t) < SHINGLE_MIN_LEN:
                continue
            toks.append(t)
            if len(toks) >= SHINGLE_TOKEN_LIMIT:
                break
        seen: dict[str, None] = {}
        for n in (1, 2, 3, 4):
            for j in range(len(toks) - n + 1):
                seen.setdefault(" ".join(toks[j : j + n]), None)
        out.append(list(seen.keys()))
    return pd.Series(out, index=texts.index, dtype=object)


def tokenize_one(text: str, tokenizer: str = "standard", lang: str | None = None) -> list[str]:
    """Driver-side single-string tokenization (query parsing shares the exact
    document analysis chain, as the reference does via ES `_analyze`:
    indexer/.../IndexerMetadataServiceImpl.java:172-195)."""
    s = pd.Series([text])
    if tokenizer == "standard":
        return list(standard_tokenize_series(s).iloc[0])
    if tokenizer == "code":
        langs = pd.Series([lang]) if lang else None
        return list(code_tokenize_series(s, langs).iloc[0])
    raise ValueError(f"unknown tokenizer: {tokenizer}")


def split_lang_marker(tokens: list[str]) -> tuple[list[str], str | None]:
    """Separate the trailing ``lang:<x>`` marker the code chain appends from
    the positional tokens. Positional queries (phrase, match_phrase_prefix)
    must NOT treat the marker as a chain element — in documents it sits at
    the very end of the token stream, so requiring it at a phrase position
    silently matches nothing. Callers use the marker as a required FILTER
    term instead (the lang-filter semantics it exists for)."""
    if tokens and tokens[-1].startswith("lang:"):
        return tokens[:-1], tokens[-1]
    return tokens, None


def term_stats_frame(tok_lists: pd.Series, with_positions: bool) -> pd.DataFrame:
    """Per-doc term statistics, computed map-side (no shuffle needed downstream):
    parallel primitive arrays (Arrow-friendly) instead of per-token rows.

    Columns: ``terms`` (sorted unique), ``tfs``, ``starts`` (offset of each
    term's positions in ``flat_pos``), ``flat_pos`` (token positions grouped by
    term, ascending within term), ``doc_len`` (total token count).

    The per-doc work is np.unique + stable argsort — C-speed; the python loop is
    per *document*, never per token (input_hint: no per-row Python applies to
    rows=tokens hot path; Arrow batches carry ~10k docs at a time).
    """
    import numpy as np

    terms_c: list = []
    tfs_c: list = []
    starts_c: list = []
    pos_c: list = []
    len_c: list = []
    empty32 = np.empty(0, dtype=np.int32)
    for tl in tok_lists.tolist():
        n = len(tl)
        len_c.append(n)
        if n == 0:
            terms_c.append([])
            tfs_c.append(empty32)
            starts_c.append(empty32)
            pos_c.append(empty32)
            continue
        arr = np.asarray(tl, dtype=object)
        if with_positions:
            vals, inv, counts = np.unique(arr, return_inverse=True, return_counts=True)
            # stable argsort of the inverse groups token positions by term,
            # ascending within each term
            pos_c.append(np.argsort(inv, kind="stable").astype(np.int32))
            starts_c.append((np.cumsum(counts) - counts).astype(np.int32))
        else:
            vals, counts = np.unique(arr, return_counts=True)
            starts_c.append(empty32)
            pos_c.append(empty32)
        terms_c.append(vals.tolist())
        tfs_c.append(counts.astype(np.int32))
    return pd.DataFrame(
        {
            "terms": terms_c,
            "tfs": tfs_c,
            "starts": starts_c,
            "flat_pos": pos_c,
            "doc_len": len_c,
        },
        index=tok_lists.index,
    )


TERM_STATS_SCHEMA = (
    "terms: array<string>, tfs: array<int>, starts: array<int>, "
    "flat_pos: array<int>, doc_len: int"
)


def get_term_stats_udf(name: str, with_positions: bool = False):
    """Tokenize + per-doc term-stat UDF for the named chain (builder hot path)."""
    if name == "standard":

        @pandas_udf(TERM_STATS_SCHEMA)
        def standard_stats(texts: pd.Series) -> pd.DataFrame:
            return term_stats_frame(standard_tokenize_series(texts), with_positions)

        return standard_stats
    if name == "code":

        @pandas_udf(TERM_STATS_SCHEMA)
        def code_stats(texts: pd.Series, langs: pd.Series) -> pd.DataFrame:
            return term_stats_frame(code_tokenize_series(texts, langs), with_positions)

        return code_stats
    raise ValueError(f"unknown tokenizer: {name}")


@pandas_udf(ArrayType(StringType()))
def standard_tokenizer_udf(texts: pd.Series) -> pd.Series:
    return standard_tokenize_series(texts)


@pandas_udf(ArrayType(StringType()))
def code_tokenizer_udf(texts: pd.Series, langs: pd.Series) -> pd.Series:
    return code_tokenize_series(texts, langs)


@pandas_udf(ArrayType(StringType()))
def shingle_udf(texts: pd.Series) -> pd.Series:
    return shingle_series(texts)


def get_tokenizer_udf(name: str):
    """Resolve a tokenizer chain name to its pandas UDF."""
    if name == "standard":
        return standard_tokenizer_udf
    if name == "code":
        return code_tokenizer_udf
    if name == "shingle":
        return shingle_udf
    raise ValueError(f"unknown tokenizer: {name}")
