"""ES ``simple_query_string`` — the forgiving end-user query syntax, compiled
onto the bool engine.

Supported subset of the published simple_query_string grammar (the operators
ES documents for the simple syntax):

- bare words            -> ``should`` clauses (default operator OR);
- ``+word``             -> ``must`` clause;
- ``-word``             -> ``must_not`` clause;
- ``"quoted phrase"``   -> phrase in filter context (required consecutive
  tokens; like ES filter context it is non-scoring — documented divergence
  from ES, where a quoted phrase scores; only ONE quoted phrase per query);
- ``default_operator="and"`` -> bare words become ``must`` instead.

Unsupported simple-syntax operators (``|``/``&`` infix, ``~N`` fuzziness,
``*`` trailing wildcard, ``( )`` grouping) raise rather than silently
mis-parse — the forgiving part of the ES contract we keep is that malformed
input never crashes the engine, it just drops empty tokens.

The parse is a driver-side tokenize of a query STRING (bytes of user input,
never data), so there is nothing to distribute; all heavy lifting happens in
``bool_query``'s single-shuffle shard evaluation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_UNSUPPORTED = re.compile(r"[|&~*()]")
_PHRASE = re.compile(r'"([^"]*)"')


def parse_simple_query(
    query: str, default_operator: str = "or"
) -> dict[str, object]:
    """Split a simple_query_string into bool clauses. Returns a dict with
    ``must`` / ``should`` / ``must_not`` term-string lists and
    ``filter_phrase`` (or None)."""
    if _UNSUPPORTED.search(_PHRASE.sub("", query)):
        raise ValueError(
            "unsupported simple_query_string operator (supported: + - \"\" and bare terms)"
        )
    phrases = _PHRASE.findall(query)
    if len(phrases) > 1:
        raise ValueError("at most one quoted phrase is supported")
    rest = _PHRASE.sub(" ", query)
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    for tok in rest.split():
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:])
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:])
        elif tok not in ("+", "-"):
            (must if default_operator.lower() == "and" else should).append(tok)
    return {
        "must": must,
        "should": should,
        "must_not": must_not,
        "filter_phrase": phrases[0] if phrases and phrases[0].strip() else None,
    }


def simple_query_string(
    spark: SparkSession,
    index_root: str,
    query: str,
    k: int | None = 10,
    default_operator: str = "or",
    lang: str | None = None,
) -> DataFrame:
    """Parse ``query`` with :func:`parse_simple_query` and run it through
    :func:`es_indexer_spark.query.boolean.bool_query` — ranked (docid, score)
    under the same Lucene bool semantics as the structured DSL."""
    from es_indexer_spark.query.boolean import bool_query

    c = parse_simple_query(query, default_operator)
    return bool_query(
        spark,
        index_root,
        must=c["must"],
        should=c["should"],
        must_not=c["must_not"],
        filter_phrase=c["filter_phrase"],
        k=k,
        lang=lang,
    )
