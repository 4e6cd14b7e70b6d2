"""ES SQL (x-pack ``POST /_sql``) subset: SQL text → a search request body.

ES ships a SQL front-end over the search API whose full-text power comes from
three SQL extensions — ``MATCH(field, 'text')``, ``QUERY('query string')``
and ``SCORE()`` (public x-pack SQL docs). This module implements the
``/_sql/translate`` step natively (:func:`translate_sql` — SQL → the exact
request body the DSL layer executes) and :func:`sql_query` which runs the
translated body through :func:`~es_indexer_spark.query.dsl.search`, so every
piece of the execution (block-max top-k, filter pushdown, sort path, fields
retrieval) is the already-verified engine — this layer holds NO matching
logic, exactly like the DSL layer.

Supported grammar (raise-by-name beyond it):

    SELECT  * | col[, col...] [, SCORE()] | col/aggs with GROUP BY
    FROM    ident                      -- informational (one index per call)
    [WHERE  expr]                      -- full boolean expressions
    [GROUP BY col[, col...] [HAVING hexpr]]
    [ORDER BY SCORE() [DESC] | col [ASC|DESC][, ...]]
    [LIMIT  n]

    expr  := expr OR expr | expr AND expr | NOT expr | ( expr ) | pred
    pred  := MATCH(col, 'text') | QUERY('query string')
          | col = lit | col != lit | col <> lit
          | col > lit | col >= lit | col < lit | col <= lit
          | col [NOT] IN (lit[, lit...])
          | col IS NULL | col IS NOT NULL
          | col [NOT] LIKE 'pat'       -- % / _ → ES wildcard * / ?
          | col [NOT] BETWEEN lo AND hi
    hexpr := AND/OR/NOT/parens over  aggref op lit  — aggref is a SELECT
             aggregate alias, FN(col) from the SELECT list, COUNT(*), or a
             grouped column

Lowering: MATCH/QUERY become scoring ``must`` clauses; positive field
predicates become typed bool ``filter`` leaves (``term``/``terms``/
``range``/``exists``/``wildcard``) pushed to the docs scan by the bool
engine. Negations and disjunctions of field predicates lower to ONE
``script`` filter — the whole subtree as a single Catalyst boolean
expression in the same pushed scan, with SQL three-valued semantics (NULL
never matches; the engine's ``must_not``-term leaf is a raw INDEX-term
exclusion and would diverge). Only disjunctions containing MATCH/QUERY
produce a nested ``{bool: {should, minimum_should_match: 1}}`` child,
routed through the compositional bool evaluator (each leaf still one
term-pruned scan, one hash-agg per level); ``NOT MATCH(...)`` stays the
analyzed-term ``must_not``. ``ORDER BY col`` routes through the
body ``sort`` path (full-match-set selection by the sort key, ES
semantics); ``ORDER BY SCORE() DESC`` (and no ORDER BY at all) is the
relevance top-k. ``SELECT cols`` becomes the body ``fields`` section
(stored-column fetch of the ≤k hits). ``GROUP BY`` lowers to a ``terms``
(one column) / ``multi_terms`` (several) aggregation; ``HAVING`` compiles
to one Catalyst predicate over the bucket frame — never a second pass."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?)
        |(?P<op><=|>=|!=|<>|=|<|>|\(|\)|,|\*)
        |(?P<word>[A-Za-z_][A-Za-z0-9_.]*))""",
    re.X,
)


def _tokens(sql: str) -> list[tuple[str, str]]:
    out, i = [], 0
    s = sql.strip().rstrip(";")
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"SQL parse error at: {s[i:i + 25]!r}")
        i = m.end()
        if m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "op":
            out.append(("op", m.group("op")))
        else:
            out.append(("word", m.group("word")))
    return out


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.t = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of SQL")
        self.i += 1
        return tok

    def kw(self, *words: str) -> bool:
        tok = self.peek()
        if tok and tok[0] == "word" and tok[1].upper() == words[0]:
            save = self.i
            for w in words:
                tok = self.peek()
                if not (tok and tok[0] == "word" and tok[1].upper() == w):
                    self.i = save
                    return False
                self.i += 1
            return True
        return False

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v.upper() != val.upper()):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v


def _lit(tok: tuple[str, str]):
    kind, v = tok
    if kind == "str":
        return v
    if kind == "num":
        return float(v) if "." in v else int(v)
    if kind == "word" and v.upper() in ("TRUE", "FALSE"):
        return v.upper() == "TRUE"
    raise ValueError(f"expected a literal, got {v!r}")


# ------------------------------------------------- WHERE expression grammar
# Precedence (loosest first): OR < AND < NOT < predicate/parens — standard
# SQL. The tree lowers onto ES bool JSON below; a pure conjunction keeps the
# exact flat (must/filter/must_not) body the one-scan engine evaluates, and
# only genuine disjunctions produce nested bools (which query/dsl.py routes
# to the compositional evaluator).

_RESERVED = {
    "AND", "OR", "NOT", "GROUP", "ORDER", "HAVING", "LIMIT", "BY",
    "IS", "IN", "LIKE", "BETWEEN", "NULL",
}


def _sql_like_to_wildcard(pat: str) -> str:
    """SQL LIKE pattern → ES wildcard pattern (``%``→``*``, ``_``→``?``).
    Literal ``*``/``?`` in the pattern cannot be represented (ES wildcard
    has no escape) — raise rather than silently change meaning."""
    if "*" in pat or "?" in pat:
        raise ValueError(
            "LIKE pattern contains a literal * or ? — not representable as "
            "an ES wildcard; use QUERY() for analyzed-content patterns"
        )
    return pat.replace("%", "*").replace("_", "?")


def _parse_pred(p: _P):
    """One predicate → tree node ``("leaf", qnode, scoring, sqlexpr)`` —
    ``sqlexpr`` is the equivalent Catalyst boolean expression over the
    stored columns (None for the scoring full-text predicates) — or
    ``("not", leaf)`` for the negative comparators (!=, IS NULL)."""
    tok = p.next()
    if tok[0] != "word":
        raise ValueError(f"bad WHERE clause at {tok[1]!r}")
    up = tok[1].upper()
    if up == "MATCH":
        p.expect("op", "(")
        fld = p.expect("word")
        p.expect("op", ",")
        txt = p.next()
        if txt[0] != "str":
            raise ValueError("MATCH needs a string literal")
        p.expect("op", ")")
        return ("leaf", {"match": {fld: txt[1]}}, True, None)
    if up == "QUERY":
        p.expect("op", "(")
        txt = p.next()
        if txt[0] != "str":
            raise ValueError("QUERY needs a string literal")
        p.expect("op", ")")
        return ("leaf", {"query_string": {"query": txt[1]}}, True, None)
    fld = tok[1]
    col = f"`{fld}`"
    neg = p.kw("NOT", "LIKE")
    if neg or p.kw("LIKE"):
        pat = p.next()
        if pat[0] != "str":
            raise ValueError("LIKE needs a string pattern")
        node = ("leaf",
                {"wildcard": {fld: {"value": _sql_like_to_wildcard(pat[1])}}},
                False, f"{col} LIKE {_sql_literal(pat[1])}")
        return ("not", node) if neg else node
    neg = p.kw("NOT", "BETWEEN")
    if neg or p.kw("BETWEEN"):
        lo = _lit(p.next())
        if not p.kw("AND"):
            raise ValueError("BETWEEN needs 'lo AND hi'")
        hi = _lit(p.next())
        node = ("leaf", {"range": {fld: {"gte": lo, "lte": hi}}}, False,
                f"({col} >= {_sql_literal(lo)} AND {col} <= {_sql_literal(hi)})")
        return ("not", node) if neg else node
    neg = p.kw("NOT", "IN")
    if neg or p.kw("IN"):
        p.expect("op", "(")
        vals = [_lit(p.next())]
        while p.peek() == ("op", ","):
            p.next()
            vals.append(_lit(p.next()))
        p.expect("op", ")")
        node = ("leaf", {"terms": {fld: vals}}, False,
                f"{col} IN ({', '.join(_sql_literal(v) for v in vals)})")
        return ("not", node) if neg else node
    if p.kw("IS", "NOT", "NULL"):
        return ("leaf", {"exists": {"field": fld}}, False,
                f"{col} IS NOT NULL")
    if p.kw("IS", "NULL"):
        return ("not", ("leaf", {"exists": {"field": fld}}, False,
                        f"{col} IS NOT NULL"))
    k, op = p.next()
    if k != "op" or op in ("(", ")", ",", "*"):
        raise ValueError(f"bad operator {op!r} after {fld!r}")
    val = _lit(p.next())
    if op == "=":
        return ("leaf", {"term": {fld: {"value": val}}}, False,
                f"{col} = {_sql_literal(val)}")
    if op in ("!=", "<>"):
        return ("not", ("leaf", {"term": {fld: {"value": val}}}, False,
                        f"{col} = {_sql_literal(val)}"))
    key = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[op]
    return ("leaf", {"range": {fld: {key: val}}}, False,
            f"{col} {op} {_sql_literal(val)}")


def _parse_not(p: _P):
    if p.kw("NOT"):
        return ("not", _parse_not(p))
    if p.peek() == ("op", "("):
        p.next()
        e = _parse_or(p)
        p.expect("op", ")")
        return e
    return _parse_pred(p)


def _parse_and(p: _P):
    items = [_parse_not(p)]
    while p.kw("AND"):
        items.append(_parse_not(p))
    return ("and", items) if len(items) > 1 else items[0]


def _parse_or(p: _P):
    items = [_parse_and(p)]
    while p.kw("OR"):
        items.append(_parse_and(p))
    return ("or", items) if len(items) > 1 else items[0]


def _tree_scoring(tree) -> bool:
    """Does any leaf under this node score (MATCH/QUERY)?"""
    kind = tree[0]
    if kind == "leaf":
        return tree[2]
    if kind == "not":
        return _tree_scoring(tree[1])
    return any(_tree_scoring(c) for c in tree[1])


def _tree_sql(tree) -> str | None:
    """The whole subtree as ONE Catalyst boolean expression over the stored
    columns — or None when any leaf is a scoring full-text predicate. This
    is the preferred lowering for disjunctions and negations of field
    predicates: one pushed docs-scan predicate with SQL three-valued
    semantics, instead of a composed bool evaluation."""
    kind = tree[0]
    if kind == "leaf":
        return tree[3]
    if kind == "not":
        inner = _tree_sql(tree[1])
        return None if inner is None else f"NOT ({inner})"
    parts = [_tree_sql(c) for c in tree[1]]
    if any(x is None for x in parts):
        return None
    joiner = " AND " if kind == "and" else " OR "
    return "(" + joiner.join(parts) + ")"


def _script_node(src: str) -> dict:
    return {"script": {"script": {"source": src}}}


def _lower_node(tree) -> dict:
    """Lower a subtree with SCORING leaves to ONE ES query node (used
    inside should lists and nested positions). Non-scoring leaves in
    scoring positions wrap as ``{bool: {filter: [leaf]}}`` so stored-field
    semantics survive the compositional evaluator's context rules;
    all-non-scoring subtrees never reach here (they become one script
    filter via :func:`_tree_sql`)."""
    kind = tree[0]
    if kind == "leaf":
        return tree[1]
    if kind == "not":
        sql = _tree_sql(tree[1])
        if sql is not None:
            return _script_node(f"NOT ({sql})")
        raise ValueError(
            "NOT over a full-text predicate inside a disjunction is not "
            "lowered — apply De Morgan and move the negation above the OR"
        )
    if kind == "and":
        musts, filts, nots = _lower_conjunction(tree[1])
        b: dict = {}
        if musts:
            b["must"] = musts
        if filts:
            b["filter"] = filts
        if nots:
            b["must_not"] = nots
        return {"bool": b}
    # or
    shoulds = []
    for c in tree[1]:
        sql = _tree_sql(c)
        if sql is not None:
            low = {"bool": {"filter": [_script_node(sql)]}}
        elif c[0] == "leaf":
            low = c[1]
        else:
            low = _lower_node(c)
        shoulds.append(low)
    return {"bool": {"should": shoulds, "minimum_should_match": 1}}


def _lower_conjunction(items) -> tuple[list, list, list]:
    """Children of a conjunction → (musts, filters, must_nots) — the flat
    bool shape. Non-scoring OR / NOT subtrees become ONE script filter
    (pushed scan); scoring subtrees become one nested bool child in must
    position; NOT over a scoring MATCH stays an analyzed-term must_not."""
    musts: list[dict] = []
    filters: list[dict] = []
    must_nots: list[dict] = []
    for c in items:
        kind = c[0]
        if kind == "leaf":
            (musts if c[2] else filters).append(c[1])
        elif kind == "not":
            sql = _tree_sql(c[1])
            if sql is not None:
                filters.append(_script_node(f"NOT ({sql})"))
            else:
                must_nots.append(_lower_node(c[1]))
        elif kind == "and":
            m, f, n = _lower_conjunction(c[1])
            musts += m
            filters += f
            must_nots += n
        else:  # or
            sql = _tree_sql(c)
            if sql is not None:
                filters.append(_script_node(sql))
            else:
                musts.append(_lower_node(c))
    return musts, filters, must_nots


def _lower_where(tree) -> tuple[list, list, list]:
    """Top-level WHERE tree → the flat (musts, filters, must_nots) triple
    the body assembler has always produced."""
    if tree[0] == "and":
        return _lower_conjunction(tree[1])
    return _lower_conjunction([tree])
# HAVING compiles to ONE Catalyst boolean expression over the bucket frame
# (post-aggregation, like SQL) — never a second corpus pass. Aggregate refs
# resolve to the same output names the GROUP BY agg builder emits; COUNT(*)
# resolves to the ``__COUNT__`` sentinel replaced with the live count column
# at execution (it is filterable even when not selected).

_AGG_FNS = ("COUNT", "AVG", "SUM", "MIN", "MAX")


def _agg_nodes(agg_items: list[dict]) -> tuple[dict, str | None]:
    """SELECT aggregate items → (named metric-agg nodes for the dsl_aggs
    half, COUNT(*) output alias or None). COUNT(col) = ES value_count;
    COUNT(DISTINCT col) = cardinality (exact — SQL semantics, so sql_query
    runs the aggs half with exact=True, never the HLL sketch)."""
    subaggs: dict = {}
    count_alias = None
    for it in agg_items:
        if it["fn"] == "COUNT" and it["col"] == "*":
            count_alias = it["alias"] or "count"
        elif it["fn"] == "COUNT":
            subaggs[it["alias"] or f"count_{it['col']}"] = {
                "value_count": {"field": it["col"]}
            }
        elif it["fn"] == "COUNT_DISTINCT":
            subaggs[it["alias"] or f"count_distinct_{it['col']}"] = {
                "cardinality": {"field": it["col"]}
            }
        else:
            subaggs[it["alias"] or f"{it['fn'].lower()}_{it['col']}"] = {
                it["fn"].lower(): {"field": it["col"]}
            }
    return subaggs, count_alias


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return repr(v)


def _having_ref(p: _P, agg_items: list[dict], group_by: list[str]) -> str:
    tok = p.next()
    if tok[0] != "word":
        raise ValueError(f"bad HAVING reference {tok[1]!r}")
    w = tok[1]
    up = w.upper()
    if up in _AGG_FNS and p.peek() == ("op", "("):
        p.next()
        if up == "COUNT" and p.kw("DISTINCT"):
            up = "COUNT_DISTINCT"
        arg = p.next()
        if arg == ("op", "*"):
            if up != "COUNT":
                raise ValueError(f"{up}(*) is not valid SQL — name a column")
            col = "*"
        elif arg[0] == "word":
            col = arg[1]
        else:
            raise ValueError(f"bad {up} argument {arg[1]!r}")
        p.expect("op", ")")
        if up == "COUNT" and col == "*":
            return "__COUNT__"
        for it in agg_items:
            if it["fn"] == up and it["col"] == col:
                out = it["alias"] or (
                    f"count_{col}" if up == "COUNT" else f"{up.lower()}_{col}"
                )
                return f"`{out}`"
        raise ValueError(
            f"HAVING {up}({col}) must also appear in the SELECT list "
            "(COUNT(*) alone is implicit)"
        )
    aliases = {it["alias"] for it in agg_items if it["alias"]}
    if w in aliases or w in group_by:
        return f"`{w}`"
    raise ValueError(
        f"HAVING reference {w!r} is neither a grouped column nor a SELECT "
        "aggregate alias"
    )


def _parse_having_pred(p: _P, agg_items: list[dict], group_by: list[str]) -> str:
    if p.kw("NOT"):
        return f"(NOT {_parse_having_pred(p, agg_items, group_by)})"
    if p.peek() == ("op", "("):
        p.next()
        e = _parse_having_or(p, agg_items, group_by)
        p.expect("op", ")")
        return f"({e})"
    ref = _having_ref(p, agg_items, group_by)
    k, op = p.next()
    if k != "op" or op not in ("=", "!=", "<>", ">", ">=", "<", "<="):
        raise ValueError(f"bad HAVING operator {op!r}")
    val = _lit(p.next())
    return f"({ref} {op} {_sql_literal(val)})"


def _parse_having_and(p: _P, agg_items: list[dict], group_by: list[str]) -> str:
    parts = [_parse_having_pred(p, agg_items, group_by)]
    while p.kw("AND"):
        parts.append(_parse_having_pred(p, agg_items, group_by))
    return " AND ".join(parts)


def _parse_having_or(p: _P, agg_items: list[dict], group_by: list[str]) -> str:
    parts = [_parse_having_and(p, agg_items, group_by)]
    while p.kw("OR"):
        parts.append(_parse_having_and(p, agg_items, group_by))
    return " OR ".join(parts)


def translate_sql(sql: str) -> dict:
    """The ``/_sql/translate`` analog: SQL text → the search request body
    (query + optional sort/fields/size) the DSL layer would execute."""
    p = _P(_tokens(sql))
    p.expect("word", "SELECT")

    select_cols: list[str] = []
    agg_items: list[dict] = []
    want_score = star = False
    while True:
        tok = p.next()
        if tok == ("op", "*"):
            star = True
        elif tok[0] == "word" and tok[1].upper() == "SCORE":
            p.expect("op", "("), p.expect("op", ")")
            want_score = True
        elif tok[0] == "word" and tok[1].upper() in _AGG_FNS and \
                p.peek() == ("op", "("):
            fn = tok[1].upper()
            p.next()
            if fn == "COUNT" and p.kw("DISTINCT"):
                fn = "COUNT_DISTINCT"
            arg_tok = p.next()
            if arg_tok == ("op", "*"):
                if fn != "COUNT":
                    raise ValueError(f"{fn}(*) is not valid SQL — name a column")
                arg = "*"
            elif arg_tok[0] == "word":
                arg = arg_tok[1]
            else:
                raise ValueError(f"bad {fn} argument {arg_tok[1]!r}")
            p.expect("op", ")")
            alias = p.expect("word") if p.kw("AS") else None
            agg_items.append({"fn": fn, "col": arg, "alias": alias})
        elif tok[0] == "word":
            select_cols.append(tok[1])
        else:
            raise ValueError(f"bad SELECT item {tok[1]!r}")
        if p.peek() == ("op", ","):
            p.next()
            continue
        break
    p.expect("word", "FROM")
    p.next()  # the index name is informational — one index per call

    musts: list[dict] = []
    filters: list[dict] = []
    must_nots: list[dict] = []
    if p.kw("WHERE"):
        musts, filters, must_nots = _lower_where(_parse_or(p))

    group_by: list[str] = []
    having: str | None = None
    if p.kw("GROUP", "BY"):
        group_by.append(p.expect("word"))
        while p.peek() == ("op", ","):
            p.next()
            group_by.append(p.expect("word"))
        if p.kw("HAVING"):
            having = _parse_having_or(p, agg_items, group_by)

    sort: list = []
    order_items: list[tuple[str, str]] = []
    if p.kw("ORDER", "BY"):
        while True:
            tok = p.next()
            if tok[0] == "word" and tok[1].upper() == "SCORE":
                p.expect("op", "("), p.expect("op", ")")
                direction = "desc"
                if p.kw("DESC"):
                    pass
                elif p.kw("ASC"):
                    direction = "asc"
                if direction != "desc":
                    raise ValueError(
                        "ORDER BY SCORE() ASC is not lowered — relevance "
                        "order is descending"
                    )
                sort.append("_score")
            elif tok[0] == "word":
                direction = "asc"
                if p.kw("DESC"):
                    direction = "desc"
                else:
                    p.kw("ASC")
                sort.append({tok[1]: {"order": direction}})
                order_items.append((tok[1], direction))
            else:
                raise ValueError(f"bad ORDER BY item {tok[1]!r}")
            if p.peek() == ("op", ","):
                p.next()
                continue
            break

    size = 10
    if p.kw("LIMIT"):
        size = int(p.expect("num"))
    if p.peek() is not None:
        raise ValueError(f"trailing SQL after LIMIT: {p.next()[1]!r}")

    # assemble the query node
    if not musts and not filters and not must_nots:
        qnode: dict = {"match_all": {}}
    elif len(musts) == 1 and not filters and not must_nots:
        qnode = musts[0]
    else:
        b: dict = {}
        if musts:
            b["must"] = musts
        if filters:
            b["filter"] = filters
        if must_nots:
            b["must_not"] = must_nots
        qnode = {"bool": b}

    body: dict = {"query": qnode, "size": size}
    if group_by:
        # GROUP BY → a terms (one column) / multi_terms (several columns)
        # aggregation over the query's full match set (the dsl_aggs half).
        # ES SQL itself lowers GROUP BY onto (composite) aggregations; this
        # engine's single-page bound is the terms size below — queries with
        # more groups raise there, they are never silently truncated by
        # this layer's LIMIT.
        if want_score or star:
            raise ValueError("GROUP BY supports column + aggregate selects")
        bad = [c for c in select_cols if c not in group_by]
        if bad:
            raise ValueError(f"column {bad[0]!r} is neither grouped nor "
                             "aggregated")
        subaggs, count_alias = _agg_nodes(agg_items)
        if len(group_by) == 1:
            g: dict = {"terms": {"field": group_by[0], "size": 65536}}
        else:
            g = {"multi_terms": {
                "terms": [{"field": c} for c in group_by], "size": 65536,
            }}
        if subaggs:
            g["aggs"] = subaggs
        body = {"query": qnode, "size": 0, "aggs": {"g": g}}
        body["_sql_meta"] = {
            "group_by": group_by, "count_alias": count_alias,
            "order": order_items, "limit": size, "select": select_cols,
            "having": having,
        }
        return body
    if agg_items:
        if select_cols or want_score or star:
            raise ValueError(
                "an ungrouped aggregate SELECT cannot mix in plain columns "
                "— add a GROUP BY"
            )
        # ungrouped SELECT COUNT(*) alone = the _count API (map-combined
        # count, no aggs machinery)
        if (
            len(agg_items) == 1 and agg_items[0]["fn"] == "COUNT"
            and agg_items[0]["col"] == "*"
        ):
            body["_sql_meta"] = {
                "count_only": agg_items[0]["alias"] or "count",
                "group_by": None, "select": [], "star": False,
                "score": False,
            }
            return body
        # general ungrouped aggregates (COUNT(col) / COUNT(DISTINCT col) /
        # AVG / SUM / MIN / MAX [+ COUNT(*)]): each lowers to one metric agg
        # over the match set; sql_query cross-joins the 1-row frames
        subaggs, count_alias = _agg_nodes(agg_items)
        if count_alias is not None:
            subaggs[count_alias] = {"value_count": {"field": "docid"}}
        body = {"query": qnode, "size": 0, "aggs": subaggs}
        body["_sql_meta"] = {
            "group_by": None, "ungrouped": list(subaggs),
            "select": [], "star": False, "score": False,
        }
        return body
    if sort and sort != ["_score"]:
        body["sort"] = sort
    if star:
        body["_source"] = True
    elif select_cols:
        body["fields"] = select_cols
    body["_sql_meta"] = {
        "select": select_cols, "star": star, "score": want_score,
        "group_by": None,
    }
    return body


def sql_query(
    spark: SparkSession,
    index_root: str,
    sql: str,
    *,
    lang: str | None = None,
    **backings,
) -> DataFrame:
    """ES ``POST /_sql`` analog: translate and execute. The hits keep
    ``docid`` (the ES SQL implicit id), the selected stored columns, and
    ``score`` when ``SCORE()`` was selected."""
    from pyspark.sql import functions as F

    from es_indexer_spark.query.dsl import search

    body = translate_sql(sql)
    meta = body.pop("_sql_meta")
    if meta.get("count_only"):
        from es_indexer_spark.query.dsl_aggs import count_query

        return count_query(spark, index_root, body, lang=lang).select(
            F.col("count").alias(meta["count_only"])
        )
    if meta.get("ungrouped"):
        # ungrouped metric aggregates: one 1-row frame per aggregate,
        # cross-joined into the single SQL result row (exact=True — SQL
        # COUNT(DISTINCT) is exact, never the HLL sketch)
        from functools import reduce

        from es_indexer_spark.query.dsl_aggs import aggregations

        frames = aggregations(spark, index_root, body, lang=lang, exact=True)
        return reduce(DataFrame.crossJoin,
                      [frames[n] for n in meta["ungrouped"]])
    if meta.get("group_by"):
        from es_indexer_spark.query.dsl_aggs import aggregations

        frame = aggregations(spark, index_root, body, lang=lang,
                             exact=True)["g"]
        gcols = meta["group_by"]
        if len(gcols) == 1:
            frame = frame.withColumnRenamed("key", gcols[0])
        count_name = "doc_count"
        if meta["count_alias"]:
            frame = frame.withColumnRenamed("doc_count", meta["count_alias"])
            count_name = meta["count_alias"]
        if meta.get("having"):
            # HAVING: one Catalyst predicate over the bucket frame —
            # COUNT(*) filters even when unselected (sentinel resolves to
            # the live count column before any drop)
            frame = frame.filter(
                F.expr(meta["having"].replace("__COUNT__", f"`{count_name}`"))
            )
        if not meta["count_alias"]:
            frame = frame.drop("doc_count")
        order = meta["order"] or [(c, "asc") for c in gcols]
        for name, _d in order:
            if name not in frame.columns:
                raise ValueError(f"ORDER BY {name!r} is not in the result")
        return frame.orderBy(
            *[F.asc(n) if d == "asc" else F.desc(n) for n, d in order]
        ).limit(int(meta["limit"]))
    out = search(spark, index_root, body, lang=lang, **backings)
    keep = ["docid"]
    keep += [c for c in meta["select"] if c in out.columns and c not in keep]
    if meta["star"]:
        keep += [c for c in out.columns if c not in keep and c != "score"]
    if meta["score"] and "score" in out.columns:
        keep.append("score")
    return out.select(*keep)
