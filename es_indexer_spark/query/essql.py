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

    SELECT  * | col[, col...] [, SCORE()]
    FROM    ident                      -- informational (one index per call)
    [WHERE  cond [AND cond]*]          -- OR is not lowered (use query_string)
    [ORDER BY SCORE() [DESC] | col [ASC|DESC][, ...]]
    [LIMIT  n]

    cond := MATCH(col, 'text') | QUERY('query string')
          | col = lit | col != lit | col <> lit
          | col > lit | col >= lit | col < lit | col <= lit
          | col IN (lit[, lit...])
          | col IS NULL | col IS NOT NULL

Lowering: MATCH/QUERY become scoring ``must`` clauses; field predicates
become bool ``filter`` (``term``/``terms``/``range``/``exists``) or
``must_not`` (``!=``, ``IS NULL``) clauses — i.e. non-scoring, pushed to the
docs scan by the bool engine. ``ORDER BY col`` routes through the body
``sort`` path (full-match-set selection by the sort key, ES semantics);
``ORDER BY SCORE() DESC`` (and no ORDER BY at all) is the relevance top-k.
``SELECT cols`` becomes the body ``fields`` section (stored-column fetch of
the ≤k hits)."""

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


def translate_sql(sql: str) -> dict:
    """The ``/_sql/translate`` analog: SQL text → the search request body
    (query + optional sort/fields/size) the DSL layer would execute."""
    p = _P(_tokens(sql))
    p.expect("word", "SELECT")

    select_cols: list[str] = []
    agg_items: list[dict] = []
    want_score = star = False
    _AGG_FNS = ("COUNT", "AVG", "SUM", "MIN", "MAX")
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
        while True:
            tok = p.next()
            if tok[0] != "word":
                raise ValueError(f"bad WHERE clause at {tok[1]!r}")
            word = tok[1]
            up = word.upper()
            if up == "OR":
                raise ValueError(
                    "OR is not lowered — express disjunctions with "
                    "QUERY('a OR b') or a terms IN list"
                )
            if up == "MATCH":
                p.expect("op", "(")
                fld = p.expect("word")
                p.expect("op", ",")
                txt = p.next()
                if txt[0] != "str":
                    raise ValueError("MATCH needs a string literal")
                p.expect("op", ")")
                musts.append({"match": {fld: txt[1]}})
            elif up == "QUERY":
                p.expect("op", "(")
                txt = p.next()
                if txt[0] != "str":
                    raise ValueError("QUERY needs a string literal")
                p.expect("op", ")")
                musts.append({"query_string": {"query": txt[1]}})
            else:
                fld = word
                if p.kw("LIKE"):
                    raise ValueError(
                        "LIKE is not lowered — dictionary prefixes go "
                        "through QUERY('pre*'); keyword patterns through "
                        "the wildcard query body"
                    )
                if p.kw("IS", "NOT", "NULL"):
                    filters.append({"exists": {"field": fld}})
                elif p.kw("IS", "NULL"):
                    must_nots.append({"exists": {"field": fld}})
                elif p.kw("IN"):
                    p.expect("op", "(")
                    vals = [_lit(p.next())]
                    while p.peek() == ("op", ","):
                        p.next()
                        vals.append(_lit(p.next()))
                    p.expect("op", ")")
                    filters.append({"terms": {fld: vals}})
                else:
                    k, op = p.next()
                    if k != "op" or op in ("(", ")", ",", "*"):
                        raise ValueError(f"bad operator {op!r} after {fld!r}")
                    val = _lit(p.next())
                    if op == "=":
                        filters.append({"term": {fld: {"value": val}}})
                    elif op in ("!=", "<>"):
                        must_nots.append({"term": {fld: {"value": val}}})
                    else:
                        key = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[op]
                        filters.append({"range": {fld: {key: val}}})
            if p.kw("AND"):
                continue
            nxt = p.peek()
            if nxt and nxt[0] == "word" and nxt[1].upper() == "OR":
                raise ValueError(
                    "OR is not lowered — express disjunctions with "
                    "QUERY('a OR b') or a terms IN list"
                )
            break

    group_by: str | None = None
    if p.kw("GROUP", "BY"):
        group_by = p.expect("word")
        if p.peek() == ("op", ","):
            raise ValueError("GROUP BY supports a single column")
        if p.kw("HAVING"):
            raise ValueError(
                "HAVING is not lowered — filter the returned bucket frame"
            )

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
    if group_by is not None:
        # GROUP BY → a terms aggregation over the query's full match set
        # (the dsl_aggs half). ES SQL itself lowers GROUP BY onto
        # (composite) aggregations; this engine's single-page bound is the
        # terms size below — queries with more groups raise there, they are
        # never silently truncated by this layer's LIMIT.
        if want_score or star:
            raise ValueError("GROUP BY supports column + aggregate selects")
        bad = [c for c in select_cols if c != group_by]
        if bad:
            raise ValueError(f"column {bad[0]!r} is neither grouped nor "
                             "aggregated")
        subaggs: dict = {}
        count_alias = None
        for it in agg_items:
            if it["fn"] == "COUNT" and it["col"] == "*":
                count_alias = it["alias"] or "count"
            elif it["fn"] == "COUNT":
                subaggs[it["alias"] or f"count_{it['col']}"] = {
                    "value_count": {"field": it["col"]}
                }
            else:
                subaggs[it["alias"] or f"{it['fn'].lower()}_{it['col']}"] = {
                    it["fn"].lower(): {"field": it["col"]}
                }
        g: dict = {"terms": {"field": group_by, "size": 65536}}
        if subaggs:
            g["aggs"] = subaggs
        body = {"query": qnode, "size": 0, "aggs": {"g": g}}
        body["_sql_meta"] = {
            "group_by": group_by, "count_alias": count_alias,
            "order": order_items, "limit": size, "select": select_cols,
        }
        return body
    if agg_items:
        # ungrouped aggregate: SELECT COUNT(*) = the _count API
        if (
            len(agg_items) == 1 and agg_items[0]["fn"] == "COUNT"
            and agg_items[0]["col"] == "*" and not select_cols
            and not want_score and not star
        ):
            body["_sql_meta"] = {
                "count_only": agg_items[0]["alias"] or "count",
                "group_by": None, "select": [], "star": False,
                "score": False,
            }
            return body
        raise ValueError(
            "ungrouped aggregates support SELECT COUNT(*) only — metric "
            "aggregates need a GROUP BY column"
        )
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
    if meta.get("group_by"):
        from es_indexer_spark.query.dsl_aggs import aggregations

        frame = aggregations(spark, index_root, body, lang=lang)["g"]
        gcol = meta["group_by"]
        frame = frame.withColumnRenamed("key", gcol)
        if meta["count_alias"]:
            frame = frame.withColumnRenamed("doc_count", meta["count_alias"])
        else:
            frame = frame.drop("doc_count")
        order = meta["order"] or [(gcol, "asc")]
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
