"""ES request-body (JSON query DSL) compatibility layer.

The reference's clients talk to Elasticsearch with JSON request bodies
(geonetwork4-api builds them programmatically; portal/Kibana users POST them
verbatim). This module lets those bodies run against the native engine:
``search(spark, index_root, body)`` parses the published request-body shape
and DISPATCHES onto the already-oracle-checked engine functions — no scoring
or matching logic lives here, only translation.

Supported surface (each maps to a documented engine call):

- queries: ``match_all`` / ``match`` (+``operator``/``fuzziness``/``boost``)
  / ``match_phrase`` (+``slop``) / ``match_phrase_prefix`` / ``term`` /
  ``terms`` / ``ids`` / ``range`` / ``exists`` / ``prefix`` / ``wildcard`` /
  ``regexp`` / ``fuzzy`` / ``bool`` (one level: must / should / must_not /
  filter over the leaf types above) / ``simple_query_string`` /
  ``query_string`` / ``dis_max`` / ``constant_score`` / ``boosting`` /
  ``function_score`` (field_value_factor) / ``script_score`` /
  ``rank_feature`` / ``distance_feature`` / ``pinned`` / ``more_like_this``
  / ``span_near`` / ``intervals`` / ``percolate`` is its own API;
- the top-level ``knn`` section (needs ``emb_df``) — alone or next to
  ``query`` (ES hybrid: contributions summed);
- ``size`` / ``from`` / ``sort`` (field dirs + ``_score``) /
  ``search_after`` / ``min_score``. A ``rescore`` body raises and points at
  ``rescore_phrase``; ``highlight`` lives in the highlight API; the
  ``rank_feature``/``distance_feature`` dispatch takes the engine's combined
  shape (a ``query`` string next to the feature spec — in ES these sit
  inside a surrounding bool, which is the one-level-nesting case).

Unsupported shapes raise ``ValueError`` naming the construct (nested bools
beyond one level, per-field analyzers, scripted sorts) — never a silent
mis-parse. Field routing: the index stores ONE analyzed text field; ``match``
-family queries accept any name for it (ES clients name it ``content``,
``text``, …), while ``term``/``terms``/``range``/``exists`` on OTHER names
hit the stored meta columns (keyword semantics), exactly like the engine's
filter clauses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TEXT_QUERIES = (
    "match", "match_phrase", "match_phrase_prefix", "simple_query_string",
    "query_string", "more_like_this",
)


def _one(d: dict, what: str) -> tuple[str, object]:
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"{what} must be a single-key object, got {d!r}")
    return next(iter(d.items()))


def _field_query(v, key: str = "query") -> dict:
    """ES leaf queries accept ``{field: "text"}`` or ``{field: {...}}``."""
    return v if isinstance(v, dict) else {key: v}


def _match_clause(spec: dict) -> tuple[str, float, int | None]:
    """(text, boost, fuzziness|None) from a match spec."""
    text = spec.get("query")
    if text is None:
        raise ValueError("match needs a query")
    boost = float(spec.get("boost", 1.0))
    fz = spec.get("fuzziness")
    if isinstance(fz, str):
        if fz.upper() == "AUTO":
            fz = 1
        else:
            fz = int(fz)
    return str(text), boost, fz


def _bool_kwargs(spec: dict) -> dict:
    """Flatten one level of ES bool clauses into bool_query kwargs."""
    out: dict = {
        "must": [], "should": [], "must_not": [],
        "must_fuzzy": [], "should_fuzzy": [],
        "must_prefix": [], "should_prefix": [],
        "must_raw": [], "should_raw": [],
        "must_terms": [], "should_terms": [],
        "must_wildcard": [], "should_wildcard": [],
        "must_phrase": [], "should_phrase": [],
        "must_not_raw": [],
        "filter_terms": [], "filter_fields": [], "filter_exists": [],
        "filter_range": [], "filter_phrase": None, "filter_phrase_slop": 0,
    }
    fuzz: set[int] = set()

    def leaf(kind: str, v, dest: str):
        if kind == "match":
            spec = _field_query(v)
            fname, fspec = _one(spec, "match") if "query" not in spec else (None, spec)
            if fname is not None:
                spec = _field_query(fspec)
            text, boost, fz = _match_clause(spec)
            if fz is not None:
                fuzz.add(fz)
                out[f"{dest}_fuzzy"].append((text, boost))
            else:
                out[dest].append((text, boost))
        elif kind == "prefix":
            fname, fspec = _one(v, "prefix")
            spec = _field_query(fspec, "value")
            out[f"{dest}_prefix"].append(
                (str(spec["value"]), float(spec.get("boost", 1.0)))
            )
        elif kind == "term":
            # raw index term, scored (Lucene TermQuery — no analysis chain)
            fname, fv = _one(v, "term")
            if isinstance(fv, dict):
                out[f"{dest}_raw"].append(
                    (str(fv["value"]), float(fv.get("boost", 1.0)))
                )
            else:
                out[f"{dest}_raw"].append((str(fv), 1.0))
        elif kind == "terms":
            # Lucene TermInSetQuery: constant-score any-of value group; the
            # optional "boost" key rides next to the field in ES syntax
            tv = dict(v)
            boost = float(tv.pop("boost", 1.0))
            fname, vals = _one(tv, "terms")
            out[f"{dest}_terms"].append(([str(x) for x in vals], boost))
        elif kind == "wildcard":
            fname, fspec = _one(v, "wildcard")
            wspec = _field_query(fspec, "value")
            out[f"{dest}_wildcard"].append(
                (str(wspec["value"]), float(wspec.get("boost", 1.0)))
            )
        elif kind == "match_phrase":
            # SCORED phrase clause (Lucene PhraseQuery semantics)
            _fn, ps = _one(v, "match_phrase")
            ps = _field_query(ps)
            out[f"{dest}_phrase"].append(
                (str(ps["query"]), float(ps.get("boost", 1.0)),
                 int(ps.get("slop", 0)))
            )
        elif kind == "range":
            # documented divergence: range/exists in scoring context are
            # treated as filter context (required for must, unsupported for
            # should) — ES would add a constant boost per matching doc
            if dest != "must":
                raise ValueError(
                    "range in bool.should is not supported — move it to "
                    "bool.filter (required) or bool.must"
                )
            fname, bounds = _one(v, "range")
            out["filter_range"].append(
                (fname, {k: b for k, b in bounds.items()
                         if k in ("gt", "gte", "lt", "lte")})
            )
        elif kind == "exists":
            if dest != "must":
                raise ValueError(
                    "exists in bool.should is not supported — move it to "
                    "bool.filter (required) or bool.must"
                )
            out["filter_exists"].append(v["field"])
        else:
            raise ValueError(
                f"bool.{dest} supports match/match_phrase/term/terms/prefix/"
                f"wildcard/range/exists leaves, got {kind!r}"
            )

    for dest in ("must", "should"):
        for q in _as_list(spec.get(dest)):
            kind, v = _one(q, f"bool.{dest} entry")
            leaf(kind, v, dest)
    for q in _as_list(spec.get("must_not")):
        kind, v = _one(q, "bool.must_not entry")
        if kind == "term":
            fname, fv = _one(v, "term")
            out["must_not_raw"].append(
                str(fv["value"] if isinstance(fv, dict) else fv)
            )
            continue
        if kind == "terms":
            fname, vals = _one(v, "terms")
            out["must_not_raw"].extend(str(x) for x in vals)
            continue
        if kind != "match":
            raise ValueError("bool.must_not supports match/term/terms leaves")
        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        out["must_not"].append(str(mspec["query"]))
    for q in _as_list(spec.get("filter")):
        kind, v = _one(q, "bool.filter entry")
        if kind == "term":
            fname, fv = _one(v, "term")
            val = fv["value"] if isinstance(fv, dict) else fv
            out["filter_fields"].append((fname, val))
        elif kind == "terms":
            # ES bool.filter(terms) on a stored keyword field: membership,
            # pushed into the same docs-store scan (isin); values keep their
            # type (numeric stored fields filter numerically)
            fname, vals = _one(v, "terms")
            out["filter_fields"].append((fname, list(vals)))
        elif kind == "range":
            fname, bounds = _one(v, "range")
            out["filter_range"].append(
                (fname, {k: b for k, b in bounds.items() if k in ("gt", "gte", "lt", "lte")})
            )
        elif kind == "exists":
            out["filter_exists"].append(v["field"])
        elif kind == "match_phrase":
            if out["filter_phrase"] is not None:
                raise ValueError("one filter match_phrase per bool")
            _fn, ps = _one(v, "match_phrase")
            ps = _field_query(ps)
            out["filter_phrase"] = str(ps["query"])
            out["filter_phrase_slop"] = int(ps.get("slop", 0))
        elif kind == "match":
            # non-scoring required terms
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            out["filter_terms"].append(str(mspec["query"]))
        else:
            raise ValueError(f"bool.filter supports term/terms/range/exists/match/match_phrase, got {kind!r}")
    if spec.get("minimum_should_match") is not None:
        out["minimum_should_match"] = spec["minimum_should_match"]
    if len(fuzz) > 1:
        raise ValueError(f"all match fuzziness values must agree, got {sorted(fuzz)}")
    if fuzz:
        out["fuzziness"] = fuzz.pop()
    out["filter_range"] = out["filter_range"] or None
    return out


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _fetch_fields(
    spark: SparkSession, index_root: str, body: dict, out: DataFrame
) -> DataFrame:
    """``_source`` / ``fields`` retrieval: join the ≤k hits back to the docs
    store and keep the requested stored columns (ES semantics: a requested
    field the mapping doesn't have is silently absent). ``_source: true`` or
    ``"*"`` returns every stored column; default (no section) keeps the
    hits frame as-is (ids + scores)."""
    src_spec = body.get("_source")
    fields = body.get("fields")
    want: list[str] | None = None
    if isinstance(src_spec, list):
        want = [str(f) for f in src_spec]
    elif src_spec is True:
        want = ["*"]
    if fields:
        want = (want or []) + [
            str(f["field"] if isinstance(f, dict) else f) for f in fields
        ]
    if not want:
        return out
    import os as _os

    from es_indexer_spark.index import catalog as _cat
    from es_indexer_spark.query.engine import fetch_docs

    vdir = _cat.resolve(index_root)
    doc_cols = spark.read.parquet(_os.path.join(vdir, "docs")).columns
    if "*" in want:
        want = [c for c in doc_cols if c != "docid"]
    want = [c for c in want if c in doc_cols]  # ES: unmapped names absent
    # hits from the lookup queries (term/terms/range/exists) already carry
    # the full docs row — keep only the non-doc columns (ids/score/fragment)
    # and re-fetch the REQUESTED stored columns, so _source restricts the
    # response the way ES does and the join is never ambiguous
    pre = out.select(
        *[c for c in out.columns if c == "docid" or c not in doc_cols]
    )
    fetched = fetch_docs(spark, index_root, pre)
    keep = list(pre.columns) + [c for c in want if c not in pre.columns]
    return fetched.select(*keep)


def _finish(
    spark: SparkSession,
    index_root: str,
    body: dict,
    out: DataFrame,
    from_: int,
    qnode: dict,
    src_df: DataFrame | None,
    src_id_col: str,
    src_text_col: str,
    lang: str | None,
) -> DataFrame:
    """Shared response sections: ``highlight`` (term highlighter over the
    caller-provided source table — the index stores postings, not text),
    then ``_source``/``fields`` retrieval, then ``from`` paging."""
    hl = body.get("highlight")
    if hl is not None:
        if src_df is None:
            raise ValueError(
                "highlight needs src_df (the source-text table) — the index "
                "stores postings, not source text"
            )
        kind, v = _one(qnode, "query")
        if kind not in ("match", "match_phrase"):
            raise ValueError("highlight supports match / match_phrase queries")
        spec = _field_query(v)
        if "query" not in spec:
            _fn, fs = _one(spec, kind)
            spec = _field_query(fs)
        from es_indexer_spark.analysis.tokenizer import tokenize_one
        from es_indexer_spark.index import catalog as _cat
        from es_indexer_spark.query.highlight import highlight_hits

        stats = _cat.read_stats(_cat.resolve(index_root))
        terms = tokenize_one(str(spec["query"]), stats["tokenizer"], lang=lang)
        out = highlight_hits(
            out, src_df, src_id_col, src_text_col, terms,
            fragment_size=int(hl.get("fragment_size", 160)),
            pre_tag=(hl.get("pre_tags") or ["<em>"])[0],
            post_tag=(hl.get("post_tags") or ["</em>"])[0],
        )
    out = _fetch_fields(spark, index_root, body, out)
    return out.offset(from_) if from_ else out


def search(
    spark: SparkSession,
    index_root: str,
    body: dict,
    *,
    emb_df: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    lang: str | None = None,
    src_df: DataFrame | None = None,
    src_id_col: str = "doc_id",
    src_text_col: str = "text",
) -> DataFrame:
    """Run an ES request body against the index. Returns the hits frame the
    matching engine function produces (``docid`` + ``score`` [+ sort / tf
    columns]). ``emb_df`` backs the ``knn`` section; ``more_like_this``
    takes its like as raw text (fetch stored source text for a like._id)."""
    from es_indexer_spark.query.boolean import bool_query

    if not isinstance(body, dict):
        raise ValueError("body must be a dict (the parsed JSON request)")
    if body.get("aggs") or body.get("aggregations"):
        raise ValueError(
            "body has an aggs section — run it with dsl_aggs.aggregations() "
            "(one bucket table per aggregation; the CLI dsl job runs both "
            "halves); pass search() the body without aggs for the hits"
        )
    size = int(body.get("size", 10))
    from_ = int(body.get("from", 0))
    knn_spec = body.get("knn")
    qnode = body.get("query")
    if qnode is None and knn_spec is None:
        qnode = {"match_all": {}}

    if knn_spec is not None:
        from es_indexer_spark.ops.similarity import knn_hybrid_topk, knn_search

        if emb_df is None:
            raise ValueError("a knn section needs emb_df")
        qvec = [float(x) for x in knn_spec["query_vector"]]
        k = int(knn_spec.get("k", size))
        if qnode is None:
            out = knn_search(
                emb_df, emb_id_col, emb_vec_col, qvec, k=k,
                filter_expr=_knn_filter(knn_spec.get("filter")),
                similarity=knn_spec.get("similarity"),
                num_candidates=knn_spec.get("num_candidates"),
            )
        else:
            kind, v = _one(qnode, "query")
            if kind != "match":
                raise ValueError("hybrid knn supports a match query section")
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            out = knn_hybrid_topk(
                spark, index_root, str(mspec["query"]), emb_df, emb_id_col,
                emb_vec_col, qvec, k=size, knn_k=k,
                knn_boost=float(knn_spec.get("boost", 1.0)), lang=lang,
            )
        return out.offset(from_) if from_ else out

    if body.get("sort"):
        from es_indexer_spark.query.engine import topk_sorted

        kind, v = _one(qnode, "query")
        if kind not in ("match", "match_all"):
            raise ValueError("sort supports match / match_all queries")
        if kind == "match":
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            qtext = str(mspec["query"])
        else:
            qtext = ""
        sort = []
        for s in _as_list(body["sort"]):
            if isinstance(s, str):
                sort.append(s)
            else:
                fname, sspec = _one(s, "sort entry")
                order = sspec["order"] if isinstance(sspec, dict) else sspec
                sort.append((fname, order))
        out = topk_sorted(
            spark, index_root, qtext, sort=sort, k=size + from_,
            after=tuple(body["search_after"]) if body.get("search_after") else None,
            lang=lang,
        )
        return _finish(spark, index_root, body, out, from_, qnode,
                       src_df, src_id_col, src_text_col, lang)

    kind, v = _one(qnode, "query")
    while kind == "wrapper":
        # ES wrapper query: a base64-encoded JSON query — decode and
        # re-dispatch (clients use it to smuggle queries through systems
        # that mangle JSON)
        import base64
        import json as _json

        qnode = _json.loads(base64.b64decode(v["query"]))
        kind, v = _one(qnode, "query")
    out: DataFrame
    if kind == "match_none":
        from es_indexer_spark.query.engine import _SCORE_SCHEMA

        return spark.createDataFrame([], _SCORE_SCHEMA)
    if kind == "match_all":
        from es_indexer_spark.query.classic import query_string

        out = query_string(spark, index_root, "*:*", k=size + from_)
    elif kind == "match":
        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        text, boost, fz = _match_clause(mspec)
        operator = str(mspec.get("operator", "or")).lower()
        kw: dict = {"k": size + from_, "lang": lang}
        if fz is not None:
            kw["fuzziness"] = fz
            kw["must_fuzzy" if operator == "and" else "should_fuzzy"] = [(text, boost)]
        elif operator == "and":
            kw["must"] = [(text, boost)]
        else:
            kw["should"] = [(text, boost)]
        if mspec.get("minimum_should_match") is not None:
            kw["minimum_should_match"] = mspec["minimum_should_match"]
        out = bool_query(spark, index_root, **kw)
    elif kind == "match_phrase":
        from es_indexer_spark.query.phrase import phrase_match

        _fn, ps = _one(v, "match_phrase")
        ps = _field_query(ps)
        out = phrase_match(
            spark, index_root, str(ps["query"]), k=size + from_,
            slop=int(ps.get("slop", 0)), lang=lang,
        )
    elif kind == "match_phrase_prefix":
        from es_indexer_spark.query.phrase import match_phrase_prefix

        _fn, ps = _one(v, "match_phrase_prefix")
        ps = _field_query(ps)
        out = match_phrase_prefix(
            spark, index_root, str(ps["query"]), k=size + from_,
            max_expansions=int(ps.get("max_expansions", 50)), lang=lang,
        )
    elif kind == "bool":
        out = bool_query(spark, index_root, k=size + from_, lang=lang,
                         **_bool_kwargs(v))
    elif kind in ("term", "terms"):
        from es_indexer_spark.query.lookup import term_query, terms_query

        fname, fv = _one(v, kind)
        if kind == "term":
            val = fv["value"] if isinstance(fv, dict) else fv
            out = term_query(spark, index_root, fname, val, size=size + from_)
        elif isinstance(fv, dict):
            # ES terms LOOKUP: values come from a stored document's field —
            # {"terms": {f: {"index": ..., "id": N, "path": "field"}}}. One
            # docid point-read (row-group-pruned), then the plain terms
            # query; the lookup doc lives in THIS index (cross-index lookup
            # would need a second engine instance — pass values inline).
            from es_indexer_spark.query.lookup import doc_lookup

            rows = doc_lookup(spark, index_root, [int(fv["id"])]).collect()
            if not rows:
                raise ValueError(f"terms lookup doc {fv['id']!r} not found")
            vals = rows[0][str(fv.get("path", fname))]
            vals = vals if isinstance(vals, (list, tuple)) else [vals]
            out = terms_query(
                spark, index_root, fname, [x for x in vals if x is not None],
                size=size + from_,
            )
        else:
            out = terms_query(spark, index_root, fname, list(fv), size=size + from_)
    elif kind == "ids":
        from es_indexer_spark.query.lookup import doc_lookup

        out = doc_lookup(spark, index_root, [int(i) for i in v["values"]])
    elif kind == "range":
        from es_indexer_spark.query.lookup import range_query

        fname, bounds = _one(v, "range")
        out = range_query(
            spark, index_root, fname,
            {k2: b for k2, b in bounds.items() if k2 in ("gt", "gte", "lt", "lte")},
            size=size + from_,
        )
    elif kind == "exists":
        from es_indexer_spark.query.lookup import exists_query

        out = exists_query(spark, index_root, v["field"], size=size + from_)
    elif kind == "prefix":
        from es_indexer_spark.query.suggest import prefix_query

        _fn, spec = _one(v, "prefix")
        spec = _field_query(spec, "value")
        out = prefix_query(spark, index_root, str(spec["value"]), k=size + from_)
    elif kind == "wildcard":
        from es_indexer_spark.query.suggest import wildcard_query

        _fn, spec = _one(v, "wildcard")
        spec = _field_query(spec, "value")
        out = wildcard_query(spark, index_root, str(spec["value"]), k=size + from_)
    elif kind == "regexp":
        from es_indexer_spark.query.suggest import regexp_query

        _fn, spec = _one(v, "regexp")
        spec = _field_query(spec, "value")
        out = regexp_query(spark, index_root, str(spec["value"]), k=size + from_)
    elif kind == "fuzzy":
        from es_indexer_spark.query.engine import fuzzy_topk

        _fn, spec = _one(v, "fuzzy")
        spec = _field_query(spec, "value")
        fz = spec.get("fuzziness", 1)
        out = fuzzy_topk(
            spark, index_root, str(spec["value"]), k=size + from_,
            fuzziness=1 if fz in ("AUTO", None) else int(fz),
        )
    elif kind == "simple_query_string":
        from es_indexer_spark.query.querystring import simple_query_string

        out = simple_query_string(
            spark, index_root, str(v["query"]), k=size + from_,
            default_operator=str(v.get("default_operator", "or")), lang=lang,
        )
    elif kind == "query_string":
        from es_indexer_spark.query.classic import query_string

        out = query_string(
            spark, index_root, str(v["query"]), k=size + from_,
            default_operator=str(v.get("default_operator", "or")), lang=lang,
            minimum_should_match=v.get("minimum_should_match"),
        )
    elif kind == "dis_max":
        from es_indexer_spark.query.compound import dis_max

        clauses = []
        for q in v["queries"]:
            qk, qv = _one(q, "dis_max clause")
            if qk != "match":
                raise ValueError("dis_max clauses support match leaves")
            mspec = _field_query(qv)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            clauses.append(str(mspec["query"]))
        out = dis_max(
            spark, index_root, clauses,
            tie_breaker=float(v.get("tie_breaker", 0.0)), k=size + from_,
            lang=lang,
        )
    elif kind == "more_like_this":
        from es_indexer_spark.query.engine import more_like_this

        likes = [e for e in _as_list(v.get("like")) if isinstance(e, str)]
        if len(likes) != 1:
            raise ValueError(
                "more_like_this supports one raw-text like (for a like._id, "
                "fetch the stored source text and pass it as the like string)"
            )
        out = more_like_this(
            spark, index_root, likes[0], k=size + from_,
            max_query_terms=int(v.get("max_query_terms", 25)),
            min_term_freq=int(v.get("min_term_freq", 2)),
            min_doc_freq=int(v.get("min_doc_freq", 5)),
            lang=lang,
        )
    elif kind == "constant_score":
        from es_indexer_spark.query.compound import constant_score

        fkind, fv = _one(v["filter"], "constant_score.filter")
        kw2: dict = {"boost": float(v.get("boost", 1.0)), "k": size + from_,
                     "lang": lang}
        if fkind == "match":
            mspec = _field_query(fv)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            kw2["filter_terms"] = [str(mspec["query"])]
        elif fkind == "range":
            fname, bounds = _one(fv, "range")
            kw2["filter_range"] = (
                fname,
                {k2: b for k2, b in bounds.items() if k2 in ("gt", "gte", "lt", "lte")},
            )
        else:
            raise ValueError("constant_score.filter supports match/range")
        out = constant_score(spark, index_root, **kw2)
    elif kind == "boosting":
        from es_indexer_spark.query.compound import boosting

        def _text(node, what):
            nk, nv = _one(node, what)
            if nk != "match":
                raise ValueError(f"{what} supports a match leaf")
            mspec = _field_query(nv)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            return str(mspec["query"])

        out = boosting(
            spark, index_root,
            positive=_text(v["positive"], "boosting.positive"),
            negative=_text(v["negative"], "boosting.negative"),
            negative_boost=float(v.get("negative_boost", 0.5)),
            k=size + from_, lang=lang,
        )
    elif kind == "function_score":
        from es_indexer_spark.query.engine import function_score_topk

        qk, qv = _one(v["query"], "function_score.query")
        if qk != "match":
            raise ValueError("function_score.query supports a match leaf")
        mspec = _field_query(qv)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        fvf = v.get("field_value_factor")
        if fvf is None:
            raise ValueError("function_score supports field_value_factor")
        out = function_score_topk(
            spark, index_root, str(mspec["query"]), fvf["field"],
            k=size + from_, factor=float(fvf.get("factor", 1.0)),
            modifier=str(fvf.get("modifier", "ln1p")),
            boost_mode=str(v.get("boost_mode", "multiply")),
            missing=float(fvf.get("missing", 1.0)), lang=lang,
        )
    elif kind == "script_score":
        from es_indexer_spark.query.engine import script_score_topk

        qk, qv = _one(v["query"], "script_score.query")
        if qk != "match":
            raise ValueError("script_score.query supports a match leaf")
        mspec = _field_query(qv)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        script = v["script"]["source"] if isinstance(v.get("script"), dict) else v["script"]
        out = script_score_topk(
            spark, index_root, str(mspec["query"]), str(script),
            k=size + from_,
            fields=tuple(v.get("fields", ())),
            min_score=body.get("min_score"), lang=lang,
        )
    elif kind == "rank_feature":
        from es_indexer_spark.query.engine import rank_feature_topk

        fn_name = next(
            (f for f in ("saturation", "log", "sigmoid") if f in v), "saturation"
        )
        fspec = v.get(fn_name) or {}
        out = rank_feature_topk(
            spark, index_root, str(v["query"]), v["field"], k=size + from_,
            function=fn_name, pivot=fspec.get("pivot"),
            scaling_factor=float(fspec.get("scaling_factor", 1.0)),
            exponent=float(fspec.get("exponent", 1.0)), lang=lang,
        )
    elif kind == "distance_feature":
        from es_indexer_spark.query.engine import distance_feature_topk

        out = distance_feature_topk(
            spark, index_root, str(v["query"]), v["field"],
            float(v["origin"]), float(v["pivot"]), k=size + from_,
            boost=float(v.get("boost", 1.0)), lang=lang,
        )
    elif kind == "pinned":
        from es_indexer_spark.query.engine import pinned_topk

        org = v["organic"]
        ok_, ov = _one(org, "pinned.organic")
        if ok_ != "match":
            raise ValueError("pinned.organic supports a match leaf")
        mspec = _field_query(ov)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        out = pinned_topk(
            spark, index_root, [int(i) for i in v["ids"]],
            str(mspec["query"]), k=size + from_, lang=lang,
        )
    elif kind == "span_near":
        from es_indexer_spark.query.phrase import span_near

        clauses = []
        for c in v["clauses"]:
            ck, cv = _one(c, "span_near clause")
            if ck != "span_term":
                raise ValueError("span_near clauses support span_term leaves")
            _fn, tv = _one(cv, "span_term")
            clauses.append(str(tv["value"] if isinstance(tv, dict) else tv))
        out = span_near(
            spark, index_root, clauses, slop=int(v.get("slop", 0)),
            in_order=bool(v.get("in_order", True)), k=size + from_, lang=lang,
        )
    elif kind == "sparse_vector":
        from es_indexer_spark.query.sparsevec import sparse_vector_topk

        qv = v.get("query_vector")
        if not isinstance(qv, dict):
            raise ValueError(
                "sparse_vector needs an inline query_vector token->weight "
                "map (inference_id token generation is an external ML "
                "service — precompute the expansion and send the map)"
            )
        pcfg = v.get("pruning_config") or {}
        out = sparse_vector_topk(
            spark, index_root, {str(t): float(w) for t, w in qv.items()},
            k=size + from_, prune=bool(v.get("prune", False)),
            tokens_freq_ratio_threshold=float(
                pcfg.get("tokens_freq_ratio_threshold", 5.0)),
            tokens_weight_threshold=float(
                pcfg.get("tokens_weight_threshold", 0.4)),
        )
    elif kind == "text_expansion":
        raise ValueError(
            "text_expansion runs a deployed ML model per query — precompute "
            "the expansion and send it as sparse_vector.query_vector"
        )
    elif kind == "intervals":
        from es_indexer_spark.query.intervals import intervals_query

        _fn, spec = _one(v, "intervals")
        out = intervals_query(spark, index_root, spec, k=size + from_, lang=lang)
    else:
        raise ValueError(f"unsupported query type: {kind!r}")

    if body.get("min_score") is not None and "score" in out.columns:
        from pyspark.sql import functions as F

        out = out.filter(F.col("score") >= float(body["min_score"]))
    if body.get("rescore") is not None:
        raise ValueError(
            "rescore: call query/engine.py rescore_phrase directly (the body "
            "shape nests a full query; only the phrase window form is native)"
        )
    return _finish(spark, index_root, body, out, from_, qnode,
                   src_df, src_id_col, src_text_col, lang)


def _knn_filter(f):
    """A knn.filter of shape {"term": {field: v}} / {"range": {...}} →
    a SQL predicate string for the vector scan."""
    if f is None:
        return None
    kind, v = _one(f, "knn.filter")
    if kind == "term":
        fname, fv = _one(v, "term")
        val = fv["value"] if isinstance(fv, dict) else fv
        lit = f"'{val}'" if isinstance(val, str) else repr(val)
        return f"{fname} = {lit}"
    if kind == "range":
        fname, bounds = _one(v, "range")
        ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
        preds = [
            f"{fname} {ops[k]} {repr(b)}" for k, b in bounds.items() if k in ops
        ]
        return " AND ".join(preds)
    raise ValueError(f"knn.filter supports term/range, got {kind!r}")
