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
  ``terms`` (inline + lookup form) / ``ids`` / ``range`` / ``exists`` /
  ``prefix`` / ``wildcard`` / ``regexp`` / ``fuzzy`` / ``bool`` (one level:
  must / should / must_not / filter over match / match_phrase (SCORED,
  Lucene PhraseQuery) / term / terms / prefix / wildcard / range / exists
  leaves) / ``simple_query_string`` / ``query_string`` / ``dis_max`` /
  ``constant_score`` / ``boosting`` / ``function_score``
  (field_value_factor) / ``script_score`` / ``rank_feature`` /
  ``distance_feature`` / ``pinned`` / ``more_like_this`` / ``terms_set`` /
  ``match_bool_prefix`` / ``multi_match`` / ``combined_fields`` (multi-field
  index root) / ``span_near`` (span_term + span_multi(prefix) clauses) /
  ``span_or`` / ``span_not`` / ``span_first`` / ``span_containing`` /
  ``span_within`` / ``intervals`` / ``sparse_vector`` / ``wrapper`` /
  ``match_none``;
- DataFrame-backed kinds through named parameters: ``geo_bounding_box`` /
  ``geo_distance`` (``geo_root``), ``geo_shape`` (``shape_df``), ``nested``
  (``nested_df``, compiled element predicates), ``percolate``
  (``queries_df`` + inline document);
- the top-level ``knn`` section (needs ``emb_df``) — alone or next to
  ``query`` (ES hybrid: contributions summed);
- ``size`` / ``from`` / ``sort`` (field dirs + ``_score``; over match /
  match_all / bool / match_phrase / term / range / exists matches) /
  ``search_after`` / ``min_score`` / ``_source`` / ``fields`` /
  ``highlight`` (match / match_phrase / term / bool). A ``rescore`` body
  with a match main query + match_phrase rescore_query lowers onto
  ``rescore_phrase`` (other shapes raise by name); the ``rank_feature`` /
  ``distance_feature`` dispatch takes the engine's combined shape (a
  ``query`` string next to the feature spec — in ES these sit inside a
  surrounding bool, which is the one-level-nesting case).
  :func:`validate_query` is the ``_validate/query`` shape over the same
  dispatch. A ``collapse`` section on a match body lowers onto
  ``collapse_topk`` (one best hit per stored-field value); the body-level
  ``suggest`` section (:func:`suggest`) lowers term/completion/phrase
  suggesters onto the suggest module (the phrase suggester measures its
  bigram LM from the positional index — round 5h).

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


def _subquery_scores(
    spark: SparkSession,
    index_root: str,
    node: dict,
    lang: str | None,
    scored: bool = True,
) -> DataFrame:
    """Any supported query node as its full (k=None) ``(docid, score)``
    frame — the compositional evaluator's child seam (round 5h). Wrapper
    queries (dis_max / constant_score / boosting / function_score /
    script_score / pinned) pass non-match sub-queries through this, so every
    bool-expressible kind (incl. nested bools) works inside them."""
    from es_indexer_spark.query.composebool import _child_scores

    return _child_scores(spark, index_root, node, lang, scored)


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
        "must_ranges": [], "should_ranges": [],
        "must_exists": [], "should_exists": [],
        "filter_terms": [], "filter_fields": [], "filter_exists": [],
        "filter_like": [], "filter_script": [],
        "filter_range": [], "filter_phrase": None, "filter_phrase_slop": 0,
    }
    fuzz: set[int] = set()
    tsp: set[bool] = set()

    def leaf(kind: str, v, dest: str):
        if kind == "match":
            spec = _field_query(v)
            fname, fspec = _one(spec, "match") if "query" not in spec else (None, spec)
            if fname is not None:
                spec = _field_query(fspec)
            text, boost, fz = _match_clause(spec)
            if fz is not None:
                fuzz.add(fz)
                tsp.add(bool(spec.get("fuzzy_transpositions", False)))
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
            # SCORED range clause (ES ConstantScore: matching docs get boost
            # flat; required in must, msm-counted in should) — unlike the
            # filter-context range, which never scores
            fname, bounds = _one(v, "range")
            boost = float(bounds.get("boost", 1.0))
            out[f"{dest}_ranges"].append(
                (fname, {k: b for k, b in bounds.items()
                         if k in ("gt", "gte", "lt", "lte")}, boost)
            )
        elif kind == "exists":
            out[f"{dest}_exists"].append(
                (str(v["field"]), float(v.get("boost", 1.0)))
            )
        elif kind == "bool":
            # One level of nesting, flattened where Boolean algebra makes it
            # score-identical (Lucene bool scores SUM, so these rewrites are
            # exact — README divergences):
            # - a NON-SCORING inner bool (only filter/must_not children) in
            #   must context contributes score 0 and acts as a required
            #   filter -> its children flatten into parent filter/must_not;
            # - {bool: {must: [X]}} with nothing else is a no-op wrapper
            #   (query-builder noise) -> X directly, in must or should.
            scoring = _as_list(v.get("must")) + _as_list(v.get("should"))
            plain = (
                v.get("minimum_should_match") is None
                and float(v.get("boost", 1.0)) == 1.0
            )
            if dest == "must" and not scoring and plain:
                flatten_required(v)
            elif (
                plain
                and len(_as_list(v.get("must"))) == 1
                and not v.get("should")
                and not v.get("filter")
                and not v.get("must_not")
            ):
                ik, iv = _one(_as_list(v["must"])[0], "bool.must entry")
                leaf(ik, iv, dest)
            else:
                raise ValueError(
                    f"nested bool in {dest}: only a NON-SCORING bool "
                    "(filter/must_not children, no boost/msm) in must, or a "
                    "bare {bool: {must: [X]}} wrapper, flattens exactly — "
                    "restructure deeper scoring bools into one level"
                )
        else:
            raise ValueError(
                f"bool.{dest} supports match/match_phrase/term/terms/prefix/"
                f"wildcard/range/exists/bool leaves, got {kind!r}"
            )

    def add_must_not(q):
        kind, v = _one(q, "bool.must_not entry")
        if kind == "bool":
            # NOT over a single required clause unwraps; NOT over a
            # conjunction (De Morgan -> disjunction) or over must_not
            # (double negation -> disjunction) does not flatten to
            # conjunctive must_not
            req = _as_list(v.get("must")) + _as_list(v.get("filter"))
            if (
                len(req) == 1
                and not v.get("should")
                and not v.get("must_not")
                and v.get("minimum_should_match") is None
            ):
                add_must_not(req[0])
                return
            raise ValueError(
                "nested bool in must_not flattens only the single-required-"
                "clause wrapper {bool: {must|filter: [X]}} (De Morgan turns "
                "conjunctions/negations into disjunctions)"
            )
        if kind == "term":
            fname, fv = _one(v, "term")
            out["must_not_raw"].append(
                str(fv["value"] if isinstance(fv, dict) else fv)
            )
            return
        if kind == "terms":
            fname, vals = _one(v, "terms")
            out["must_not_raw"].extend(str(x) for x in vals)
            return
        if kind != "match":
            raise ValueError(
                "bool.must_not supports match/term/terms/bool leaves"
            )
        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        out["must_not"].append(str(mspec["query"]))

    def flatten_required(v):
        """Inner bool whose children are ALL non-scoring in this position:
        filter+must conjuncts -> parent filter, must_not -> parent must_not
        (filter context ignores scores, so inner must == inner filter)."""
        if v.get("should") or v.get("minimum_should_match") is not None:
            raise ValueError(
                "nested bool flattening covers filter/must/must_not children "
                "(a should group is a disjunction — restructure, or move it "
                "to the top-level bool)"
            )
        for qq in _as_list(v.get("filter")) + _as_list(v.get("must")):
            add_filter(qq)
        for qq in _as_list(v.get("must_not")):
            add_must_not(qq)

    def add_filter(q):
        kind, v = _one(q, "bool.filter entry")
        if kind == "bool":
            # filter context is entirely non-scoring: the nested bool's
            # required children conjoin with the parent's
            plain_boost = float(v.get("boost", 1.0)) == 1.0
            if not plain_boost:
                raise ValueError("boost on a filter-context bool is a no-op in ES; remove it")
            flatten_required(v)
            return
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
        elif kind == "wildcard":
            # ES bool.filter(wildcard) on a STORED keyword field: the ES SQL
            # LIKE lowering — a non-scoring anchored pattern predicate pushed
            # into the docs-store scan (the scored wildcard clause in
            # must/should addresses the indexed content instead)
            fname, fspec = _one(v, "wildcard")
            wspec = _field_query(fspec, "value")
            if wspec.get("case_insensitive"):
                raise ValueError(
                    "filter-context wildcard is case-sensitive (ES default) "
                    "— lowercase the pattern and field, or use a scored "
                    "wildcard clause"
                )
            out["filter_like"].append((fname, str(wspec["value"])))
        elif kind == "script":
            # ES bool.filter(script): Catalyst predicate over stored columns
            # (the Painless slot), pushed into the same docs scan — also the
            # ES SQL lowering for NOT / non-scoring OR over field predicates
            sspec = v.get("script")
            src = sspec.get("source") if isinstance(sspec, dict) else sspec
            if not src:
                raise ValueError("filter script needs script.source")
            out["filter_script"].append(str(src))
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
            raise ValueError(f"bool.filter supports term/terms/range/exists/wildcard/script/match/match_phrase/bool, got {kind!r}")

    for dest in ("must", "should"):
        for q in _as_list(spec.get(dest)):
            kind, v = _one(q, f"bool.{dest} entry")
            leaf(kind, v, dest)
    for q in _as_list(spec.get("must_not")):
        add_must_not(q)
    for q in _as_list(spec.get("filter")):
        add_filter(q)
    if spec.get("minimum_should_match") is not None:
        out["minimum_should_match"] = spec["minimum_should_match"]
    if len(fuzz) > 1:
        raise ValueError(f"all match fuzziness values must agree, got {sorted(fuzz)}")
    if fuzz:
        out["fuzziness"] = fuzz.pop()
    if len(tsp) > 1:
        raise ValueError("all fuzzy_transpositions values must agree")
    if True in tsp:
        out["transpositions"] = True
    out["filter_range"] = out["filter_range"] or None
    return out


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _span_leaf(node: dict) -> str:
    """One span clause -> its chain slot: ``span_term`` -> the term,
    ``span_multi`` wrapping a ``prefix`` -> the ``pre*`` wildcard slot
    (span_multi_near's expansion syntax)."""
    kind, v = _one(node, "span clause")
    if kind == "span_term":
        _fn, tv = _one(v, "span_term")
        return str(tv["value"] if isinstance(tv, dict) else tv)
    if kind == "span_multi":
        mk, mv = _one(v["match"], "span_multi.match")
        if mk != "prefix":
            raise ValueError("span_multi supports a prefix match")
        _fn, pv = _one(mv, "prefix")
        return str(pv["value"] if isinstance(pv, dict) else pv) + "*"
    raise ValueError(f"span clause supports span_term/span_multi, got {kind!r}")


def _span_parts(node: dict) -> tuple[list[str], int, bool]:
    """A span node -> (clause slots, slop, in_order): a bare span_term /
    span_multi is a one-clause exact span; span_near carries its knobs."""
    kind, v = _one(node, "span node")
    if kind == "span_near":
        return (
            [_span_leaf(c) for c in v["clauses"]],
            int(v.get("slop", 0)),
            bool(v.get("in_order", True)),
        )
    return [_span_leaf(node)], 0, True


def _parse_fields_boosts(fields) -> dict[str, float]:
    """ES ``fields`` list with optional ``name^boost`` carets -> weight map."""
    out: dict[str, float] = {}
    for f in fields:
        name, _, bs = str(f).partition("^")
        out[name] = float(bs) if bs else 1.0
    return out


def _distance_km(spec) -> float:
    """ES distance string (``"200km"``, ``"5000m"``, ``"10mi"``, ``"3nmi"``)
    or bare number (meters, the ES default unit) -> kilometers."""
    if isinstance(spec, (int, float)):
        return float(spec) / 1000.0
    s = str(spec).strip().lower()
    for suf, mul in (("nmi", 1.852), ("km", 1.0), ("mi", 1.609344),
                     ("m", 0.001), ("yd", 0.0009144), ("ft", 0.0003048)):
        if s.endswith(suf):
            return float(s[: -len(suf)]) * mul
    return float(s) / 1000.0


def _elem_pred(path: str, node: dict):
    """Compile the ``nested.query`` subset (term / range / exists / bool of
    those) into a lambda over the array element for ``nested_query`` —
    field names may carry the ES ``path.`` prefix."""
    from pyspark.sql import functions as F

    def strip(fname: str) -> str:
        return fname[len(path) + 1:] if fname.startswith(path + ".") else fname

    kind, v = _one(node, "nested query")
    if kind == "term":
        fname, fv = _one(v, "nested term")
        val = fv["value"] if isinstance(fv, dict) else fv
        f = strip(fname)
        return lambda e: e[f] == F.lit(val)
    if kind == "range":
        fname, bounds = _one(v, "nested range")
        f = strip(fname)
        ops = {k: b for k, b in bounds.items() if k in ("gt", "gte", "lt", "lte")}

        def pred(e):
            c = F.lit(True)
            if "gt" in ops:
                c = c & (e[f] > F.lit(ops["gt"]))
            if "gte" in ops:
                c = c & (e[f] >= F.lit(ops["gte"]))
            if "lt" in ops:
                c = c & (e[f] < F.lit(ops["lt"]))
            if "lte" in ops:
                c = c & (e[f] <= F.lit(ops["lte"]))
            return c

        return pred
    if kind == "exists":
        f = strip(str(v["field"]))
        return lambda e: e[f].isNotNull()
    if kind == "bool":
        musts = [_elem_pred(path, q) for q in _as_list(v.get("must"))]
        musts += [_elem_pred(path, q) for q in _as_list(v.get("filter"))]
        shoulds = [_elem_pred(path, q) for q in _as_list(v.get("should"))]
        nots = [_elem_pred(path, q) for q in _as_list(v.get("must_not"))]

        def pred(e):
            c = F.lit(True)
            for m in musts:
                c = c & m(e)
            if shoulds and not musts:
                s = shoulds[0](e)
                for sp in shoulds[1:]:
                    s = s | sp(e)
                c = c & s
            for np_ in nots:
                c = c & ~np_(e)
            return c

        return pred
    raise ValueError(
        f"nested query supports term/range/exists/bool leaves, got {kind!r}"
    )


def _fetch_fields(
    spark: SparkSession, index_root: str, body: dict, out: DataFrame
) -> DataFrame:
    """``_source`` / ``fields`` retrieval: join the ≤k hits back to the docs
    store and keep the requested stored columns (ES semantics: a requested
    field the mapping doesn't have is silently absent). ``_source: true`` or
    ``"*"`` returns every stored column; default (no section) keeps the
    hits frame as-is (ids + scores)."""
    src_spec = body.get("_source")
    # docvalue_fields / stored_fields are columnar vs row retrieval in ES;
    # every stored column here IS columnar (parquet), so both merge with
    # the fields section
    fields = (
        _as_list(body.get("fields"))
        + _as_list(body.get("docvalue_fields"))
        + [f for f in _as_list(body.get("stored_fields")) if f != "_none_"]
    )
    script_fields = body.get("script_fields") or {}
    want: list[str] | None = None
    if isinstance(src_spec, dict):
        # ES _source filtering: includes/excludes glob patterns over the
        # stored columns (resolved against the docs schema — pure metadata)
        import fnmatch
        import os as _os2

        from es_indexer_spark.index import catalog as _cat2

        inc = src_spec.get("includes", ["*"])
        exc = src_spec.get("excludes", [])
        inc = [inc] if isinstance(inc, str) else [str(x) for x in inc]
        exc = [exc] if isinstance(exc, str) else [str(x) for x in exc]
        cols = [
            c for c in spark.read.parquet(
                _os2.path.join(_cat2.resolve(index_root), "docs")).columns
            if c != "docid"
        ]
        want = [
            c for c in cols
            if any(fnmatch.fnmatchcase(c, p) for p in inc)
            and not any(fnmatch.fnmatchcase(c, p) for p in exc)
        ]
    elif isinstance(src_spec, list):
        want = [str(f) for f in src_spec]
    elif src_spec is True:
        want = ["*"]
    if fields:
        want = (want or []) + [
            str(f["field"] if isinstance(f, dict) else f) for f in fields
        ]
    if not want and not script_fields:
        return out
    import os as _os

    from es_indexer_spark.index import catalog as _cat
    from es_indexer_spark.query.engine import fetch_docs

    vdir = _cat.resolve(index_root)
    doc_cols = spark.read.parquet(_os.path.join(vdir, "docs")).columns
    want = want or []
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
    # ES script_fields: per-hit computed values — the Painless slot takes a
    # Catalyst SQL expression over the full fetched doc row (same
    # translation stance as runtime_mappings / script_score), evaluated on
    # the ≤k-row page only
    from pyspark.sql import functions as F

    for name, sspec in script_fields.items():
        script = sspec.get("script") if isinstance(sspec, dict) else sspec
        src = script.get("source") if isinstance(script, dict) else script
        if not src:
            raise ValueError(f"script_fields {name!r} needs script.source")
        fetched = fetched.withColumn(name, F.expr(str(src)))
        keep.append(name)
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
        from es_indexer_spark.analysis.tokenizer import tokenize_one
        from es_indexer_spark.index import catalog as _cat
        from es_indexer_spark.query.highlight import highlight_hits

        stats = _cat.read_stats(_cat.resolve(index_root))

        def _texts(node) -> list[str]:
            """Collect the highlightable clause texts of a query node: the
            match / match_phrase / term texts (bool walks its scoring and
            filter clauses — ES highlights every matched term)."""
            nk, nv = _one(node, "highlight query")
            if nk in ("match", "match_phrase", "match_phrase_prefix",
                      "match_bool_prefix"):
                sp = _field_query(nv)
                if "query" not in sp:
                    _f, fs2 = _one(sp, nk)
                    sp = _field_query(fs2)
                return [str(sp["query"])]
            if nk in ("multi_match", "combined_fields"):
                # the raw query text; every analyzed term highlights
                # (ES's unified highlighter is analysis-based too)
                return [str(nv["query"])]
            if nk == "term":
                _f, tv = _one(nv, "term")
                return [str(tv["value"] if isinstance(tv, dict) else tv)]
            if nk == "bool":
                out2: list[str] = []
                for sect in ("must", "should", "filter"):
                    for c in _as_list(nv.get(sect)):
                        ck, _cv = _one(c, f"bool.{sect}")
                        if ck in ("match", "match_phrase",
                                  "match_phrase_prefix", "match_bool_prefix",
                                  "multi_match", "combined_fields", "term"):
                            out2.extend(_texts(c))
                return out2
            raise ValueError(
                "highlight supports match(+phrase/bool prefix) / "
                "multi_match / combined_fields / term / bool queries, "
                f"got {nk!r}"
            )

        terms = sorted({
            t
            for txt in _texts(qnode)
            for t in tokenize_one(txt, stats["tokenizer"], lang=lang)
        })
        # ES nests options per field under highlight.fields; the index has
        # one content field, so a single fields entry merges over the
        # top-level options (per-field wins, ES's own precedence)
        hopts = dict(hl)
        hfields = hl.get("fields")
        if isinstance(hfields, dict):
            if len(hfields) != 1:
                raise ValueError(
                    "highlight.fields supports exactly one field (the "
                    "indexed content field)"
                )
            hopts.update(next(iter(hfields.values())) or {})
        out = highlight_hits(
            out, src_df, src_id_col, src_text_col, terms,
            fragment_size=int(hopts.get("fragment_size", 160)),
            pre_tag=(hopts.get("pre_tags") or ["<em>"])[0],
            post_tag=(hopts.get("post_tags") or ["</em>"])[0],
            number_of_fragments=int(hopts.get("number_of_fragments", 1)),
            no_match_size=int(hopts.get("no_match_size", 0)),
        )
    if body.get("explain"):
        # ES explain=true: every hit carries its score breakdown. One batched
        # explain_many job for ALL k hits (never k _explain calls); the
        # per-term rows fold into a deterministic term-sorted JSON column
        from pyspark.sql import functions as F

        from es_indexer_spark.query.engine import explain_many

        kind, v = _one(qnode, "query")
        if kind != "match":
            raise ValueError(
                "explain supports a match main query — other shapes: call "
                "query/engine.py explain_many on the hit ids yourself"
            )
        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        hits = out.collect()
        if hits:
            from pyspark.sql.types import IntegerType

            schema = out.schema.add("_hit_rank", IntegerType())
            out = spark.createDataFrame(
                [(*r, i) for i, r in enumerate(hits)], schema
            )
            br = explain_many(
                spark, index_root, str(mspec["query"]),
                [r["docid"] for r in hits], lang=lang,
            )
            expl = br.groupBy("docid").agg(
                F.to_json(
                    F.sort_array(
                        F.collect_list(
                            F.struct("term", "tf", "df", "idf", "contribution")
                        )
                    )
                ).alias("explanation")
            )
            out = (
                out.join(F.broadcast(expl), "docid", "left")
                .orderBy("_hit_rank")
                .drop("_hit_rank")
            )
    out = _fetch_fields(spark, index_root, body, out)
    tth = body.get("track_total_hits")
    if tth:
        # ES hits.total: opt-in exact (true) or bounded (int N — accurate up
        # to N, then N with relation "gte"); the count is the same
        # map-combined k=None count _count runs, one extra scalar job only
        # when asked for, exactly the ES cost model
        from pyspark.sql import functions as F

        from es_indexer_spark.query.dsl_aggs import count_query

        total = int(
            count_query(spark, index_root, {"query": qnode}, lang=lang)
            .collect()[0][0]
        )
        if tth is True:
            value, rel = total, "eq"
        else:
            bound = int(tth)
            value, rel = min(total, bound), ("eq" if total <= bound else "gte")
        out = (
            out.withColumn("total_value", F.lit(value).cast("long"))
            .withColumn("total_relation", F.lit(rel))
        )
    return out.offset(from_) if from_ else out


# every body section search() dispatches (aggs keys included: they get the
# pointer-to-aggregations error, not "unknown")
_KNOWN_BODY_KEYS = frozenset((
    "query", "knn", "retriever", "aggs", "aggregations", "size", "from",
    "sort", "search_after", "min_score", "_source", "fields",
    "docvalue_fields", "stored_fields", "script_fields", "highlight",
    "collapse", "suggest", "rescore", "explain", "track_total_hits",
    "post_filter", "runtime_mappings",
))
# ES body keys this engine deliberately does not implement — raise with the
# reason, never silently ignore (same contract as unknown query kinds)
_UNSUPPORTED_BODY_KEYS = {
    "profile": "use .explain()/tools/plan_audit.py — Spark's plan IS the profile",
    "terminate_after": "per-shard early termination is approximate by design "
                       "in ES; use size/track_total_hits bounds instead",
    "timeout": "no partial-result mode — cancel the Spark job instead",
    "indices_boost": "one index per call — boost at the query level",
    "seq_no_primary_term": "no per-doc seq_no; versions are index generations",
    "version": "no per-doc versions; versions are index generations",
    "track_scores": "scores are always computed on the sort path already",
    "stats": "use the Spark UI / metrics sink for request tagging",
}


def _check_body_keys(body: dict) -> None:
    for k in body:
        if k in _KNOWN_BODY_KEYS:
            continue
        if k in _UNSUPPORTED_BODY_KEYS:
            raise ValueError(
                f"body key {k!r} is not supported: {_UNSUPPORTED_BODY_KEYS[k]}"
            )
        raise ValueError(
            f"unknown body key {k!r} (supported: "
            f"{', '.join(sorted(_KNOWN_BODY_KEYS))})"
        )


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
    geo_root: str | None = None,
    shape_df: DataFrame | None = None,
    nested_df: DataFrame | None = None,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """Run an ES request body against the index. Returns the hits frame the
    matching engine function produces (``docid`` + ``score`` [+ sort / tf
    columns]). ``emb_df`` backs the ``knn`` section; ``more_like_this``
    takes its like as raw text (fetch stored source text for a like._id).

    Non-postings backings (each raises by name when its query kind appears
    without it): ``geo_root`` = a ``write_geo_index`` path for
    ``geo_bounding_box`` / ``geo_distance`` (cell frames, not scored hits);
    ``shape_df`` = a ``write_shape_index`` / ``assemble_shapes`` frame for
    ``geo_shape``; ``nested_df`` = the table carrying the array-of-struct
    column for ``nested`` (returns the filtered parent rows, ES filter
    context); ``queries_df`` = the stored-query table for ``percolate``.
    ``multi_match`` / ``combined_fields`` expect ``index_root`` to be a
    ``build_multi_index`` layout."""
    from es_indexer_spark.query.boolean import bool_query

    if not isinstance(body, dict):
        raise ValueError("body must be a dict (the parsed JSON request)")
    _check_body_keys(body)
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
    if body.get("post_filter") is not None:
        # ES post_filter: restricts the HITS but never the aggregations —
        # and the aggs half is a separate call in this engine
        # (dsl_aggs.aggregations ignores post_filter by construction), so
        # for the hits it conjoins as one more filter-context clause in the
        # SAME scan set. ES applies it before pagination; so does this.
        if qnode is None:
            qnode = {"bool": {"filter": [body["post_filter"]]}}
        elif next(iter(qnode)) == "bool":
            b = dict(qnode["bool"])
            b["filter"] = _as_list(b.get("filter")) + [body["post_filter"]]
            qnode = {"bool": b}
        else:
            qnode = {"bool": {"must": [qnode],
                              "filter": [body["post_filter"]]}}
    if qnode is None and knn_spec is None:
        qnode = {"match_all": {}}

    rnode = body.get("retriever")
    if rnode is not None:
        # ES 8.14+ composable retriever tree (standard / knn / rrf) — the
        # modern replacement for the top-level query/knn pair; mixing is an
        # ES 400 and a ValueError here
        if body.get("query") is not None or body.get("knn") is not None:
            raise ValueError(
                "retriever cannot be combined with a top-level query/knn "
                "section (the ES contract)"
            )
        from es_indexer_spark.query.retriever import retriever_hits

        out = retriever_hits(
            spark, index_root, rnode, size + from_,
            emb_df=emb_df, emb_id_col=emb_id_col, emb_vec_col=emb_vec_col,
            lang=lang, src_df=src_df, src_id_col=src_id_col,
            src_text_col=src_text_col, geo_root=geo_root, shape_df=shape_df,
            nested_df=nested_df, queries_df=queries_df,
        )
        # response sections: a standard root exposes its query node (so
        # highlight / track_total_hits see the real query); other roots
        # present as match_all
        (rk, rspec), = rnode.items()
        qhl = (
            rspec.get("query")
            if rk == "standard" and isinstance(rspec, dict)
            else None
        ) or {"match_all": {}}
        return _finish(spark, index_root, body, out, from_, qhl,
                       src_df, src_id_col, src_text_col, lang)

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
            qtext, matches = "", None
            if kind == "match":
                mspec = _field_query(v)
                if "query" not in mspec:
                    _fn, fspec = _one(mspec, "match")
                    mspec = _field_query(fspec)
                qtext = str(mspec["query"])
            elif kind == "bool":
                # any k=None-capable query feeds its full match set in as
                # the hybrid text side
                matches = bool_query(spark, index_root, k=None, lang=lang,
                                     **_bool_kwargs(v))
            elif kind == "match_phrase":
                from es_indexer_spark.query.phrase import phrase_match

                _fn, ps = _one(v, "match_phrase")
                ps = _field_query(ps)
                matches = phrase_match(
                    spark, index_root, str(ps["query"]), k=None,
                    slop=int(ps.get("slop", 0)), lang=lang,
                ).select("docid", "score")
            else:
                raise ValueError(
                    "hybrid knn supports a match / bool / match_phrase "
                    f"query section, got {kind!r}"
                )
            out = knn_hybrid_topk(
                spark, index_root, qtext, emb_df, emb_id_col,
                emb_vec_col, qvec, k=size, knn_k=k,
                knn_boost=float(knn_spec.get("boost", 1.0)), lang=lang,
                matches=matches,
            )
        return out.offset(from_) if from_ else out

    if body.get("sort"):
        from es_indexer_spark.query.boolean import bool_query
        from es_indexer_spark.query.engine import topk_sorted

        kind, v = _one(qnode, "query")
        qtext, matches = "", None
        if kind == "match":
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            qtext = str(mspec["query"])
        elif kind == "match_all":
            qtext = ""
        elif kind == "bool":
            # ES with an explicit sort selects BY THE SORT KEY over the FULL
            # match set — any k=None-capable query feeds its matches in
            try:
                matches = bool_query(spark, index_root, k=None, lang=lang,
                                     **_bool_kwargs(v))
            except ValueError as e:
                from es_indexer_spark.query.composebool import (
                    _is_flatten_error,
                    compose_bool,
                )

                if not _is_flatten_error(e):
                    raise
                matches = compose_bool(spark, index_root, v, k=None,
                                       lang=lang)
        elif kind == "match_phrase":
            from es_indexer_spark.query.phrase import phrase_match

            _fn, ps = _one(v, "match_phrase")
            ps = _field_query(ps)
            matches = phrase_match(
                spark, index_root, str(ps["query"]), k=None,
                slop=int(ps.get("slop", 0)), lang=lang,
            )
        elif kind == "term":
            fname, fv = _one(v, "term")
            val = fv["value"] if isinstance(fv, dict) else fv
            matches = bool_query(spark, index_root, must_raw=[str(val)],
                                 k=None, lang=lang)
        elif kind == "range":
            fname, bounds = _one(v, "range")
            matches = bool_query(
                spark, index_root, k=None, lang=lang,
                filter_range=(fname, {kk: b for kk, b in bounds.items()
                                      if kk in ("gt", "gte", "lt", "lte")}),
            )
        elif kind == "exists":
            matches = bool_query(spark, index_root, k=None, lang=lang,
                                 filter_exists=[str(v["field"])])
        else:
            # any other bool-expressible kind: its full (k=None) match
            # frame through the composed-sub-query seam (round 5k) —
            # kinds the evaluator cannot express still raise by name there
            matches = _subquery_scores(spark, index_root, qnode, lang)
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
            lang=lang, matches=matches,
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
            if mspec.get("fuzzy_transpositions"):
                kw["transpositions"] = True
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
        try:
            out = bool_query(spark, index_root, k=size + from_, lang=lang,
                             **_bool_kwargs(v))
        except ValueError as e:
            # genuinely SCORING nested bools (should groups, msm, boost, De
            # Morgan must_not) don't flatten exactly — evaluate them
            # compositionally (Lucene BooleanQuery-tree sum semantics, each
            # leaf still the one-scan path)
            from es_indexer_spark.query.composebool import (
                _is_flatten_error,
                compose_bool,
            )

            if not _is_flatten_error(e):
                raise
            out = compose_bool(spark, index_root, v, k=size + from_,
                               lang=lang)
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
    elif kind == "script":
        # ES script query: filter-context predicate over stored fields; the
        # Painless slot takes a Catalyst SQL expression (README divergences)
        # evaluated inside the docs-store scan — same translation stance as
        # runtime_mappings / script_score
        from es_indexer_spark.query.lookup import script_query

        sspec = v.get("script")
        src = sspec.get("source") if isinstance(sspec, dict) else sspec
        if not src:
            raise ValueError("script query needs script.source")
        out = script_query(spark, index_root, str(src), size=size + from_)
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
            prefix_length=int(spec.get("prefix_length", 1)),
            max_expansions=int(spec.get("max_expansions", 50)),
            transpositions=bool(spec.get("transpositions", False)),
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
                # any other supported kind: full (docid, score) frame via
                # the compositional seam (round 5h)
                clauses.append(
                    _subquery_scores(spark, index_root, q, lang)
                )
                continue
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
            # any other supported filter shape composes in filter context
            # (stored-field resolution, non-scoring) — round 5h
            kw2["matches"] = _subquery_scores(
                spark, index_root, v["filter"], lang, scored=False
            )
        out = constant_score(spark, index_root, **kw2)
    elif kind == "boosting":
        from es_indexer_spark.query.compound import boosting

        def _text(node, what):
            nk, nv = _one(node, what)
            if nk != "match":
                # composed frame for any other supported kind (round 5h)
                return _subquery_scores(spark, index_root, node, lang)
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
            mspec = {"query": _subquery_scores(spark, index_root,
                                               v["query"], lang)}
        else:
            mspec = _field_query(qv)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
        if v.get("functions") is not None:
            # the general functions-array form: weight+filter entries,
            # field_value_factor, deterministic random_score, and the
            # gauss/exp/linear decay family with score_mode / boost_mode /
            # max_boost (query/compound.py function_score_functions)
            from es_indexer_spark.query.compound import (
                function_score_functions,
            )

            fsq = mspec["query"]
            out = function_score_functions(
                spark, index_root,
                fsq if not isinstance(fsq, str) else str(fsq),
                list(v["functions"]), k=size + from_,
                score_mode=str(v.get("score_mode", "multiply")),
                boost_mode=str(v.get("boost_mode", "multiply")),
                max_boost=(
                    float(v["max_boost"])
                    if v.get("max_boost") is not None else None
                ),
                lang=lang,
            )
            fvf = None
        elif v.get("field_value_factor") is None:
            raise ValueError(
                "function_score needs field_value_factor or a functions array"
            )
        else:
            fvf = v["field_value_factor"]
        if fvf is not None:
            fsq = mspec["query"]
            out = function_score_topk(
                spark, index_root,
                fsq if not isinstance(fsq, str) else str(fsq), fvf["field"],
                k=size + from_, factor=float(fvf.get("factor", 1.0)),
                modifier=str(fvf.get("modifier", "ln1p")),
                boost_mode=str(v.get("boost_mode", "multiply")),
                missing=float(fvf.get("missing", 1.0)), lang=lang,
            )
    elif kind == "script_score":
        from es_indexer_spark.query.engine import script_score_topk

        qk, qv = _one(v["query"], "script_score.query")
        if qk != "match":
            ssq = _subquery_scores(spark, index_root, v["query"], lang)
        else:
            mspec = _field_query(qv)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            ssq = str(mspec["query"])
        script = v["script"]["source"] if isinstance(v.get("script"), dict) else v["script"]
        out = script_score_topk(
            spark, index_root, ssq, str(script),
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
            porg = _subquery_scores(spark, index_root, org, lang)
        else:
            mspec = _field_query(ov)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
            porg = str(mspec["query"])
        out = pinned_topk(
            spark, index_root, [int(i) for i in v["ids"]],
            porg, k=size + from_, lang=lang,
        )
    elif kind == "span_near":
        from es_indexer_spark.query.phrase import span_multi_near, span_near

        clauses, slop, order = _span_parts({"span_near": v})
        if any("*" in c for c in clauses):
            # a span_multi clause: route through the expansion-slot chain
            # (equals span_near exactly when no slot is a wildcard)
            out = span_multi_near(
                spark, index_root, clauses, slop=slop, in_order=order,
                k=size + from_, lang=lang,
            )
        else:
            out = span_near(
                spark, index_root, clauses, slop=slop, in_order=order,
                k=size + from_, lang=lang,
            )
    elif kind == "span_or":
        from es_indexer_spark.query.phrase import span_or

        out = span_or(
            spark, index_root, [_span_leaf(c) for c in v["clauses"]],
            k=size + from_, lang=lang,
        )
    elif kind == "span_not":
        from es_indexer_spark.query.phrase import span_not

        out = span_not(
            spark, index_root, _span_leaf(v["include"]), _span_leaf(v["exclude"]),
            pre=int(v.get("pre", v.get("dist", 0))),
            post=int(v.get("post", v.get("dist", 0))),
            k=size + from_, lang=lang,
        )
    elif kind == "span_first":
        from es_indexer_spark.query.phrase import span_first

        clauses, slop, order = _span_parts(v["match"])
        out = span_first(
            spark, index_root, clauses, int(v["end"]),
            slop=slop, in_order=order, k=size + from_, lang=lang,
        )
    elif kind == "span_containing":
        from es_indexer_spark.query.intervals import span_containing

        big, bslop, _order = _span_parts(v["big"])
        out = span_containing(
            spark, index_root, big, _span_leaf(v["little"]),
            slop=bslop, k=size + from_, lang=lang,
        )
    elif kind == "span_within":
        from es_indexer_spark.query.intervals import span_within

        big, bslop, _order = _span_parts(v["big"])
        out = span_within(
            spark, index_root, _span_leaf(v["little"]), big,
            slop=bslop, k=size + from_, lang=lang,
        )
    elif kind == "terms_set":
        from es_indexer_spark.query.compound import terms_set

        fname, ts = _one(v, "terms_set")
        if "minimum_should_match_field" in ts:
            expr = str(ts["minimum_should_match_field"])
        elif "minimum_should_match_script" in ts:
            # Catalyst SQL expression in the Painless slot (the repo-wide
            # script convention — runtime_mappings/script_score do the same)
            expr = str(ts["minimum_should_match_script"]["source"])
        else:
            raise ValueError(
                "terms_set needs minimum_should_match_field or "
                "minimum_should_match_script"
            )
        out = terms_set(
            spark, index_root, [str(x) for x in ts["terms"]],
            minimum_should_match_expr=expr, k=size + from_, lang=lang,
        )
    elif kind == "match_bool_prefix":
        from es_indexer_spark.query.compound import match_bool_prefix

        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match_bool_prefix")
            mspec = _field_query(fspec)
        out = match_bool_prefix(
            spark, index_root, str(mspec["query"]), k=size + from_,
            max_expansions=int(mspec.get("max_expansions", 50)), lang=lang,
        )
    elif kind == "multi_match":
        from es_indexer_spark.query.multifield import multi_match

        mt = str(v.get("type", "most_fields"))
        if mt == "bool_prefix":
            from es_indexer_spark.query.compound import match_bool_prefix

            out = match_bool_prefix(
                spark, index_root, str(v["query"]), k=size + from_,
                max_expansions=int(v.get("max_expansions", 50)), lang=lang,
            )
        elif mt in ("phrase", "phrase_prefix"):
            from es_indexer_spark.query.multifield import multi_match_phrase

            out = multi_match_phrase(
                spark, index_root, str(v["query"]),
                boosts=_parse_fields_boosts(v.get("fields") or []),
                k=size + from_,
                tie_breaker=float(v.get("tie_breaker", 0.0)),
                prefix=(mt == "phrase_prefix"),
                slop=int(v.get("slop", 0)),
                max_expansions=int(v.get("max_expansions", 50)), lang=lang,
            )
        else:
            out = multi_match(
                spark, index_root, str(v["query"]),
                boosts=_parse_fields_boosts(v.get("fields") or []),
                k=size + from_, match_type=mt,
                tie_breaker=float(v.get("tie_breaker", 0.0)), lang=lang,
            )
    elif kind == "combined_fields":
        from es_indexer_spark.query.multifield import combined_fields

        out = combined_fields(
            spark, index_root, str(v["query"]),
            weights=_parse_fields_boosts(v.get("fields") or []),
            k=size + from_, lang=lang,
        )
    elif kind == "geo_bounding_box":
        from es_indexer_spark.ops.geoindex import geo_bbox_query

        if geo_root is None:
            raise ValueError(
                "geo_bounding_box needs geo_root (a write_geo_index path)"
            )
        fname, gb = _one(
            {k2: v2 for k2, v2 in v.items()
             if k2 not in ("type", "validation_method")},
            "geo_bounding_box",
        )
        tl, br = gb["top_left"], gb["bottom_right"]
        out = geo_bbox_query(
            spark, geo_root,
            (float(tl["lon"]), float(br["lat"]),
             float(br["lon"]), float(tl["lat"])),
        )
        return (
            out.orderBy("collection", "month", "lon", "lat")
            .offset(from_).limit(size)
        )
    elif kind == "geo_distance":
        from es_indexer_spark.ops.geoindex import geo_distance_query

        if geo_root is None:
            raise ValueError(
                "geo_distance needs geo_root (a write_geo_index path)"
            )
        pt_spec = {k2: v2 for k2, v2 in v.items()
                   if k2 not in ("distance", "distance_type",
                                 "validation_method")}
        fname, pt = _one(pt_spec, "geo_distance point")
        out = geo_distance_query(
            spark, geo_root, float(pt["lon"]), float(pt["lat"]),
            _distance_km(v["distance"]),
        )
        return (
            out.orderBy("collection", "month", "lon", "lat")
            .offset(from_).limit(size)
        )
    elif kind == "geo_shape":
        from es_indexer_spark.ops.geoshape import shape_relate_polygon

        if shape_df is None:
            raise ValueError(
                "geo_shape needs shape_df (a write_shape_index / "
                "assemble_shapes frame)"
            )
        fname, gs = _one(v, "geo_shape")
        shp = gs["shape"]
        stype = str(shp.get("type", "")).lower()
        if stype == "envelope":
            (w, n), (e, s) = shp["coordinates"]
            rings = [[(float(w), float(s)), (float(e), float(s)),
                      (float(e), float(n)), (float(w), float(n))]]
        elif stype == "polygon":
            rings = [
                [(float(x), float(y)) for x, y in ring]
                for ring in shp["coordinates"]
            ]
        else:
            raise ValueError(
                f"geo_shape supports envelope/polygon query shapes, got "
                f"{stype!r}"
            )
        out = shape_relate_polygon(
            shape_df, rings, relation=str(gs.get("relation", "intersects")),
        )
        return out.orderBy("doc_id", "geom_idx").offset(from_).limit(size)
    elif kind == "nested":
        from es_indexer_spark.query.nested import nested_query

        if nested_df is None:
            raise ValueError(
                "nested needs nested_df (the table carrying the "
                "array-of-struct column)"
            )
        path = str(v["path"])
        # ES filter context over parent rows: the full match set is returned
        # (no scoring rank to truncate deterministically)
        return nested_query(nested_df, path, _elem_pred(path, v["query"]))
    elif kind == "percolate":
        from es_indexer_spark.query.percolate import percolate

        if queries_df is None:
            raise ValueError(
                "percolate needs queries_df (the stored-query table: "
                "query_id + analyzed must/should/must_not arrays)"
            )
        docs = v.get("documents") or _as_list(v.get("document"))
        if not docs:
            raise ValueError("percolate needs document or documents")
        field = str(v.get("field", "text"))
        rows = [
            {"doc_id": i, "text": str(d[field])} for i, d in enumerate(docs)
        ]
        cand = spark.createDataFrame(rows, "doc_id long, text string")
        return percolate(queries_df, cand)
    elif kind in ("has_child", "has_parent", "parent_id"):
        raise ValueError(
            f"{kind} joins two tables — call es_indexer_spark.query.nested."
            f"{kind if kind != 'parent_id' else 'parent_id_query'} with the "
            "parent and child DataFrames directly"
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
    if body.get("collapse") is not None:
        # one best hit per distinct value of a stored field; lowered onto
        # the rank-window collapse (per-group top-1, no global ranking
        # materialization) — the match-query shape ES clients send
        cfield = str(body["collapse"]["field"])
        if kind != "match":
            # any bool-expressible main query collapses: its full match
            # frame feeds the rank window through the composed-sub-query
            # seam (round 5k)
            mspec = {"query": _subquery_scores(spark, index_root, qnode,
                                               lang)}
        else:
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
        from es_indexer_spark.query.engine import collapse_topk

        # collapse.inner_hits: the per-group expansion rides along with a
        # hit_rank column (ES default size 3); flattened rows instead of
        # the nested inner_hits envelope
        ih = body["collapse"].get("inner_hits") or {}
        cq = mspec["query"]
        out = collapse_topk(
            spark, index_root,
            cq if not isinstance(cq, str) else str(cq), cfield,
            k=size + from_, lang=lang,
            inner_hits=int(ih.get("size", 3)) if ih else 0,
        )
    if body.get("rescore") is not None:
        # the native rescorer is the phrase-window form: a match main query
        # re-ranked by a match_phrase rescore_query (ES score_mode=total)
        rs = body["rescore"]
        rq = (rs.get("query") or {})
        rnode = rq.get("rescore_query")
        if rnode is None:
            raise ValueError(
                "rescore needs query.rescore_query (a match_phrase — the "
                "native phrase-window rescorer)"
            )
        rkind, rv = _one(rnode, "rescore_query")
        if rkind != "match_phrase":
            raise ValueError(
                f"rescore_query supports match_phrase, got {rkind!r}"
            )
        if kind != "match":
            # any bool-expressible main query rescopes: its full match
            # frame supplies the window (composed-sub-query seam, round 5k)
            mspec = {"query": _subquery_scores(spark, index_root, qnode,
                                               lang)}
        else:
            mspec = _field_query(v)
            if "query" not in mspec:
                _fn, fspec = _one(mspec, "match")
                mspec = _field_query(fspec)
        _fn, ps = _one(rv, "match_phrase")
        ps = _field_query(ps)
        from es_indexer_spark.query.engine import rescore_phrase

        rqv = mspec["query"]
        out = rescore_phrase(
            spark, index_root,
            rqv if not isinstance(rqv, str) else str(rqv), str(ps["query"]),
            k=size + from_,
            window_size=int(rs.get("window_size", 10)),
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_query_weight=float(rq.get("rescore_query_weight", 1.0)),
            slop=int(ps.get("slop", 0)), lang=lang,
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


def validate_query(
    spark: SparkSession, index_root: str, body: dict, **kwargs
) -> dict:
    """ES ``_validate/query``: check that the request body parses and
    lowers onto the engine without executing it. Builds the (lazy) plan —
    dictionary point-reads may run, the scoring job never does — and maps
    any lowering failure to ``{"valid": False, "error": "<name>: <msg>"}``,
    the ES ``explanations[].error`` shape. ``kwargs`` forward to
    :func:`search` (emb_df / geo_root / nested_df / ... backings)."""
    from pyspark.errors import AnalysisException

    try:
        search(spark, index_root, body, **kwargs)
        return {"valid": True, "error": None}
    except (ValueError, KeyError, TypeError, AnalysisException) as e:
        # AnalysisException: Catalyst rejected the lowered plan — e.g. a
        # script/runtime expression naming a missing stored field; ES
        # reports that as valid=false too (unknown fields fail validation)
        return {"valid": False, "error": f"{type(e).__name__}: {e}"}


def suggest(
    spark: SparkSession, index_root: str, body: dict
) -> dict[str, DataFrame]:
    """The request-body ``suggest`` section: ``{name: spec}`` where spec is
    the ES ``term`` suggester (did-you-mean over the dictionary —
    ``{"text": ..., "term": {...}}``) or the ``completion`` suggester
    (``{"prefix": ..., "completion": {...}}``; a ``fuzzy`` sub-object routes
    to the typo-tolerant expansion). Returns one DataFrame per named
    suggester — the engine functions the section lowers onto are the
    oracle-checked ``suggest_terms`` / ``suggest_prefix`` /
    ``suggest_fuzzy`` / ``suggest_phrase`` (the phrase suggester measures
    its bigram language model from the positional index — round 5h; a
    positions-less index raises by name)."""
    section = body.get("suggest", body)
    if not isinstance(section, dict) or not section:
        raise ValueError("suggest needs a non-empty {name: spec} object")
    out: dict[str, DataFrame] = {}
    for name, spec in section.items():
        if not isinstance(spec, dict):
            raise ValueError(f"suggester {name!r} spec must be an object")
        if "term" in spec:
            from es_indexer_spark.query.suggest import suggest_terms

            t = spec["term"]
            out[name] = suggest_terms(
                spark, index_root, str(spec["text"]),
                max_edits=int(t.get("max_edits", 2)),
                prefix_length=int(t.get("prefix_length", 1)),
                size=int(t.get("size", 5)),
                suggest_mode=str(t.get("suggest_mode", "missing")),
                min_word_length=int(t.get("min_word_length", 4)),
                string_distance=str(t.get("string_distance", "levenshtein")),
                sort=str(t.get("sort", "score")),
            )
        elif "completion" in spec:
            c = spec["completion"]
            size = int(c.get("size", 5))
            if c.get("contexts"):
                # ES category contexts: filter completions to docs whose
                # context field holds one of the requested values (backed by
                # the build_completion_contexts artifact)
                if "fuzzy" in c:
                    raise ValueError(
                        "contexts + fuzzy completion is not supported — "
                        "use contexts with an exact prefix"
                    )
                ctxs = c["contexts"]
                if not isinstance(ctxs, dict) or len(ctxs) != 1:
                    raise ValueError(
                        "contexts must carry exactly one {field: values} pair"
                    )
                from es_indexer_spark.query.suggest import suggest_prefix_ctx

                (cfield, cvals), = ctxs.items()
                vals = [
                    v["context"] if isinstance(v, dict) else v
                    for v in _as_list(cvals)
                ]
                out[name] = suggest_prefix_ctx(
                    spark, index_root, str(spec["prefix"]), str(cfield),
                    [str(v) for v in vals], k=size,
                )
            elif c.get("fuzzy"):
                from es_indexer_spark.query.suggest import suggest_fuzzy

                fz = c["fuzzy"] if isinstance(c["fuzzy"], dict) else {}
                out[name] = suggest_fuzzy(
                    spark, index_root, str(spec["prefix"]),
                    fuzziness=int(fz.get("fuzziness", 1)), k=size,
                    transpositions=bool(fz.get("transpositions", False)),
                )
            else:
                from es_indexer_spark.query.suggest import suggest_prefix

                out[name] = suggest_prefix(
                    spark, index_root, str(spec["prefix"]), k=size
                )
        elif "phrase" in spec:
            from es_indexer_spark.query.suggest import suggest_phrase

            p = spec["phrase"]
            # ES nests generator knobs under direct_generator[0]
            gen = (p.get("direct_generator") or [{}])[0]
            out[name] = suggest_phrase(
                spark, index_root, str(spec["text"]),
                size=int(p.get("size", 5)),
                max_edits=int(gen.get("max_edits", 2)),
                prefix_length=int(gen.get("prefix_length", 1)),
                candidates_per_term=int(gen.get("num_candidates", 5)),
                real_word_error_likelihood=float(
                    p.get("real_word_error_likelihood", 0.95)
                ),
                confidence=float(p.get("confidence", 1.0)),
            )
        else:
            raise ValueError(
                f"suggester {name!r} must be term/completion/phrase"
            )
    return out


def msearch(
    spark: SparkSession,
    index_root: str,
    bodies: list[dict],
    *,
    lang: str | None = None,
    **kwargs,
) -> list[DataFrame]:
    """ES ``_msearch``: run several request bodies in one call.

    Scale path: when EVERY body is a plain relevance ``match`` query (no
    sort / knn / rescore / fuzziness / response sections), the whole batch
    routes through :func:`~es_indexer_spark.query.engine.topk_many` — ONE
    dictionary lookup + ONE postings scan for all queries (the engine's
    msearch amortization, rank-identical to per-query topk, pytest-pinned)
    — and the per-body frames are split back out of the batch result.
    Any other mix falls back to one :func:`search` dispatch per body (each
    stays lazy; heterogeneous batches keep full DSL coverage).
    """
    from pyspark.sql import functions as F

    def _plain_match(b: dict) -> str | None:
        if not isinstance(b, dict) or set(b) - {"query", "size", "from"}:
            return None
        if int(b.get("from", 0)):
            return None
        q = b.get("query")
        if not isinstance(q, dict) or len(q) != 1 or "match" not in q:
            return None
        spec = _field_query(q["match"])
        if "query" not in spec:
            _fn, fs = _one(spec, "match")
            spec = _field_query(fs)
        if set(spec) - {"query"}:
            return None  # operator/fuzziness/boost change scoring — fall back
        return str(spec["query"])

    texts = [_plain_match(b) for b in bodies]
    if bodies and all(t is not None for t in texts):
        from es_indexer_spark.query.engine import topk_many

        k = max(int(b.get("size", 10)) for b in bodies)
        batch = topk_many(
            spark, index_root,
            {f"q{i}": t for i, t in enumerate(texts)}, k=k, lang=lang,
        ).cache()
        outs = []
        for i, b in enumerate(bodies):
            outs.append(
                batch.filter(F.col("qid") == f"q{i}")
                .select("docid", "score")
                .limit(int(b.get("size", 10)))
            )
        return outs
    return [search(spark, index_root, b, lang=lang, **kwargs) for b in bodies]
