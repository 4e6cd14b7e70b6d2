"""Arbitrarily-nested scoring ``bool`` queries by DataFrame composition.

The one-scan bool evaluator (query/boolean.py) covers every FLAT clause mix
in a single postings scan + a single Arrow stage, and query/dsl.py flattens
the nested shapes that are score-identical under Lucene's summing scorer
(non-scoring inner bools, the ``{bool: {must: [X]}}`` wrapper). What
remained were genuinely SCORING nested bools — a should group with
``minimum_should_match`` inside a must, a boosted sub-bool, De Morgan
``must_not`` over a conjunction — which previously raised by name.

This module evaluates those compositionally, the way Lucene's
BooleanQuery tree actually scores (public semantics):

- every child query is evaluated to its FULL (k=None) ``(docid, score)``
  match frame through the SAME oracle-checked one-scan evaluator — a leaf
  child is a one-clause flat bool, a nested child recurses (flattening
  back onto the one-scan path wherever it can);
- one bool level combines with ONE ``unionByName`` + ONE docid hash
  aggregation: per doc, ``score = Σ child scores``, ``reqc`` counts matched
  required children, ``shc`` counts matched should children; survivors need
  ``reqc == n_required`` and ``shc >= minimum_should_match`` (ES default:
  1 when no required clause exists, else 0);
- ``must_not`` children become ONE anti-join against the union of their
  match frames — which also makes De Morgan shapes (NOT over a conjunction
  or a nested bool) exact for free: the child frame IS the set to exclude;
- ``boost`` multiplies the combined level's score (Lucene BoostQuery);
  ``match_all`` children in must/filter context contribute their constant
  ``boost`` without constraining (ES: match_all scores 1.0 × boost).

Scale shape: each LEAF still costs exactly one term-pruned postings scan
(the flat engine's plan), and each bool LEVEL adds one hash-agg shuffle of
the children's match frames (rows ∝ matches, never corpus-sized for
selective children) plus at most one anti-join. Flat shapes never reach
this module — query/dsl.py routes here only after flattening raises — so
the common case keeps the 2-Exchange plan (PLANS.md §30).

Reference anchor: the portal's search surface is ES bool DSL
(geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120); nested bool
scoring follows public Lucene BooleanQuery/BoostQuery semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

_FLATTEN_MARKERS = ("nested bool", "flatten", "disjunction", "De Morgan")


def _is_flatten_error(e: ValueError) -> bool:
    msg = str(e)
    return any(m in msg for m in _FLATTEN_MARKERS)


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _one(d: dict, what: str):
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"{what} must be a single-key object, got {d!r}")
    return next(iter(d.items()))


def _flat_scores(
    spark: SparkSession, index_root: str, spec: dict, lang: str | None
) -> DataFrame:
    """The one-scan path for a FLATTENABLE bool spec — raises the flatten
    ValueError for shapes that need composition."""
    from es_indexer_spark.query.boolean import bool_query
    from es_indexer_spark.query.dsl import _bool_kwargs

    kw = _bool_kwargs(spec)
    return bool_query(spark, index_root, k=None, lang=lang, **kw).select(
        "docid", "score"
    )


def _leaf_scores(
    spark: SparkSession,
    index_root: str,
    node: dict,
    lang: str | None,
    scored: bool,
) -> DataFrame:
    """A non-bool child query as its full ``(docid, score)`` match frame —
    a one-clause flat bool, so every leaf kind keeps its exact flat-path
    semantics and plan. Context matters for field resolution (the engine's
    pinned divergence): a SCORING leaf lowers as ``must`` (``term``/``terms``
    address the indexed content), a NON-SCORING leaf lowers as ``filter``
    (``term``/``terms``/``range``/``exists`` address stored fields)."""
    dest = "must" if scored else "filter"
    return _flat_scores(spark, index_root, {dest: [node]}, lang)


def compose_scores(
    spark: SparkSession,
    index_root: str,
    spec: dict,
    *,
    lang: str | None = None,
    scored: bool = True,
) -> DataFrame:
    """Full ``(docid, score)`` match frame of a bool ``spec`` (the value
    under the ``"bool"`` key), arbitrary nesting allowed. Tries the one-scan
    flat path first; composes only when flattening raises.

    ``scored=False`` evaluates the subtree in FILTER context: every score is
    0, ``must`` children are equivalent to ``filter`` children (Lucene drops
    scoring in filter context), leaves resolve fields the filter-context way,
    and ``boost`` is ignored (a no-op in ES filter context)."""
    boost = float(spec.get("boost", 1.0))
    inner = {k: v for k, v in spec.items() if k != "boost"}
    if not scored:
        if inner.get("should") or inner.get("minimum_should_match") is not None:
            # a should group in filter context is a (non-scoring)
            # disjunction — only the compositional path expresses it
            return _compose_level(spark, index_root, inner, lang, False)
        nspec = {
            "filter": _as_list(inner.get("filter")) + _as_list(inner.get("must")),
            "must_not": _as_list(inner.get("must_not")),
        }
        try:
            return _flat_scores(spark, index_root, nspec, lang)
        except ValueError as e:
            if not _is_flatten_error(e):
                raise
            return _compose_level(spark, index_root, inner, lang, False)
    try:
        out = _flat_scores(spark, index_root, inner, lang)
    except ValueError as e:
        if not _is_flatten_error(e):
            raise
        out = _compose_level(spark, index_root, inner, lang, True)
    if boost != 1.0:
        out = out.select(
            "docid", (F.col("score") * F.lit(boost)).alias("score")
        )
    return out


def _child_scores(
    spark: SparkSession,
    index_root: str,
    node: dict,
    lang: str | None,
    scored: bool,
) -> DataFrame:
    kind, v = _one(node, "bool child")
    if kind == "bool":
        f = compose_scores(spark, index_root, v, lang=lang, scored=scored)
    else:
        f = _leaf_scores(spark, index_root, node, lang, scored)
    if not scored:
        # filter / must_not context is non-scoring in ES no matter what the
        # child would score
        f = f.select("docid", F.lit(0.0).alias("score"))
    return f


def _compose_level(
    spark: SparkSession,
    index_root: str,
    spec: dict,
    lang: str | None,
    scored: bool = True,
) -> DataFrame:
    from es_indexer_spark.query.boolean import parse_minimum_should_match

    must = _as_list(spec.get("must"))
    filt = _as_list(spec.get("filter"))
    should = _as_list(spec.get("should"))
    must_not = _as_list(spec.get("must_not"))

    req_frames: list[DataFrame] = []
    const_add = 0.0
    for c in must:
        kind, v = _one(c, "bool.must entry")
        if kind == "match_all":
            if scored:  # filter context never scores, even match_all
                const_add += float((v or {}).get("boost", 1.0))
            continue
        req_frames.append(_child_scores(spark, index_root, c, lang, scored))
    for c in filt:
        kind, v = _one(c, "bool.filter entry")
        if kind == "match_all":
            continue
        req_frames.append(_child_scores(spark, index_root, c, lang, False))
    sh_frames = []
    for c in should:
        kind, _v = _one(c, "bool.should entry")
        if kind == "match_all":
            raise ValueError(
                "match_all in should context matches everything — lift it "
                "out of the bool (it would force a corpus-sized frame)"
            )
        sh_frames.append(_child_scores(spark, index_root, c, lang, scored))
    neg_frames = [
        _child_scores(spark, index_root, c, lang, False) for c in must_not
    ]

    if not req_frames and not sh_frames:
        raise ValueError(
            "a composed bool needs at least one non-match_all positive "
            "clause (pure-negative / pure-match_all bools match ~everything "
            "— use match_all with a top-level must_not, or the flat path)"
        )

    msm_spec = spec.get("minimum_should_match")
    if msm_spec is None:
        # Lucene default: 1 for a pure-should bool, 0 once required context
        # exists (match_all musts count as required context, like ES)
        msm_eff = 1 if (not must and not filt and sh_frames) else 0
    else:
        # same resolution as the flat engine: strings/negatives clamp,
        # positive raw ints stay unclamped (msm > clause count ⇒ empty)
        msm_eff = parse_minimum_should_match(msm_spec, len(sh_frames))

    tagged = [
        f.select(
            "docid",
            F.col("score").cast("double").alias("score"),
            F.lit(1).alias("req"),
            F.lit(0).alias("sh"),
        )
        for f in req_frames
    ] + [
        f.select(
            "docid",
            F.col("score").cast("double").alias("score"),
            F.lit(0).alias("req"),
            F.lit(1).alias("sh"),
        )
        for f in sh_frames
    ]
    u = reduce(DataFrame.unionByName, tagged)
    g = (
        u.groupBy("docid")
        .agg(
            F.sum("score").alias("score"),
            F.sum("req").alias("reqc"),
            F.sum("sh").alias("shc"),
        )
        .filter(
            (F.col("reqc") == F.lit(len(req_frames)))
            & (F.col("shc") >= F.lit(msm_eff))
        )
        .select("docid", "score")
    )
    if neg_frames:
        nu = reduce(
            DataFrame.unionByName, [n.select("docid") for n in neg_frames]
        )
        g = g.join(nu.distinct(), "docid", "left_anti")
    if const_add:
        g = g.select(
            "docid", (F.col("score") + F.lit(const_add)).alias("score")
        )
    return g


def compose_bool(
    spark: SparkSession,
    index_root: str,
    spec: dict,
    *,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """Top-k (or ``k=None`` full) results of an arbitrarily-nested bool
    ``spec``. Distributed end-to-end: children are full match frames, the
    ranking is a global ORDER BY over the combined frame (rows ∝ matches)."""
    out = compose_scores(spark, index_root, spec, lang=lang).orderBy(
        F.desc("score"), F.asc("docid")
    )
    return out.limit(k) if k is not None else out
