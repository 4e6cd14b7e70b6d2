"""ES request-body ``aggs`` section for the JSON DSL layer.

The reference's portal builds every facet/summary panel by POSTing a body
with a ``query`` AND an ``aggs`` section (GeoNetworkServiceImpl and the
portal UI send ``terms`` facets plus metric sub-aggregations next to the
search itself; see `stacmodel/.../portal_records_index_schema.json` for the
aggregatable keyword fields). :func:`search` only covers the hits; this
module runs the ``aggs`` half: ``aggregations(spark, root, body)`` returns
one bucket table per top-level aggregation name.

ES semantics reproduced:

- aggregations run over the FULL match set of ``query`` (not the top-k
  ``size`` page — ES users send ``"size": 0`` for agg-only requests), with
  ``match_all`` when no query is given;
- bucket families: ``terms`` (+``size``/``missing``), ``multi_terms``,
  ``histogram`` / ``date_histogram`` (+``min_doc_count``), ``range`` /
  ``date_range`` (request-ordered, overlap allowed), ``filters`` (named
  predicate buckets), ``filter`` (single-predicate subset, children ride
  the pushed scan), ``missing``, ``composite`` (keyset-paginated),
  ``rare_terms`` (stored-keyword long tail), ``adjacency_matrix``,
  ``auto_date_histogram``, ``global`` / ``significant_terms`` /
  ``sampler`` / ``diversified_sampler`` (entry-level: they need the full
  corpus, the match set as a foreground flag, or the postings engine's
  scored sample — see the entry-context section);
- metric sub-aggregations (``aggs`` inside a bucket agg): ``avg`` / ``sum``
  / ``min`` / ``max`` / ``value_count`` / ``cardinality`` / ``stats`` /
  ``extended_stats`` / ``percentiles`` / ``percentile_ranks`` /
  ``weighted_avg`` / ``top_metrics`` (size 1) / ``geo_bounds`` /
  ``geo_centroid`` — multi-valued families flatten to ``{name}_{stat}``
  columns (a DataFrame row is the bucket object); frame-shaped metric
  families (``boxplot`` / ``string_stats`` / ``median_absolute_deviation``
  / ``t_test`` / ``matrix_stats``) run top-level only;
- sibling pipeline aggregations (top-level, ``buckets_path``
  ``"sibling>metric"``): ``avg_bucket`` / ``min_bucket`` / ``max_bucket``
  / ``sum_bucket`` / ``stats_bucket`` / ``extended_stats_bucket`` /
  ``percentiles_bucket`` / ``normalize`` — computed over the sibling's
  already-reduced bucket frame, never a second corpus pass;
- pipeline sub-aggregations under a histogram parent: ``derivative`` /
  ``cumulative_sum`` / ``moving_fn`` (unweightedAvg) / ``serial_diff`` /
  ``bucket_script`` / ``bucket_selector`` / ``bucket_sort``, applied in
  request order like ES;
- one level of bucket-in-bucket nesting: a ``terms`` child under a
  ``histogram``/``date_histogram`` parent (per-parent top-``size``
  buckets), and under a ``terms`` parent a ``terms`` /``histogram``/
  ``date_histogram`` child (two hash aggs over the same scan + a bounded
  per-parent window — ``_terms_nested_bucket``); ``composite`` takes
  metric children on its paginated buckets.

Spark-first shape — this is why the module exists rather than a loop over
the per-family functions in :mod:`es_indexer_spark.query.aggs`: a bucket
aggregation WITH its metric children compiles to ONE ``groupBy(...).agg()``
(partial+final hash agg, one corpus pass no matter how many metrics the
request carries), ``range``/``filters`` compile to ONE conditional-aggregate
pass + a ``stack`` unpivot (never a scan per bucket), and the nested-terms
case is ONE composite-key hash agg + a bounded per-parent window. The
query's match set joins in as a ``left_semi`` (AQE broadcasts the small hit
sets). Pipeline children run over the bucket table only (bounded by the
interval, never corpus-sized — same note as ``query/aggs.py``).

Unsupported shapes raise ``ValueError`` naming the construct, never a
silent mis-parse (same contract as :func:`es_indexer_spark.query.dsl.search`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

_INTERVALS = ("year", "quarter", "month", "week", "day", "hour", "minute")

_METRIC_FAMILIES = (
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "extended_stats", "percentiles", "weighted_avg", "percentile_ranks",
    "top_metrics", "geo_bounds", "geo_centroid",
)
_PIPELINE_FAMILIES = (
    "derivative", "cumulative_sum", "moving_fn", "serial_diff",
    "bucket_script", "bucket_selector", "bucket_sort",
)
_BUCKET_FAMILIES = (
    "terms", "multi_terms", "histogram", "date_histogram", "range",
    "filters", "missing", "filter", "composite", "rare_terms", "date_range",
    "adjacency_matrix", "auto_date_histogram", "geotile_grid",
    "geohash_grid", "geo_distance",
)
# multi-row / multi-pass metric families: top-level only (their frames are
# not (name, expression) pairs, so they cannot ride inside a bucket groupBy)
_FRAME_METRICS = (
    "boxplot", "string_stats", "median_absolute_deviation", "t_test",
    "matrix_stats",
)
# sibling pipeline aggregations: top-level, referencing another top-level
# bucket agg's per-bucket metric via buckets_path "sibling>metric"
_SIBLING_PIPELINES = (
    "avg_bucket", "min_bucket", "max_bucket", "sum_bucket", "stats_bucket",
    "extended_stats_bucket", "percentiles_bucket", "normalize",
)


# --------------------------------------------------------------- match set


def match_docids(
    spark: SparkSession,
    index_root: str,
    qnode: dict | None,
    *,
    lang: str | None = None,
) -> DataFrame | None:
    """The FULL match set (``docid`` column) of a request-body ``query``
    node — filter context, every match, fully distributed (``k=None`` legs,
    never a top-k truncation). ``None`` means "the whole live docs store"
    (``match_all`` / absent query) so the caller can skip the join."""
    from es_indexer_spark.query.dsl import _bool_kwargs, _field_query, _one

    if qnode is None:
        return None
    kind, v = _one(qnode, "query")
    if kind == "match_all":
        return None
    if kind == "match":
        from es_indexer_spark.query.boolean import bool_query

        mspec = _field_query(v)
        if "query" not in mspec:
            _fn, fspec = _one(mspec, "match")
            mspec = _field_query(fspec)
        text = str(mspec["query"])
        operator = str(mspec.get("operator", "or")).lower()
        kw = {"must": [text]} if operator == "and" else {"should": [text]}
        return bool_query(spark, index_root, k=None, lang=lang, **kw).select("docid")
    if kind == "bool":
        from es_indexer_spark.query.boolean import bool_query

        try:
            return bool_query(
                spark, index_root, k=None, lang=lang, **_bool_kwargs(v)
            ).select("docid")
        except ValueError as e:
            from es_indexer_spark.query.composebool import (
                _is_flatten_error,
                compose_bool,
            )

            if not _is_flatten_error(e):
                raise
            return compose_bool(
                spark, index_root, v, k=None, lang=lang
            ).select("docid")
    if kind == "match_phrase":
        from es_indexer_spark.query.phrase import phrase_match

        _fn, ps = _one(v, "match_phrase")
        ps = _field_query(ps)
        return phrase_match(
            spark, index_root, str(ps["query"]), k=None,
            slop=int(ps.get("slop", 0)), lang=lang,
        ).select("docid")
    if kind in ("term", "terms"):
        from es_indexer_spark.query.lookup import term_query, terms_query

        fname, fv = _one(v, kind)
        if kind == "term":
            val = fv["value"] if isinstance(fv, dict) else fv
            return term_query(spark, index_root, fname, val).select("docid")
        return terms_query(spark, index_root, fname, list(fv)).select("docid")
    if kind == "range":
        from es_indexer_spark.query.lookup import range_query

        fname, bounds = _one(v, "range")
        return range_query(
            spark, index_root, fname,
            {k: b for k, b in bounds.items() if k in ("gt", "gte", "lt", "lte")},
        ).select("docid")
    if kind == "exists":
        from es_indexer_spark.query.lookup import exists_query

        return exists_query(spark, index_root, v["field"]).select("docid")
    raise ValueError(
        "aggregations query supports match_all/match/bool/match_phrase/"
        f"term/terms/range/exists (filter context), got {kind!r}"
    )


# ----------------------------------------------------------------- metrics


def _src(field: str, cond: Column | None) -> Column:
    c = F.col(field)
    return F.when(cond, c) if cond is not None else c


def _top_metrics_sort(spec: dict) -> tuple[str, str]:
    """(sort_col, "asc"|"desc") from a top_metrics ``sort`` option."""
    sspec = spec.get("sort")
    if isinstance(sspec, str):
        return sspec, "asc"
    if isinstance(sspec, dict) and len(sspec) == 1:
        sort_col, o = next(iter(sspec.items()))
        order = o.get("order", "asc") if isinstance(o, dict) else str(o)
        return sort_col, order
    raise ValueError("top_metrics needs sort: {field: asc|desc}")


def _metric_pairs(
    name: str,
    fam: str,
    spec: dict,
    *,
    cond: Column | None = None,
    exact: bool = False,
) -> list[tuple[str, Column]]:
    """Compile one metric sub-aggregation to ``(output_name, unaliased
    aggregate expression)`` pairs. All order-dependent floating results round
    to 6 digits (replay-stable under parallel reduce, same rule as
    ``stats_agg``). ``cond`` restricts the metric to a conditional bucket
    (range/filters) — aggregate functions ignore the NULLs the ``when``
    injects, which IS the bucket filter."""
    if fam == "weighted_avg":
        vspec, wspec = spec.get("value"), spec.get("weight")
        if not (isinstance(vspec, dict) and isinstance(wspec, dict)):
            raise ValueError("weighted_avg needs value.field and weight.field")
        v = F.col(vspec["field"]).cast("double")
        w = F.col(wspec["field"]).cast("double")
        ok = v.isNotNull() & w.isNotNull()
        if cond is not None:
            ok = ok & cond
        return [
            (name, F.round(F.sum(F.when(ok, v * w)) / F.sum(F.when(ok, w)), 6))
        ]
    if fam == "top_metrics":
        # ES top_metrics: metric values from the doc with the most extreme
        # sort value — ONE max_by/min_by pair per metric, so it rides inside
        # any bucket groupBy (size>1 needs a window; use the direct
        # aggs.top_metrics_agg function for that)
        if int(spec.get("size", 1)) != 1:
            raise ValueError(
                "top_metrics size > 1 rides top-level only (a TakeOrdered) "
                "— under a bucket agg use size 1, or aggs.top_metrics_agg"
            )
        sort_col, order = _top_metrics_sort(spec)
        mlist = spec.get("metrics") or []
        if isinstance(mlist, dict):
            mlist = [mlist]
        if not mlist:
            raise ValueError("top_metrics needs a metrics list of {field}")
        sc = F.col(sort_col)
        if cond is not None:
            sc = F.when(cond, sc)
        pick = F.max_by if order == "desc" else F.min_by
        return [
            (f"{name}_{m['field']}", pick(_src(m["field"], cond), sc))
            for m in mlist
        ]
    if fam == "geo_bounds":
        # ES geo_bounds over a (lon, lat) column pair — no geo_point type in
        # the docs store, so the request names the columns (divergence note
        # in aggs.geo_bounds; wrap_longitude needs the 6-extreme pick — use
        # the direct function)
        if spec.get("wrap_longitude"):
            raise ValueError(
                "geo_bounds wrap_longitude rides top-level only (it needs a "
                "post-aggregation projection) — under a bucket agg drop it, "
                "or use aggs.geo_bounds per bucket subset"
            )
        lon = _src(spec.get("lon_field", "lon"), cond).cast("double")
        lat = _src(spec.get("lat_field", "lat"), cond).cast("double")
        return [
            (f"{name}_top", F.max(lat)),
            (f"{name}_bottom", F.min(lat)),
            (f"{name}_left", F.min(lon)),
            (f"{name}_right", F.max(lon)),
        ]
    if fam == "geo_centroid":
        lon = _src(spec.get("lon_field", "lon"), cond).cast("double")
        lat = _src(spec.get("lat_field", "lat"), cond).cast("double")
        return [
            (f"{name}_lon", F.round(F.avg(lon), 6)),
            (f"{name}_lat", F.round(F.avg(lat), 6)),
            (f"{name}_count", F.count(lon)),
        ]
    field = spec.get("field")
    if not field:
        raise ValueError(f"metric {fam!r} ({name}) needs a field")
    s = _src(field, cond)
    if fam == "avg":
        return [(name, F.round(F.avg(s), 6))]
    if fam == "sum":
        return [(name, F.round(F.sum(s), 6))]
    if fam == "min":
        return [(name, F.min(s))]
    if fam == "max":
        return [(name, F.max(s))]
    if fam == "value_count":
        return [(name, F.count(s))]
    if fam == "cardinality":
        agg = (
            F.count_distinct(s)
            if exact
            else F.approx_count_distinct(s, float(spec.get("rsd", 0.05)))
        )
        return [(name, agg)]
    if fam == "stats":
        return [
            (f"{name}_count", F.count(s)),
            (f"{name}_min", F.min(s)),
            (f"{name}_max", F.max(s)),
            (f"{name}_avg", F.round(F.avg(s), 6)),
            (f"{name}_sum", F.round(F.sum(s), 6)),
        ]
    if fam == "extended_stats":
        d = s.cast("double")
        return [
            (f"{name}_count", F.count(d)),
            (f"{name}_min", F.min(d)),
            (f"{name}_max", F.max(d)),
            (f"{name}_avg", F.round(F.avg(d), 6)),
            (f"{name}_sum", F.round(F.sum(d), 6)),
            (f"{name}_sum_of_squares", F.round(F.sum(d * d), 4)),
            (f"{name}_variance", F.round(F.var_pop(d), 4)),
            (f"{name}_std_deviation", F.round(F.stddev_pop(d), 4)),
        ]
    if fam == "percentiles":
        percents = [float(p) for p in spec.get("percents", (25.0, 50.0, 75.0, 95.0, 99.0))]
        out = []
        for p in percents:
            q = (
                F.percentile(s, F.lit(p / 100.0))
                if exact
                else F.percentile_approx(s, F.lit(p / 100.0))
            )
            key = f"{p:g}".replace(".", "_")
            out.append((f"{name}_p{key}", F.round(q, 6)))
        return out
    if fam == "percentile_ranks":
        # exact empirical CDF (ES's is the t-digest approximation) — one
        # conditional sum per requested value, same single pass
        values = spec.get("values")
        if not values:
            raise ValueError("percentile_ranks needs a values list")
        d = s.cast("double")
        out = []
        for v in values:
            key = f"{float(v):g}".replace(".", "_").replace("-", "m")
            out.append((
                f"{name}_{key}",
                F.round(
                    F.lit(100.0)
                    * F.sum(F.when(d <= F.lit(float(v)), 1).otherwise(0))
                    / F.count(d),
                    6,
                ),
            ))
        return out
    raise ValueError(f"unsupported metric aggregation: {fam!r}")


def _metric_exprs(
    name: str,
    fam: str,
    spec: dict,
    *,
    cond: Column | None = None,
    exact: bool = False,
) -> list[Column]:
    return [
        e.alias(n)
        for n, e in _metric_pairs(name, fam, spec, cond=cond, exact=exact)
    ]


def _split_children(children: dict) -> tuple[list, list, list]:
    """(metrics, pipelines, buckets) from a sub-``aggs`` dict, each as
    (name, family, spec) in request order."""
    metrics, pipelines, buckets = [], [], []
    for cname, cnode in children.items():
        fams = [k for k in cnode if k not in ("aggs", "aggregations", "meta")]
        if len(fams) != 1:
            raise ValueError(f"sub-aggregation {cname!r} must have one family")
        fam = fams[0]
        if fam in _METRIC_FAMILIES:
            if cnode.get("aggs") or cnode.get("aggregations"):
                raise ValueError(f"metric sub-agg {cname!r} cannot nest aggs")
            metrics.append((cname, fam, cnode[fam]))
        elif fam in _PIPELINE_FAMILIES:
            pipelines.append((cname, fam, cnode[fam]))
        elif fam in ("terms", "top_hits", "histogram", "date_histogram"):
            buckets.append((cname, fam, cnode))
        else:
            raise ValueError(f"unsupported sub-aggregation family: {fam!r}")
    return metrics, pipelines, buckets


# ------------------------------------------------------------ bucket nodes


def _leaf_cond(node: dict) -> Column:
    """A ``filters`` bucket predicate: a leaf query over STORED meta columns
    compiled to a Catalyst condition (keyword semantics — the text field
    needs the postings engine and is rejected by name)."""
    from es_indexer_spark.query.dsl import _one

    kind, v = _one(node, "filters entry")
    if kind == "term":
        fname, fv = _one(v, "term")
        val = fv["value"] if isinstance(fv, dict) else fv
        return F.col(fname) == F.lit(val)
    if kind == "terms":
        fname, vals = _one(v, "terms")
        return F.col(fname).isin(list(vals))
    if kind == "range":
        fname, bounds = _one(v, "range")
        ops = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}
        cond = F.lit(True)
        for k, b in bounds.items():
            if k in ops:
                cond = cond & getattr(F.col(fname), ops[k])(F.lit(b))
        return cond
    if kind == "exists":
        return F.col(v["field"]).isNotNull()
    if kind == "wildcard":
        import re as _re

        from es_indexer_spark.query.dsl import _field_query

        fname, fspec = _one(v, "wildcard")
        wspec = _field_query(fspec, "value")
        rx = "^" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in str(wspec["value"])
        ) + "$"
        return F.col(fname).rlike(rx)
    raise ValueError(
        f"filters buckets support term/range/exists/wildcard leaves, got "
        f"{kind!r} (a match predicate needs the postings engine — put it "
        "in the query)"
    )


def _range_key(lo, hi) -> str:
    return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"


def _conditional_buckets(
    df: DataFrame,
    conds: list[tuple[str, Column]],
    metrics: list,
    exact: bool,
) -> DataFrame:
    """range/filters core: ONE conditional-aggregate pass (a column set per
    bucket), then a ``stack`` unpivot back to ES's bucket-list shape in
    request order. Buckets may overlap, exactly like ES."""
    aggs, per_bucket_cols, metric_names = [], [], []
    for i, (key, cond) in enumerate(conds):
        cols = [f"__c{i}"]
        aggs.append(F.sum(cond.cast("long")).alias(f"__c{i}"))
        for mname, mfam, mspec in metrics:
            for base, e in _metric_pairs(mname, mfam, mspec, cond=cond, exact=exact):
                cols.append(f"__m{i}__{base}")
                aggs.append(e.alias(f"__m{i}__{base}"))
                if i == 0:
                    metric_names.append(base)
        per_bucket_cols.append((key, cols))
    row = df.agg(*aggs)
    out_cols = ["key", "doc_count", *metric_names, "_ord"]
    stack_rows = []
    for i, (key, cols) in enumerate(per_bucket_cols):
        vals = ", ".join([f"'{key}'", f"bigint(`{cols[0]}`)"]
                         + [f"double(`{c}`)" for c in cols[1:]] + [str(i)])
        stack_rows.append(vals)
    stack_expr = (
        f"stack({len(per_bucket_cols)}, {', '.join(stack_rows)}) as "
        f"({', '.join(f'`{c}`' for c in out_cols)})"
    )
    return row.selectExpr(stack_expr).orderBy("_ord").drop("_ord")


_FIXED_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _fixed_interval_seconds(spec_val: str) -> int:
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", str(spec_val))
    if not m or m.group(2) == "ms" or int(m.group(1)) == 0:
        raise ValueError(
            f"fixed_interval {spec_val!r}: a positive count of s/m/h/d"
        )
    return int(m.group(1)) * _FIXED_UNIT_SECONDS[m.group(2)]


_TS_LITERAL_RE = re.compile(
    r"\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?"
)


def _ts_literal(v) -> str:
    """A bounds value as a safe Spark timestamp literal (the value lands
    inside an expr string — validate the shape, never interpolate raw)."""
    s = str(v)
    if not _TS_LITERAL_RE.fullmatch(s):
        raise ValueError(f"not a date/timestamp literal: {v!r}")
    return f"timestamp'{s}'"


def _date_offset_seconds(spec_val) -> int:
    m = re.fullmatch(r"([+-]?)(\d+)(s|m|h|d)", str(spec_val))
    if not m:
        raise ValueError(
            f"date_histogram offset {spec_val!r}: expected ±<n><s|m|h|d>"
        )
    sign = -1 if m.group(1) == "-" else 1
    return sign * int(m.group(2)) * _FIXED_UNIT_SECONDS[m.group(3)]


def _bucket_key(fam: str, spec: dict) -> Column:
    if fam == "histogram":
        interval = float(spec["interval"])
        if not interval > 0:
            raise ValueError("histogram interval must be > 0")
        # ES offset: shift the bucket grid, not the values — bucket =
        # floor((x - offset) / interval) * interval + offset
        off = float(spec.get("offset", 0.0))
        return (
            F.floor((F.col(spec["field"]) - F.lit(off)) / F.lit(interval))
            * F.lit(interval) + F.lit(off)
        ).alias("bucket")
    off = _date_offset_seconds(spec["offset"]) if spec.get("offset") else 0
    c = F.col(spec["field"])
    if spec.get("fixed_interval") is not None:
        # ES fixed_interval: epoch-aligned constant-width buckets (calendar
        # rules don't apply) — floor(epoch / width) * width, pure column math
        secs = _fixed_interval_seconds(spec["fixed_interval"])
        return F.timestamp_seconds(
            F.floor((F.unix_timestamp(c) - F.lit(off)) / F.lit(secs))
            * F.lit(secs) + F.lit(off)
        ).alias("bucket")
    interval = str(spec.get("calendar_interval", spec.get("interval", "month")))
    if interval not in _INTERVALS:
        raise ValueError(f"date_histogram interval must be one of {_INTERVALS}")
    trunc = F.date_trunc(
        interval, F.timestamp_seconds(F.unix_timestamp(c) - F.lit(off))
    ) if off else F.date_trunc(interval, c)
    if off:
        return F.timestamp_seconds(
            F.unix_timestamp(trunc) + F.lit(off)
        ).alias("bucket")
    return trunc.alias("bucket")


def _bucket_spine(df: DataFrame, fam: str, spec: dict) -> DataFrame:
    """min_doc_count=0 empty-bucket fill: every bucket between the
    extended_bounds, generated closed-form with ``sequence`` (one literal
    row exploded — never a scan) and LEFT-joined by the histogram branch.
    ES requires extended_bounds to emit buckets outside the data range; we
    require it for the fill itself so the spine never depends on a separate
    min/max pass over the data."""
    eb = spec.get("extended_bounds")
    if not isinstance(eb, dict) or "min" not in eb or "max" not in eb:
        raise ValueError(
            "min_doc_count: 0 needs extended_bounds {min, max} — the empty-"
            "bucket spine must be closed-form, not a second data pass"
        )
    one = df.sparkSession.range(1)
    if fam == "histogram":
        # offset shifts the grid exactly like _bucket_key: the spine must
        # land on the same shifted boundaries or the left join misses
        interval = float(spec["interval"])
        off = float(spec.get("offset", 0.0))
        lo = (float(eb["min"]) - off) // interval * interval + off
        hi = (float(eb["max"]) - off) // interval * interval + off
        n = int((hi - lo) / interval) + 1
        return df.sparkSession.range(n).select(
            (F.lit(lo) + F.col("id") * F.lit(interval)).alias("bucket")
        )
    off = _date_offset_seconds(spec["offset"]) if spec.get("offset") else 0
    lo_ts, hi_ts = _ts_literal(eb["min"]), _ts_literal(eb["max"])
    if spec.get("fixed_interval") is not None:
        secs = _fixed_interval_seconds(spec["fixed_interval"])
        lo = (f"timestamp_seconds(floor((unix_timestamp({lo_ts}) - {off})"
              f" / {secs}) * {secs} + {off})")
        hi = (f"timestamp_seconds(floor((unix_timestamp({hi_ts}) - {off})"
              f" / {secs}) * {secs} + {off})")
        seq = F.expr(f"sequence({lo}, {hi}, interval {secs} second)")
        return one.select(F.explode(seq).alias("bucket"))
    unit = str(spec.get("calendar_interval", spec.get("interval", "month")))
    if unit not in _INTERVALS:
        raise ValueError(
            f"date_histogram interval must be one of {_INTERVALS}")
    if off:
        # same shift-trunc-unshift as _bucket_key (plain arithmetic — an
        # `interval` literal would not take a signed variable)
        seq = F.expr(
            f"sequence("
            f"date_trunc('{unit}', timestamp_seconds(unix_timestamp({lo_ts}) - {off})), "
            f"date_trunc('{unit}', timestamp_seconds(unix_timestamp({hi_ts}) - {off})), "
            f"interval 1 {unit})"
        )
        return one.select(F.explode(seq).alias("__b")).select(
            F.timestamp_seconds(
                F.unix_timestamp(F.col("__b")) + F.lit(off)
            ).alias("bucket")
        )
    seq = F.expr(
        f"sequence(date_trunc('{unit}', {lo_ts}), "
        f"date_trunc('{unit}', {hi_ts}), "
        f"interval 1 {unit})"
    )
    return one.select(F.explode(seq).alias("bucket"))


def _apply_pipelines(buckets: DataFrame, pipelines: list) -> DataFrame:
    """Pipeline sub-aggs over the parent's bucket table, request order (ES
    applies bucket_sort last; senders already list it last)."""
    from es_indexer_spark.query import aggs as A

    out = buckets
    for name, fam, spec in pipelines:
        path = spec.get("buckets_path")
        metric = None
        if isinstance(path, str):
            metric = "doc_count" if path == "_count" else path
        if fam == "derivative":
            out = A.derivative(out, metric).withColumnRenamed(
                f"{metric}_deriv", name)
        elif fam == "cumulative_sum":
            out = A.cumulative_sum(out, metric).withColumnRenamed(
                f"{metric}_cumsum", name)
        elif fam == "moving_fn":
            script = str(spec.get("script", ""))
            if "unweightedAvg" not in script:
                raise ValueError(
                    "moving_fn supports MovingFunctions.unweightedAvg"
                )
            out = A.moving_avg(
                out, metric, window=int(spec.get("window", 5))
            ).withColumnRenamed(f"{metric}_mavg", name)
            out = out.withColumn(name, F.round(F.col(name), 6))
        elif fam == "serial_diff":
            lag = int(spec.get("lag", 1))
            out = A.serial_diff(out, metric, lag=lag).withColumnRenamed(
                f"{metric}_diff_{lag}", name)
        elif fam == "bucket_script":
            expr = str(spec["script"])
            for pname, col in (path or {}).items():
                ref = "doc_count" if col == "_count" else col
                expr = re.sub(rf"\bparams\.{re.escape(pname)}\b", f"`{ref}`", expr)
            out = A.bucket_script(out, expr, name=name)
            out = out.withColumn(name, F.round(F.col(name), 6))
        elif fam == "bucket_selector":
            expr = str(spec["script"])
            for pname, col in (path or {}).items():
                ref = "doc_count" if col == "_count" else col
                expr = re.sub(rf"\bparams\.{re.escape(pname)}\b", f"`{ref}`", expr)
            out = A.bucket_selector(out, expr)
        elif fam == "bucket_sort":
            sort = []
            for s in spec.get("sort", []):
                if isinstance(s, str):
                    sort.append((s, "asc"))
                else:
                    c, sspec = next(iter(s.items()))
                    sort.append(
                        (c, sspec.get("order", "asc") if isinstance(sspec, dict) else sspec)
                    )
            out = A.bucket_sort(
                out, sort or [("bucket", "asc")],
                size=spec.get("size"), from_=int(spec.get("from", 0)),
            )
        else:  # pragma: no cover — _split_children gates the families
            raise ValueError(f"unsupported pipeline aggregation: {fam!r}")
    return out


def _frame_metric(df: DataFrame, fam: str, spec: dict, exact: bool) -> DataFrame:
    """Top-level-only metric families with multi-row / multi-pass frames —
    thin request-shape adapters over the per-family functions in
    :mod:`es_indexer_spark.query.aggs` (the plans and semantics live there)."""
    from es_indexer_spark.query import aggs as A

    if fam == "boxplot":
        return A.boxplot_agg(df, spec["field"])
    if fam == "string_stats":
        return A.string_stats_agg(df, spec["field"])
    if fam == "median_absolute_deviation":
        return A.median_absolute_deviation(df, spec["field"], exact=exact)
    if fam == "t_test":
        # simplified request shape (divergence note in aggs.t_test_agg):
        # {field, group_field, a, b[, type]} — ES's per-side filter objects
        # reduce to one group column with two values
        for k in ("field", "group_field", "a", "b"):
            if k not in spec:
                raise ValueError(f"t_test needs {k!r}")
        return A.t_test_agg(
            df, spec["field"], spec["group_field"], spec["a"], spec["b"],
            test_type=str(spec.get("type", "heteroscedastic")),
        )
    # matrix_stats
    fields = spec.get("fields")
    if not isinstance(fields, list) or len(fields) < 2:
        raise ValueError("matrix_stats needs a fields list (>= 2)")
    return A.matrix_stats_agg(df, fields)


def _terms_nested_bucket(
    df: DataFrame, spec: dict, parent_metrics: list,
    child: tuple, exact: bool,
) -> DataFrame:
    """One bucket agg nested under a ``terms`` parent — ES's everyday
    two-level facet ("per lang, top sources" / "per repo, monthly counts").

    Two hash aggs over the same pushed scan, zero driver collects:

    1. the parent's own top-``size`` bucket frame (the exact single-level
       terms path, order/include/exclude/metrics included) — bounded at
       ``size`` rows;
    2. one composite-key groupBy on (parent key, child key) over the same
       match frame, inner-joined to the surviving parent buckets
       (broadcast — that side is ``size`` rows), then, for a terms child,
       a bounded per-parent rank window for the child's top-``size``.

    The flattened frame is one row per (parent, child) bucket: parent
    ``key`` + ``parent_doc_count`` (+ parent metric columns), child
    ``child_key`` (terms) / ``bucket`` (histogram family) + ``doc_count``
    + child metric columns. The inner join keeps pass 2's agg output
    size-bounded even under unbounded parent cardinality."""
    cname, cfam, cnode = child
    cspec = cnode[cfam]
    cmetrics, cpipes, cbuckets = _split_children(
        cnode.get("aggs") or cnode.get("aggregations") or {})
    if cpipes or cbuckets:
        raise ValueError(
            "a bucket child under a terms parent supports metric sub-aggs "
            "only (one level of bucket nesting)")
    parent_node: dict = {"terms": spec}
    if parent_metrics:
        parent_node["aggs"] = {n: {f: s} for n, f, s in parent_metrics}
    parent = _compile_agg(df, "parent", parent_node, exact) \
        .withColumnRenamed("doc_count", "parent_doc_count")
    pkey = F.col(spec["field"])
    if spec.get("missing") is not None:
        pkey = F.coalesce(pkey, F.lit(spec["missing"]))
    cmex = [e for m in cmetrics
            for e in _metric_exprs(m[0], m[1], m[2], exact=exact)]
    base = df
    if cfam == "terms":
        base = base.filter(F.col(cspec["field"]).isNotNull())
        ck = F.col(cspec["field"]).alias("child_key")
        ckn = "child_key"
    else:
        if int(cspec.get("min_doc_count", 1)) == 0:
            raise ValueError(
                "min_doc_count: 0 under a terms parent is not supported — "
                "the empty-bucket spine is per-parent; fill client-side")
        ck = _bucket_key(cfam, cspec)
        ckn = "bucket"
    comp = (
        base.groupBy(pkey.alias("key"), ck)
        .agg(F.count(F.lit(1)).alias("doc_count"), *cmex)
        .join(F.broadcast(parent), "key")
    )
    mdc = int(cspec.get("min_doc_count", 1))
    if mdc > 1:
        comp = comp.filter(F.col("doc_count") >= mdc)
    if cfam == "terms":
        csize = int(cspec.get("size", 10))
        w = Window.partitionBy("key").orderBy(
            F.desc("doc_count"), F.asc("child_key"))
        comp = (
            comp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= csize)
            .drop("__rn")
        )
    # re-apply the parent's order rule (the join loses the frame order),
    # then the child order within each parent bucket
    order = spec.get("order") or {"_count": "desc"}
    if not isinstance(order, dict) or len(order) != 1:
        raise ValueError("terms order must be one {path: asc|desc}")
    opath, odir = next(iter(order.items()))
    ocol = {"_count": "parent_doc_count", "_key": "key"}.get(
        opath, opath.replace(".", "_"))
    ob = [F.asc(ocol) if str(odir) == "asc" else F.desc(ocol)]
    if ocol != "key":
        ob.append(F.asc("key"))
    if cfam == "terms":
        ob += [F.desc("doc_count"), F.asc("child_key")]
    else:
        ob.append(F.asc("bucket"))
    parent_extra = [c for c in parent.columns
                    if c not in ("key", "parent_doc_count")]
    child_extra = [
        c for c in comp.columns
        if c not in {"key", ckn, "doc_count", "parent_doc_count",
                     *parent_extra}
    ]
    return comp.select(
        "key", "parent_doc_count", *parent_extra, ckn, "doc_count",
        *child_extra,
    ).orderBy(*ob)


def _compile_agg(df: DataFrame, name: str, node: dict, exact: bool) -> DataFrame:
    fams = [k for k in node if k not in ("aggs", "aggregations", "meta")]
    if len(fams) != 1:
        raise ValueError(f"aggregation {name!r} must have exactly one family")
    fam = fams[0]
    spec = node[fam]
    children = node.get("aggs") or node.get("aggregations") or {}

    if fam in _METRIC_FAMILIES:
        if children:
            raise ValueError(f"metric aggregation {name!r} cannot nest aggs")
        if fam == "geo_bounds" and spec.get("wrap_longitude"):
            # top-level only: the antimeridian pick is a post-aggregation
            # projection over the 6-extreme state (aggs.geo_bounds)
            from es_indexer_spark.query import aggs as A

            return A.geo_bounds(
                df, spec.get("lon_field", "lon"),
                spec.get("lat_field", "lat"), wrap_longitude=True,
            ).toDF(f"{name}_top", f"{name}_bottom",
                   f"{name}_left", f"{name}_right")
        if fam == "top_metrics" and int(spec.get("size", 1)) > 1:
            # top-level only: size docs by sort extremity — a TakeOrdered,
            # never a full sort (aggs.top_metrics_agg); docid tiebreak for
            # a replay-stable result where ES is shard-order-dependent
            from es_indexer_spark.query import aggs as A

            sort_col, order = _top_metrics_sort(spec)
            mlist = spec.get("metrics") or []
            if isinstance(mlist, dict):
                mlist = [mlist]
            if not mlist:
                raise ValueError("top_metrics needs a metrics list of {field}")
            return A.top_metrics_agg(
                df, sort_col,
                # the sort column leads the result; don't select it twice
                [m["field"] for m in mlist if m["field"] != sort_col],
                size=int(spec["size"]), asc=(order != "desc"),
                tiebreak=("docid",) if "docid" in df.columns else (),
            )
        return df.agg(*_metric_exprs(name, fam, spec, exact=exact))
    if fam in _FRAME_METRICS:
        if children:
            raise ValueError(f"metric aggregation {name!r} cannot nest aggs")
        return _frame_metric(df, fam, spec, exact)
    if fam in _PIPELINE_FAMILIES:
        raise ValueError(
            f"{fam} is a pipeline aggregation — nest it under a histogram/"
            "date_histogram parent"
        )
    if fam in _SIBLING_PIPELINES:
        raise ValueError(
            f"{fam} is a sibling pipeline aggregation — it must sit at the "
            "top level next to the bucket agg its buckets_path names"
        )
    if fam not in _BUCKET_FAMILIES:
        raise ValueError(f"unsupported aggregation family: {fam!r}")

    if fam == "filter":
        # ES single-filter bucket: children aggregate over the predicate's
        # subset — the predicate conjoins into the SAME scan (Catalyst
        # pushes it), never a materialized intermediate
        return _global_like(df.filter(_leaf_cond(spec)), name, node, exact)

    if fam == "composite":
        from es_indexer_spark.query import aggs as A
        from es_indexer_spark.query.dsl import _one

        cmetrics, cpipes, cbuckets = _split_children(children)
        if cpipes or cbuckets:
            raise ValueError(
                "composite sub-aggregations must be metrics — bucket/"
                "pipeline children need a terms/histogram parent"
            )
        sources = spec.get("sources")
        if not isinstance(sources, list) or not sources:
            raise ValueError("composite needs a sources list")
        fields, names = [], []
        for s in sources:
            sname, sdef = _one(s, "composite source")
            skind, sspec = _one(sdef, f"composite source {sname!r}")
            if skind != "terms":
                raise ValueError(
                    f"composite source {sname!r}: only terms sources are "
                    "supported (histogram sources: bucket first, then page)"
                )
            names.append(sname)
            fields.append(sspec["field"])
        after = spec.get("after")
        after_vals = None
        if after is not None:
            missing = [n for n in names if n not in after]
            if missing:
                raise ValueError(f"composite after is missing {missing[0]!r}")
            after_vals = [after[n] for n in names]
        return A.composite_agg(
            df, fields, size=int(spec.get("size", 10)), after=after_vals,
            metric_exprs=[
                e for m in cmetrics
                for e in _metric_exprs(m[0], m[1], m[2], exact=exact)
            ],
        )

    if fam == "rare_terms":
        # stored-keyword long tail: value doc_count <= max_doc_count,
        # ordered count asc / key asc (the indexed-content variant reads the
        # term dictionary — aggs.rare_terms)
        if children:
            raise ValueError("rare_terms supports no sub-aggregations")
        mdc = int(spec.get("max_doc_count", 1))
        return (
            df.filter(F.col(spec["field"]).isNotNull())
            .groupBy(F.col(spec["field"]).alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .filter(F.col("doc_count") <= mdc)
            .orderBy(F.asc("doc_count"), F.asc("key"))
        )

    if fam == "adjacency_matrix":
        from es_indexer_spark.query import aggs as A

        if children:
            raise ValueError("adjacency_matrix supports no sub-aggregations")
        fspecs = spec.get("filters")
        if not isinstance(fspecs, dict) or not fspecs:
            raise ValueError("adjacency_matrix needs a named filters object")
        return A.adjacency_matrix(
            df, {str(n): _leaf_cond(q) for n, q in fspecs.items()}
        )

    if fam == "auto_date_histogram":
        from es_indexer_spark.query import aggs as A

        if children:
            raise ValueError(
                "auto_date_histogram sub-aggregations are not supported — "
                "the interval is data-dependent; use date_histogram"
            )
        return A.auto_date_histogram(
            df, spec["field"], buckets=int(spec.get("buckets", 10))
        )

    if fam in ("geotile_grid", "geohash_grid", "geo_distance"):
        # geo bucket families over a (lon, lat) column pair — same no-
        # geo_point-type convention as the geo metric families (lon_field /
        # lat_field keys; runtime_mappings can synthesize them)
        from es_indexer_spark.query import aggs as A

        if children:
            raise ValueError(f"{fam} supports no sub-aggregations")
        lon = spec.get("lon_field", "lon")
        lat = spec.get("lat_field", "lat")
        if fam == "geo_distance":
            origin = spec.get("origin")
            if not (isinstance(origin, dict)
                    and "lon" in origin and "lat" in origin):
                raise ValueError("geo_distance needs origin {lon, lat}")
            ranges = spec.get("ranges")
            if not ranges:
                raise ValueError("geo_distance needs a ranges list")
            return A.geo_distance_agg(
                df, float(origin["lon"]), float(origin["lat"]),
                [(r.get("from"), r.get("to")) for r in ranges],
                lon_col=lon, lat_col=lat,
            )
        fn = A.geotile_grid if fam == "geotile_grid" else A.geohash_grid
        return fn(
            df, lon, lat,
            precision=int(spec.get("precision",
                                   7 if fam == "geotile_grid" else 5)),
            size=int(spec.get("size", 10)),
        )

    metrics, pipelines, bucket_children = _split_children(children)

    if fam in ("terms", "multi_terms"):
        if pipelines:
            raise ValueError(
                "pipeline sub-aggs need a histogram/date_histogram parent"
            )
        if bucket_children:
            th = [b for b in bucket_children if b[1] == "top_hits"]
            if fam == "terms" and len(bucket_children) == 1 and th \
                    and not metrics:
                # ES top_hits sub-agg: the top-n DOCUMENTS of every bucket —
                # one rank window partitioned by the bucket, never a global
                # sort (aggs.top_hits_by_bucket)
                from es_indexer_spark.query import aggs as A

                _cn, _cf, cnode = th[0]
                hspec = cnode["top_hits"]
                sort = hspec.get("sort")
                if isinstance(sort, list):
                    sort = sort[0] if sort else None
                if not isinstance(sort, dict) or len(sort) != 1:
                    raise ValueError(
                        "top_hits needs sort: [{field: asc|desc}] (ES's "
                        "index-order default is shard-dependent)"
                    )
                scol, sdir = next(iter(sort.items()))
                desc = (sdir.get("order", "asc") if isinstance(sdir, dict)
                        else str(sdir)) == "desc"
                return A.top_hits_by_bucket(
                    df.filter(F.col(spec["field"]).isNotNull()),
                    spec["field"], scol, n=int(hspec.get("size", 3)),
                    descending=desc, tiebreak_col="docid",
                )
            if fam == "terms" and len(bucket_children) == 1 \
                    and bucket_children[0][1] in (
                        "terms", "histogram", "date_histogram"):
                return _terms_nested_bucket(
                    df, spec, metrics, bucket_children[0], exact)
            raise ValueError(
                "bucket nesting under terms supports exactly one terms/"
                "histogram/date_histogram child (or a lone top_hits)")
        size = int(spec.get("size", 10))
        mexprs = [e for m in metrics for e in _metric_exprs(m[0], m[1], m[2], exact=exact)]
        if fam == "terms":
            key = F.col(spec["field"])
            if spec.get("missing") is not None:
                key = F.coalesce(key, F.lit(spec["missing"]))
            grouped = df.filter(key.isNotNull())
            # ES include/exclude: a FULL-match regex or an exact-value list,
            # applied to the key before bucketing (same scan, pushed where
            # the source supports it)
            inc, exc = spec.get("include"), spec.get("exclude")
            for pat, neg in ((inc, False), (exc, True)):
                if pat is None:
                    continue
                if isinstance(pat, list):
                    cond = key.isin(list(pat))
                else:
                    cond = key.cast("string").rlike(f"^(?:{pat})$")
                grouped = grouped.filter(~cond if neg else cond)
            out = grouped.groupBy(key.alias("key")).agg(
                F.count(F.lit(1)).alias("doc_count"), *mexprs
            )
            mdc = int(spec.get("min_doc_count", 1))
            if mdc > 1:
                out = out.filter(F.col("doc_count") >= mdc)
            # ES order option: _count (default desc), _key, or a metric
            # sub-agg's name ("name.stat" for multi-valued families maps to
            # the flattened name_stat column); key asc always tiebreaks
            order = spec.get("order")
            if order is None:
                order = {"_count": "desc"}
            if not isinstance(order, dict) or len(order) != 1:
                raise ValueError("terms order must be one {path: asc|desc}")
            opath, odir = next(iter(order.items()))
            ocol = {"_count": "doc_count", "_key": "key"}.get(
                opath, opath.replace(".", "_"))
            if ocol not in out.columns:
                raise ValueError(
                    f"terms order path {opath!r} is not _count/_key or a "
                    "metric sub-aggregation of this terms agg"
                )
            primary = F.asc(ocol) if str(odir) == "asc" else F.desc(ocol)
            tiebreak = [] if ocol == "key" else [F.asc("key")]
            return out.orderBy(primary, *tiebreak).limit(size)
        terms = spec.get("terms")
        if not isinstance(terms, list) or not terms:
            raise ValueError("multi_terms needs a terms list of {field} entries")
        cols = [t["field"] for t in terms]
        cond = None
        for c in cols:
            n = F.col(c).isNotNull()
            cond = n if cond is None else (cond & n)
        return (
            df.filter(cond)
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("doc_count"), *mexprs)
            .orderBy(F.desc("doc_count"), *[F.asc(c) for c in cols])
            .limit(size)
        )

    if fam in ("histogram", "date_histogram"):
        key = _bucket_key(fam, spec)
        if bucket_children:
            if len(bucket_children) != 1 or metrics or pipelines:
                raise ValueError(
                    "a nested terms child must be the only sub-agg of its "
                    "histogram parent"
                )
            cname, _cfam, cnode = bucket_children[0]
            if _cfam != "terms":
                raise ValueError(
                    f"a {_cfam} child under a histogram parent is not "
                    "supported — nest terms, or invert the nesting"
                )
            cspec = cnode["terms"]
            csize = int(cspec.get("size", 10))
            cmetrics, cpipes, cbuckets = _split_children(
                cnode.get("aggs") or cnode.get("aggregations") or {})
            if cpipes or cbuckets:
                raise ValueError("nested terms children support metric sub-aggs")
            cmex = [e for m in cmetrics
                    for e in _metric_exprs(m[0], m[1], m[2], exact=exact)]
            ckey = F.col(cspec["field"])
            comp = (
                df.filter(ckey.isNotNull())
                .groupBy(key, ckey.alias("key"))
                .agg(F.count(F.lit(1)).alias("doc_count"), *cmex)
            )
            w = Window.partitionBy("bucket").orderBy(
                F.desc("doc_count"), F.asc("key"))
            return (
                comp.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= csize)
                .drop("__rn")
                .orderBy(F.asc("bucket"), F.desc("doc_count"), F.asc("key"))
            )
        mexprs = [e for m in metrics for e in _metric_exprs(m[0], m[1], m[2], exact=exact)]
        out = (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("doc_count"), *mexprs)
            .orderBy("bucket")
        )
        mdc = int(spec.get("min_doc_count", 1))
        if mdc > 1:
            out = out.filter(F.col("doc_count") >= mdc)
        elif mdc == 0:
            # ES min_doc_count: 0 — every bucket in extended_bounds appears,
            # empty ones with doc_count 0 (metrics stay NULL, like ES's
            # null-valued sub-aggs on empty buckets). The spine is a
            # closed-form literal sequence broadcast-joined to the reduced
            # bucket table — bucket-count-sized, never a data pass.
            spine = _bucket_spine(df, fam, spec)
            out = (
                spine.join(out, "bucket", "left")
                .withColumn("doc_count",
                            F.coalesce(F.col("doc_count"), F.lit(0)))
                .orderBy("bucket")
            )
        return _apply_pipelines(out, pipelines)

    if pipelines or bucket_children:
        raise ValueError(f"{fam} supports metric sub-aggs only")
    mexprs_by = lambda cond: [  # noqa: E731
        e for m in metrics for e in _metric_exprs(m[0], m[1], m[2], cond=cond, exact=exact)
    ]
    if fam == "range":
        ranges = spec.get("ranges")
        if not ranges:
            raise ValueError("range needs a ranges list")
        conds = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(spec["field"]) >= float(lo))
            if hi is not None:
                cond = cond & (F.col(spec["field"]) < float(hi))
            conds.append((str(r.get("key", _range_key(lo, hi))), cond))
        return _conditional_buckets(df, conds, metrics, exact)
    if fam == "filters":
        fspecs = spec.get("filters")
        if not isinstance(fspecs, dict) or not fspecs:
            raise ValueError("filters needs a named filters object")
        conds = [(str(n), _leaf_cond(q)) for n, q in fspecs.items()]
        return _conditional_buckets(df, conds, metrics, exact)
    if fam == "date_range":
        # ES date_range: [from, to) half-open timestamp buckets, request
        # order, overlap double-counts — same ONE conditional-sum pass as
        # range, so metric children ride along
        ranges = spec.get("ranges")
        if not ranges:
            raise ValueError("date_range needs a ranges list")
        c = F.col(spec["field"])
        conds = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (c >= F.to_timestamp(F.lit(str(lo))))
            if hi is not None:
                cond = cond & (c < F.to_timestamp(F.lit(str(hi))))
            conds.append((str(r.get("key", _range_key(lo, hi))), cond))
        return _conditional_buckets(df, conds, metrics, exact)
    # missing
    cond = F.col(spec["field"]).isNull()
    mexprs = mexprs_by(None)
    return df.filter(cond).agg(F.count(F.lit(1)).alias("doc_count"), *mexprs)


# ---------------------------------------------------------- runtime fields

# ES runtime-field type -> Spark cast target (ES docs list exactly these)
_RUNTIME_TYPES = {
    "keyword": "string", "long": "long", "double": "double",
    "date": "timestamp", "boolean": "boolean", "ip": "string",
    "geo_point": None, "composite": None,
}


def with_runtime_fields(df: DataFrame, runtime_mappings: dict) -> DataFrame:
    """ES ``runtime_mappings``: query-time computed fields. The script
    ``source`` is a Catalyst SQL expression over the stored columns (same
    Painless-slot translation as ``bucket_script`` — compiled per row by
    Catalyst, no shuffle, evaluated only where the plan needs it). The
    declared ``type`` casts the result like ES's typed emit."""
    out = df
    for name, spec in runtime_mappings.items():
        if not isinstance(spec, dict) or "type" not in spec:
            raise ValueError(f"runtime field {name!r} needs a type")
        rtype = str(spec["type"])
        if rtype not in _RUNTIME_TYPES or _RUNTIME_TYPES[rtype] is None:
            raise ValueError(
                f"runtime field type {rtype!r} not supported (supported: "
                f"{[t for t, c in _RUNTIME_TYPES.items() if c]})"
            )
        script = spec.get("script")
        src = script.get("source") if isinstance(script, dict) else script
        if not src:
            raise ValueError(
                f"runtime field {name!r} needs script.source (a SQL "
                "expression over the stored columns in the Painless slot)"
            )
        out = out.withColumn(
            name, F.expr(str(src)).cast(_RUNTIME_TYPES[rtype])
        )
    return out


def _runtime_leaf(qnode: dict | None, runtime: dict) -> Column | None:
    """A term/range/exists query targeting a RUNTIME field compiles to a
    row predicate over the runtime column (it cannot go through the
    stored-field lookup path, which never sees runtime columns)."""
    if qnode is None or not runtime:
        return None
    from es_indexer_spark.query.dsl import _one

    kind, v = _one(qnode, "query")
    if kind not in ("term", "range", "exists"):
        return None
    field = v["field"] if kind == "exists" else _one(v, kind)[0]
    if field not in runtime:
        return None
    return _leaf_cond(qnode)


# ---------------------------------------------------- entry-context buckets
# Families that need more than the match-set frame: the full corpus
# (global, significant_terms' background), the postings engine (sampler's
# scored candidate set), or another top-level agg's result (sibling
# pipelines). All resolved here so _compile_agg stays a pure function of df.


def _global_like(
    full: DataFrame, name: str, node: dict, exact: bool
) -> DataFrame:
    """``global`` (and the sampler children shape): one nested bucket child
    compiles over the alternate frame, metric children fold into ONE
    aggregate row with the bucket's doc_count."""
    children = node.get("aggs") or node.get("aggregations") or {}
    bkids = {
        n: c for n, c in children.items()
        if next(k for k in c if k not in ("aggs", "aggregations", "meta"))
        not in _METRIC_FAMILIES
    }
    if bkids:
        if len(children) != 1:
            raise ValueError(
                f"{name!r}: one nested bucket agg OR metric children"
            )
        (cname, cnode), = bkids.items()
        return _compile_agg(full, cname, cnode, exact)
    mexprs = [
        e
        for cname, cnode in children.items()
        for cf in [next(k for k in cnode
                        if k not in ("aggs", "aggregations", "meta"))]
        for e in _metric_exprs(cname, cf, cnode[cf], exact=exact)
    ]
    return full.agg(F.count(F.lit(1)).alias("doc_count"), *mexprs)


def _significant_terms_agg(
    full: DataFrame, matched: DataFrame | None, spec: dict
) -> DataFrame:
    """``significant_terms`` over a STORED KEYWORD field (ES's split: the
    analyzed-text variant is ``significant_text`` — aggs.significant_terms
    serves that over a raw text column): values unusually frequent in the
    query's match set vs the whole store, scored with the same published JLH
    heuristic ``(fg_pct - bg_pct) * (fg_pct / bg_pct)``. Needs BOTH frames,
    unlike every other bucket agg — the foreground flag is a left-join
    marker column (broadcast-sized: one docid column), then ONE partial+
    final hash agg over the keyword values (no tokenization, tiny key
    space)."""
    field = spec.get("field")
    if not field:
        raise ValueError("significant_terms needs a field")
    if matched is None:
        # match_all foreground: fg == bg, every JLH score is 0 — ES returns
        # empty buckets; make the degenerate case explicit
        raise ValueError(
            "significant_terms needs a restrictive query — with match_all "
            "the foreground IS the background and every score is 0"
        )
    size = int(spec.get("size", 10))
    min_doc_count = int(spec.get("min_doc_count", 3))
    flagged = full.join(
        matched.select("docid").withColumn("__fg", F.lit(1)),
        "docid", "left",
    ).filter(F.col(field).isNotNull())
    totals = flagged.agg(
        F.coalesce(F.sum("__fg"), F.lit(0)).cast("double").alias("_nf"),
        F.count(F.lit(1)).cast("double").alias("_na"),
    )
    counts = flagged.groupBy(F.col(field).alias("term")).agg(
        F.coalesce(F.sum("__fg"), F.lit(0)).alias("fg_count"),
        F.count(F.lit(1)).alias("bg_count"),
    )
    fg_pct = F.col("fg_count") / F.col("_nf")
    bg_pct = F.col("bg_count") / F.col("_na")
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("fg_count") >= min_doc_count)
        .select(
            "term",
            F.col("fg_count").cast("long").alias("fg_count"),
            F.col("bg_count").cast("long").alias("bg_count"),
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 8).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
    )


def _sampler_agg(
    spark: SparkSession,
    index_root: str,
    full: DataFrame,
    fam: str,
    node: dict,
    exact: bool,
    lang: str | None,
    qnode: dict | None,
) -> DataFrame:
    """``sampler`` / ``diversified_sampler``: children aggregate over the
    best-scoring shard_size matches (the postings engine's top, not a row
    sample). The query must be a scoring ``match`` — a sampler over
    match_all has no score to rank by."""
    from es_indexer_spark.query import aggs as A
    from es_indexer_spark.query.dsl import _field_query, _one

    if qnode is None:
        raise ValueError(f"{fam} needs a scoring match query to sample from")
    kind, v = _one(qnode, "query")
    if kind != "match":
        raise ValueError(
            f"{fam} samples the best-scoring matches — the body query must "
            f"be a match, got {kind!r}"
        )
    mspec = _field_query(v)
    if "query" not in mspec:
        _fn, fspec = _one(mspec, "match")
        mspec = _field_query(fspec)
    spec = node[fam]
    kw: dict = {"lang": lang}
    if fam == "diversified_sampler":
        if not spec.get("field"):
            raise ValueError("diversified_sampler needs a field")
        kw["diversify_field"] = spec["field"]
        kw["max_docs_per_value"] = int(spec.get("max_docs_per_value", 1))
    sample = A.sampler_hits(
        spark, index_root, str(mspec["query"]),
        int(spec.get("shard_size", 100)), **kw,
    )
    children = node.get("aggs") or node.get("aggregations") or {}
    if not children:
        return sample
    sampled = full.join(sample.select("docid"), "docid", "left_semi")
    return _global_like(sampled, fam, node, exact)


def _sibling_pipeline(
    out: dict[str, DataFrame], fam: str, spec: dict
) -> DataFrame:
    """Sibling pipeline aggs over an already-compiled top-level bucket
    frame. ``buckets_path`` is ``"sibling>metric"`` (``_count`` → the
    doc_count column) — resolved against the sibling's OUTPUT columns, so
    metric sub-agg names work unchanged."""
    from es_indexer_spark.query import aggs as A

    path = spec.get("buckets_path")
    if not isinstance(path, str) or ">" not in path:
        raise ValueError(f"{fam} needs buckets_path 'sibling>metric'")
    sib, _, metric = path.partition(">")
    metric = "doc_count" if metric == "_count" else metric
    if sib not in out:
        raise ValueError(
            f"{fam} buckets_path names {sib!r} — not a sibling aggregation "
            "in this request (sibling pipelines cannot reference other "
            "pipelines)"
        )
    frame = out[sib]
    if metric not in frame.columns:
        raise ValueError(f"{fam}: {metric!r} is not a column of {sib!r}")
    bc = "bucket" if "bucket" in frame.columns else (
        "key" if "key" in frame.columns else frame.columns[0]
    )
    if fam == "stats_bucket":
        return A.sibling_bucket_stats(frame, metric, bucket_col=bc)
    if fam in ("min_bucket", "max_bucket"):
        s = A.sibling_bucket_stats(frame, metric, bucket_col=bc)
        side = fam.split("_", 1)[0]
        return s.select(
            F.col(side).alias("value"), F.col(f"{side}_keys").alias("keys")
        )
    if fam in ("avg_bucket", "sum_bucket"):
        s = A.sibling_bucket_stats(frame, metric, bucket_col=bc)
        return s.select(
            F.round(F.col(fam.split("_", 1)[0]), 6).alias("value")
        )
    if fam == "extended_stats_bucket":
        return A.extended_stats_bucket(
            frame, metric, sigma=float(spec.get("sigma", 2.0))
        )
    if fam == "percentiles_bucket":
        percents = [float(p) for p in spec.get(
            "percents", (1, 5, 25, 50, 75, 95, 99))]
        return A.percentiles_bucket(frame, metric, percents)
    # normalize
    method = spec.get("method")
    if not method:
        raise ValueError("normalize needs a method")
    return A.normalize_agg(frame, metric, str(method), bucket_col=bc)


# ------------------------------------------------------------------- entry


def aggregations(
    spark: SparkSession,
    index_root: str,
    body: dict,
    *,
    lang: str | None = None,
    exact: bool = False,
) -> dict[str, DataFrame]:
    """Run the ``aggs`` section of an ES request body against the index:
    one DataFrame per top-level aggregation name, each computed over the
    full match set of ``body["query"]`` (the live docs store for
    ``match_all``). ``exact=True`` switches cardinality/percentiles from
    the mergeable sketches (the ES path and the 100 TB default) to exact
    aggregation (what a SQL oracle replays)."""
    from es_indexer_spark.query.aggs import index_docs

    if not isinstance(body, dict):
        raise ValueError("body must be a dict (the parsed JSON request)")
    aggs_node = body.get("aggs") or body.get("aggregations")
    if not isinstance(aggs_node, dict) or not aggs_node:
        raise ValueError("body has no aggs section — use search() for hits")

    full = index_docs(spark, index_root)
    runtime = body.get("runtime_mappings") or {}
    if runtime:
        full = with_runtime_fields(full, runtime)
    base = full
    ms = None
    rt_pred = _runtime_leaf(body.get("query"), runtime)
    if rt_pred is not None:
        base = base.filter(rt_pred)
    else:
        ms = match_docids(spark, index_root, body.get("query"), lang=lang)
        if ms is not None:
            base = base.join(ms, "docid", "left_semi")

    out: dict[str, DataFrame] = {}
    deferred: list[tuple[str, str, dict]] = []
    for name, node in aggs_node.items():
        fams = [k for k in node if k not in ("aggs", "aggregations", "meta")]
        fam = fams[0] if len(fams) == 1 else None
        if fam == "global":
            # ES global bucket: children see the WHOLE live docs store, the
            # query notwithstanding
            out[name] = _global_like(full, name, node, exact)
        elif fam == "significant_terms":
            out[name] = _significant_terms_agg(
                full, base if (ms is not None or rt_pred is not None) else None,
                node[fam],
            )
        elif fam in ("sampler", "diversified_sampler"):
            out[name] = _sampler_agg(
                spark, index_root, full, fam, node, exact, lang,
                body.get("query"),
            )
        elif fam in _SIBLING_PIPELINES:
            deferred.append((name, fam, node[fam]))
        else:
            out[name] = _compile_agg(base, name, node, exact)
    for name, fam, spec in deferred:
        out[name] = _sibling_pipeline(out, fam, spec)
    return out


def count_query(
    spark: SparkSession,
    index_root: str,
    body: dict | None = None,
    *,
    lang: str | None = None,
) -> DataFrame:
    """ES ``_count`` API: the size of the query's FULL match set as a
    one-row ``(count)`` frame — a map-combined count over the same k=None
    legs the aggs half uses, no top-k, no scoring materialization."""
    from es_indexer_spark.query.aggs import index_docs

    body = body or {}
    base = index_docs(spark, index_root)
    runtime = body.get("runtime_mappings") or {}
    if runtime:
        base = with_runtime_fields(base, runtime)
    rt_pred = _runtime_leaf(body.get("query"), runtime)
    if rt_pred is not None:
        base = base.filter(rt_pred)
    else:
        ms = match_docids(spark, index_root, body.get("query"), lang=lang)
        if ms is not None:
            return ms.agg(F.count(F.lit(1)).alias("count"))
    return base.agg(F.count(F.lit(1)).alias("count"))


# Spark docs-store type -> ES field-caps type (the published mapping types)
_ES_TYPES = {
    "string": "keyword", "bigint": "long", "int": "integer",
    "double": "double", "float": "float", "timestamp": "date",
    "boolean": "boolean", "binary": "binary",
}


def field_caps(spark: SparkSession, index_root: str) -> DataFrame:
    """ES ``_field_caps``: one row per queryable field with its ES type and
    capabilities. The analyzed text lives in the postings (searchable, not
    aggregatable — ES ``text`` semantics); every stored docs-store column is
    a keyword/numeric ``searchable + aggregatable`` field. Pure metadata —
    reads only the parquet schema, zero data jobs."""
    from es_indexer_spark.query.aggs import index_docs

    rows = [("content", "text", True, False)]
    for f in index_docs(spark, index_root).schema.fields:
        if f.name in ("docid", "sha256"):
            continue
        es_t = _ES_TYPES.get(f.dataType.simpleString(), "keyword")
        rows.append((f.name, es_t, True, True))
    return spark.createDataFrame(
        sorted(rows), "field string, type string, searchable boolean, aggregatable boolean"
    )
