"""spark-submit entry point (the launch mode pinned by BASELINE.json:north_rule).

Behavioral analog of the reference's CLI/batch dispatch
(reference: indexer/.../CLIRunner.java:31-60 parses ``--batch --jobName=...
--jobParam=...`` and BatchJobRunner.java:54-99 dispatches to the named job; the AWS
Batch submit path IndexerController.java:141-175 launches the same CLI remotely).

Usage::

    zip -qr engine.zip es_indexer_spark
    spark-submit --py-files engine.zip -m es_indexer_spark.cli ...   # or:
    spark-submit --py-files engine.zip path/to/cli.py \
        --job build --input /data/code_files.parquet --index /out/idx \
        --tokenizer code --lang-col lang --content-col content \
        --order-cols repo,path,commit --meta-cols repo,path,lang

    spark-submit --py-files engine.zip cli.py \
        --job query --index /out/idx --query "getUserName parseTree" -k 10

    spark-submit --py-files engine.zip cli.py \
        --job resume --input ... --index /out/idx      # build with resume=True

Jobs:

- ``build``   — full index build (fresh version dir), atomic CURRENT publish;
- ``resume``  — same as build but reuses the newest unpublished version dir and
  skips checkpointed stages (the `-running` + `beginWithUuid` analog,
  IndexerMetadataServiceImpl.java:478-523);
- ``query``   — BM25 top-k through the block-max engine, prints one JSON line per hit;
- ``batch``   — BM25 top-k for a BATCH of queries in one pass (``--queries-json
  '{"qa": "spark join", ...}'`` — the ES ``msearch`` analog; one dictionary
  lookup + one postings scan for the whole batch);
- ``suggest`` — prefix suggestions from the dictionary (search_as_you_type analog);
- ``phrase``  — positional phrase match (requires an index built with
  positions; round 5: ``--slop`` for ordered sloppy matching, also honored as
  ``filter_phrase`` slop in the ``bool`` job);
- ``merge``   — metadata-speed segment merge of ``--delta`` into ``--index``
  (append-only; the incremental-ingest publish step);
- ``bool``    — ES bool DSL (``--must/--should/--must-not/--filter-phrase``;
  round 4: ``--min-should-match``, ES ``term^2.5`` per-clause boost syntax on
  must/should, ``--must-fuzzy/--should-fuzzy`` match+fuzziness clauses);
- ``sortquery`` — sort-by-field ranked search (``--sort "field:desc,_score"``);
- ``geo-bbox`` — geo_bounding_box over a ``write_geo_index`` data index
  (``--bbox min_lon,min_lat,max_lon,max_lat`` — min_lon>max_lon crosses the
  antimeridian; ``--date-range yyyy-MM,yyyy-MM``; ``--collections``);
- ``span-near`` — positional proximity query (``--clauses a,b --slop 2
  --in-order false``; round 5 — ordered = match_phrase slop semantics);
- ``geo-shape`` — geo_shape over a ``write_shape_index`` layout (``--bbox``
  or ``--polygon "lon,lat lon,lat ..."`` + ``--relation
  intersects|within|contains|disjoint``; round 5);
- ``suggest-fuzzy`` — completion with typo tolerance (``--query dat
  --fuzziness 1``; round 5);
- ``suggest-phrase`` — whole-phrase did-you-mean off the positional
  index's bigram LM (``--query "dat stream" -k 5``; round 5h);
- ``fuzzy``   — Levenshtein-expanded term query (``--fuzziness``);
- ``prefix``  — constant-score prefix query;
- ``explain`` — per-term BM25 breakdown for ``--query`` + ``--docid``;
- ``delete-query`` — tombstone every live doc matching ``--field/--value``,
  ``--must``/``--filter-phrase``, or ``--match-all``;
- ``delete`` / ``compact`` — id-list tombstones / physical purge;
- ``mget``    — one row per requested ``--ids`` entry, in request order, with
  found flags (round 5g);
- ``search-template`` / ``render-template`` / ``put-template`` — the ES
  ``_search/template`` surface: mustache-subset bodies, stored under
  ``<index>/templates/`` (``--template-id`` or ``--template-source`` +
  ``--params`` JSON; round 5g);
- ``reindex`` — copy the ``--body``-matching docs of ``--index`` into
  ``--dest``, reading content from the ``--input`` corpus, optionally
  transformed by ``--script`` (a JSON ``{column: SQL expr}`` map; round 5g);
- ``update-by-query`` — apply ``--script`` to every live doc matching
  ``--body``, in place (delete+add via upsert; round 5g);
- ``aliases`` — ES ``_aliases``: print the alias table of ``--cluster-dir``,
  or apply a ``--body`` action list atomically (round 5g);
- ``snapshot`` / ``snapshots`` / ``restore`` — ES ``_snapshot``: hardlink
  snapshot of the published version into ``--repo``, list complete
  snapshots, restore one as a new published version of ``--dest`` (round 5g);
- ``mtermvectors`` — batched artificial-doc term vectors (``--body``
  ``{doc_key: text}``; ONE dictionary lookup for the whole batch; round 5g);
- ``rank-eval`` — ES ``_rank_eval``: rated requests + a metric object
  (``--body '{"requests": [...], "metric": {"precision": {"k": 10}}}'``),
  prints the overall score and per-request details (round 5g).
"""

from __future__ import annotations

import argparse
import json
import sys


def _csv(s: str) -> list[str]:
    return [c for c in s.split(",") if c]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="es_indexer_spark", description=__doc__)
    p.add_argument(
        "--job",
        required=True,
        choices=["build", "resume", "query", "batch", "suggest", "phrase", "merge",
                 "delete", "compact", "bool", "fuzzy", "prefix", "explain",
                 "delete-query", "wildcard", "phrase-prefix", "mlt",
                 "simple-qs", "rescore", "range", "sortquery", "geo-bbox",
                 "span-near", "suggest-fuzzy", "suggest-phrase", "geo-shape",
                 "qs", "span-multi", "knn", "rrf", "percolate", "dsl",
                 "scroll", "validate", "msearch", "mget", "search-template",
                 "render-template", "put-template", "reindex",
                 "update-by-query", "aliases", "snapshot", "restore",
                 "snapshots", "mtermvectors", "rank-eval", "bulk", "analyze",
                 "terms-enum", "sql", "translate-sql"],
    )
    p.add_argument("--pages", type=int, default=None,
                   help="scroll: max pages to emit (default: to exhaustion)")
    p.add_argument("--body", default=None,
                   help="dsl: an ES request body as a JSON string (or @file)")
    p.add_argument("--emb-input", default=None,
                   help="knn/rrf: embeddings parquet (id + vector columns)")
    p.add_argument("--vec-id-col", default="vec_id", help="knn/rrf: id column")
    p.add_argument("--vec-col", default="embedding", help="knn/rrf: vector column")
    p.add_argument("--qvec-id", type=int, default=None,
                   help="knn/rrf: take the query vector from this id's row")
    p.add_argument("--knn-filter", default=None,
                   help="knn: SQL filter applied DURING the search")
    p.add_argument("--similarity", type=float, default=None,
                   help="knn: minimum raw cosine before the k cut")
    p.add_argument("--rank-constant", type=int, default=60, help="rrf constant")
    p.add_argument("--rank-window", type=int, default=100, help="rrf window")
    p.add_argument("--queries-input", default=None,
                   help="percolate: stored-queries parquet (query_id, must, "
                        "should, must_not, minimum_should_match)")
    p.add_argument("--slop", type=int, default=0,
                   help="phrase/span-near: ordered slop (greedy-chain semantics)")
    p.add_argument("--in-order", default="true", choices=["true", "false"],
                   help="span-near: require clause order")
    p.add_argument("--clauses", type=_csv, default=[],
                   help="span-near clause terms (comma-separated)")
    p.add_argument("--relation", default="intersects",
                   choices=["intersects", "within", "contains", "disjoint"],
                   help="geo-shape: ES spatial relation")
    p.add_argument("--polygon", default=None,
                   help="geo-shape: query polygon 'lon,lat lon,lat ...' "
                        "(space-separated ring; omit to use --bbox)")
    p.add_argument("--min-should-match", default=None,
                   help="bool job: required count of matched should clauses — "
                        "an int or an ES string spec ('75%%', '-25%%')")
    p.add_argument("--must-fuzzy", type=_csv, default=[],
                   help="bool job: match+fuzziness clauses (required)")
    p.add_argument("--should-fuzzy", type=_csv, default=[],
                   help="bool job: match+fuzziness clauses (optional/msm-counted)")
    p.add_argument("--sort", default=None,
                   help="sortquery job: 'field:asc,other:desc,_score'")
    p.add_argument("--bbox", default=None,
                   help="geo-bbox job: 'min_lon,min_lat,max_lon,max_lat' "
                        "(min_lon > max_lon crosses the antimeridian)")
    p.add_argument("--date-range", default=None,
                   help="geo-bbox job: 'yyyy-MM,yyyy-MM' inclusive months")
    p.add_argument("--collections", type=_csv, default=None,
                   help="geo-bbox job: collection terms")
    p.add_argument("--gte", default=None, help="range job: inclusive lower bound")
    p.add_argument("--lt", default=None, help="range job: exclusive upper bound")
    p.add_argument("--keyword-range", action="store_true",
                   help="range job: treat bounds as strings (lexicographic "
                        "keyword range) even if they look numeric")
    p.add_argument("--rescore-phrase", default=None, help="rescore job phrase")
    p.add_argument("--rescore-weight", type=float, default=1.0)
    p.add_argument("--window-size", type=int, default=50, help="rescore window")
    p.add_argument("--default-operator", default="or", choices=["or", "and"],
                   help="simple-qs bare-term operator")
    p.add_argument("--must", type=_csv, default=[], help="bool/delete-query clauses")
    p.add_argument("--should", type=_csv, default=[], help="bool job clauses")
    p.add_argument("--must-not", type=_csv, default=[], help="bool job clauses")
    p.add_argument("--filter-phrase", default=None,
                   help="bool/delete-query: match_phrase in filter context")
    p.add_argument("--docid", type=int, default=None, help="explain job target doc")
    p.add_argument("--field", default=None,
                   help="delete-query: term field; terms-enum: the field to "
                        "enumerate (meta column or the content field)")
    p.add_argument("--value", default=None, help="delete-query: term value")
    p.add_argument("--match-all", action="store_true",
                   help="delete-query: tombstone every live doc")
    p.add_argument("--fuzziness", type=int, default=1, help="fuzzy job max edits")
    p.add_argument("--transpositions", action="store_true",
                   help="fuzzy/suggest-fuzzy/bool: count an adjacent swap as "
                        "ONE edit (Damerau-Levenshtein — ES's default fuzzy "
                        "semantics; off = classic Levenshtein)")
    p.add_argument(
        "--ids", type=_csv, default=None,
        help="delete job: comma-separated docids to tombstone "
             "(the deleteDocumentByUUID analog; logical until --job compact)",
    )
    p.add_argument(
        "--queries-json",
        help="batch job: JSON object {qid: query string}, inline or a file path",
    )
    p.add_argument("--delta", help="delta index root (merge job)")
    p.add_argument("--store-positions", action="store_true",
                   help="store term positions (enables phrase queries)")
    p.add_argument("--dest", default=None,
                   help="reindex/restore: destination index root")
    p.add_argument("--cluster-dir", default=None,
                   help="aliases job: directory holding the _aliases.json registry")
    p.add_argument("--repo", default=None,
                   help="snapshot/restore jobs: snapshot repository dir")
    p.add_argument("--snapshot-id", default=None,
                   help="snapshot/restore jobs: snapshot name")
    p.add_argument("--script", default=None,
                   help="reindex/update-by-query: JSON {column: SQL expr} map")
    p.add_argument("--params", default=None,
                   help="search/render-template: JSON params object")
    p.add_argument("--template-id", default=None,
                   help="template jobs: stored template id")
    p.add_argument("--template-source", default=None,
                   help="template jobs: inline mustache source")
    p.add_argument("--input", help="parquet path (or Iceberg table via --format iceberg)")
    p.add_argument("--format", default="parquet", help="spark read format")
    p.add_argument("--index", default=None,
                   help="index root dir (required for every job except "
                        "aliases/snapshots/restore)")
    p.add_argument("--content-col", default="content")
    p.add_argument("--id-col", default=None, help="use an existing long id column")
    p.add_argument("--order-cols", type=_csv, default=["repo", "path", "commit"])
    p.add_argument("--meta-cols", type=_csv, default=[])
    p.add_argument("--tokenizer", default="code", choices=["standard", "code"])
    p.add_argument("--lang-col", default=None)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--shard-size", type=int, default=1 << 16)
    p.add_argument("--ckpt-batches", type=int, default=4)
    p.add_argument("--publish-gate", type=float, default=1.0)
    p.add_argument("--query", help="query string (query/suggest jobs)")
    p.add_argument("--lang", default=None, help="query language tag")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--fetch-meta", action="store_true", help="join hits back to docs")
    p.add_argument("--master", default=None, help="override master (default: from submit)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.index is None and args.job not in (
        "aliases", "snapshots", "restore", "analyze", "translate-sql"
    ):
        print(f"--index required for job {args.job}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    b = SparkSession.builder.appName(f"es_indexer_spark-{args.job}")
    if args.master:
        b = b.master(args.master)
    b = b.config("spark.sql.execution.arrow.pyspark.enabled", "true")
    b = b.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()

    try:
        if args.job in ("build", "resume"):
            from es_indexer_spark.index.builder import build_index

            if not args.input:
                print("--input required for build/resume", file=sys.stderr)
                return 2
            src = spark.read.format(args.format).load(args.input)
            vdir = build_index(
                spark,
                src,
                args.index,
                content_col=args.content_col,
                id_col=args.id_col,
                order_cols=args.order_cols,
                meta_cols=tuple(args.meta_cols),
                tokenizer=args.tokenizer,
                lang_col=args.lang_col,
                n_buckets=args.n_buckets,
                shard_size=args.shard_size,
                n_ckpt_batches=args.ckpt_batches,
                resume=(args.job == "resume"),
                publish_gate=args.publish_gate,
                store_positions=args.store_positions,
            )
            from es_indexer_spark.index import catalog

            meta = catalog.ckpt_read(vdir, "_PUBLISHED")
            print(json.dumps({"job": args.job, "version_dir": vdir, **meta}))
        elif args.job == "query":
            from es_indexer_spark.query.engine import fetch_docs, topk

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            hits = topk(spark, args.index, args.query, k=args.k, lang=args.lang)
            if args.fetch_meta:
                hits = fetch_docs(spark, args.index, hits)
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "batch":
            import os

            from es_indexer_spark.query.engine import topk_many

            raw = args.queries_json
            if not raw:
                print("--queries-json required for batch", file=sys.stderr)
                return 2
            if os.path.exists(raw):
                with open(raw) as f:
                    raw = f.read()
            queries = json.loads(raw)
            hits = topk_many(spark, args.index, queries, k=args.k, lang=args.lang)
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job in ("sql", "translate-sql"):
            # ES _sql / _sql/translate: --query carries the SQL text
            from es_indexer_spark.query.essql import sql_query, translate_sql

            if not args.query:
                print("--query required (the SQL text)", file=sys.stderr)
                return 2
            if args.job == "translate-sql":
                body = translate_sql(args.query)
                body.pop("_sql_meta", None)
                print(json.dumps(body))
            else:
                for r in sql_query(
                    spark, args.index, args.query, lang=args.lang
                ).collect():
                    print(json.dumps(r.asDict(), default=str))
        elif args.job == "terms-enum":
            # ES _terms_enum: lexicographic prefix page over the field's
            # index terms; --field meta column or the content field,
            # --query is the prefix (optional)
            from es_indexer_spark.query.lookup import terms_enum

            if not args.field:
                print("--field required", file=sys.stderr)
                return 2
            rows = terms_enum(
                spark, args.index, args.field, args.query or "", size=args.k
            ).collect()
            print(json.dumps({"terms": [r["term"] for r in rows]}))
        elif args.job == "analyze":
            # ES _analyze: token/start_offset/end_offset/position/type rows
            # for --query through the --tokenizer chain (needs no index)
            from es_indexer_spark.analysis.analyze import analyze_text

            if args.query is None:
                print("--query required", file=sys.stderr)
                return 2
            for t in analyze_text(args.query, args.tokenizer, lang=args.lang):
                print(json.dumps(t))
        elif args.job == "suggest":
            from es_indexer_spark.query.suggest import suggest_prefix

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            for r in suggest_prefix(spark, args.index, args.query, k=args.k).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "phrase":
            from es_indexer_spark.query.phrase import phrase_match

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            for r in phrase_match(
                spark, args.index, args.query, k=args.k, slop=args.slop
            ).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "span-near":
            from es_indexer_spark.query.phrase import span_near

            if not args.clauses:
                print("--clauses required", file=sys.stderr)
                return 2
            hits = span_near(
                spark, args.index, args.clauses, slop=args.slop,
                in_order=args.in_order == "true", k=args.k, lang=args.lang,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "suggest-fuzzy":
            from es_indexer_spark.query.suggest import suggest_fuzzy

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            for r in suggest_fuzzy(
                spark, args.index, args.query, k=args.k,
                fuzziness=args.fuzziness, transpositions=args.transpositions,
            ).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "suggest-phrase":
            # ES phrase suggester (round 5h): whole-phrase did-you-mean off
            # the positional index's bigram statistics
            from es_indexer_spark.query.suggest import suggest_phrase

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            # the shared --fuzziness flag sets max_edits (flag default 1;
            # the library default is 2 — pass --fuzziness 2 for parity)
            for r in suggest_phrase(
                spark, args.index, args.query, size=args.k,
                max_edits=args.fuzziness,
            ).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "scroll":
            # ES scroll loop: ranked pages (--query) or docid-order export
            # scan (no --query), each row tagged with its page number; the
            # PIT snapshot pins the view for the whole export
            from es_indexer_spark.query.pit import Scroll

            with Scroll(
                spark, args.index, args.query or None, page_size=args.k,
                lang=args.lang,
            ) as sc:
                n = 0
                while args.pages is None or n < args.pages:
                    rows = sc.next_page().collect()
                    if not rows:
                        break
                    for r in rows:
                        print(json.dumps({"page": n, **r.asDict()}, default=str))
                    n += 1
        elif args.job == "merge":
            from es_indexer_spark.index import catalog
            from es_indexer_spark.index.merge import merge_indexes

            if not args.delta:
                print("--delta required for merge", file=sys.stderr)
                return 2
            vdir = merge_indexes(spark, args.index, args.delta)
            meta = catalog.ckpt_read(vdir, "_PUBLISHED")
            print(json.dumps({"job": "merge", "version_dir": vdir, **meta}))
        elif args.job == "bool":
            from es_indexer_spark.query.boolean import bool_query

            def clause(s: str):
                # ES query-string boost syntax: 'term^2.5' -> (term, 2.5)
                if "^" in s:
                    text, _, b_ = s.rpartition("^")
                    try:
                        return (text, float(b_))
                    except ValueError:
                        pass
                return s

            hits = bool_query(
                spark, args.index,
                must=[clause(s) for s in args.must],
                should=[clause(s) for s in args.should],
                must_not=args.must_not,
                filter_phrase=args.filter_phrase,
                filter_phrase_slop=args.slop, k=args.k, lang=args.lang,
                minimum_should_match=(
                    int(args.min_should_match)
                    if isinstance(args.min_should_match, str)
                    and args.min_should_match.lstrip("-").isdigit()
                    else args.min_should_match
                ),
                must_fuzzy=[clause(s) for s in args.must_fuzzy],
                should_fuzzy=[clause(s) for s in args.should_fuzzy],
                fuzziness=args.fuzziness,
                transpositions=args.transpositions,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "sortquery":
            from es_indexer_spark.query.engine import topk_sorted

            if not args.query or not args.sort:
                print("--query and --sort required", file=sys.stderr)
                return 2
            sort = []
            for part in args.sort.split(","):
                name, _, direction = part.partition(":")
                if name == "_score":
                    # an explicit direction must survive ('_score:asc' would
                    # otherwise silently sort descending, topk_sorted's default)
                    sort.append((name, direction) if direction else name)
                else:
                    sort.append((name, direction or "asc"))
            hits = topk_sorted(spark, args.index, args.query, sort=sort,
                               k=args.k, lang=args.lang)
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "geo-bbox":
            from es_indexer_spark.ops.geoindex import geo_bbox_query

            if not args.bbox:
                print("--bbox required", file=sys.stderr)
                return 2
            bbox = tuple(float(x) for x in args.bbox.split(","))
            if len(bbox) != 4:
                print("--bbox takes 4 numbers", file=sys.stderr)
                return 2
            dr = tuple(args.date_range.split(",")) if args.date_range else None
            hits = geo_bbox_query(
                spark, args.index, bbox,
                date_range=dr, collections=args.collections,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "geo-shape":
            # --index = a write_shape_index parquet dir (assembled shapes)
            from es_indexer_spark.ops.geoshape import (
                shape_intersects_bbox,
                shape_relate_polygon,
            )

            shapes = spark.read.parquet(args.index)
            if args.polygon:
                ring = [
                    tuple(float(v) for v in pt.split(","))
                    for pt in args.polygon.split()
                ]
                hits = shape_relate_polygon(
                    shapes, [ring], relation=args.relation
                )
            elif args.bbox:
                bbox = tuple(float(x) for x in args.bbox.split(","))
                if len(bbox) != 4:
                    print("--bbox takes 4 numbers", file=sys.stderr)
                    return 2
                hits = shape_intersects_bbox(shapes, bbox)
            else:
                print("--polygon or --bbox required", file=sys.stderr)
                return 2
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "fuzzy":
            from es_indexer_spark.query.engine import fuzzy_topk

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            hits = fuzzy_topk(
                spark, args.index, args.query, k=args.k,
                fuzziness=args.fuzziness, lang=args.lang,
                transpositions=args.transpositions,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "prefix":
            from es_indexer_spark.query.suggest import prefix_query

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            for r in prefix_query(spark, args.index, args.query, k=args.k).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "explain":
            from es_indexer_spark.query.engine import explain

            if not args.query or args.docid is None:
                print("--query and --docid required", file=sys.stderr)
                return 2
            for r in explain(spark, args.index, args.query, args.docid).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "wildcard":
            from es_indexer_spark.query.suggest import wildcard_query

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            for r in wildcard_query(spark, args.index, args.query, k=args.k).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "phrase-prefix":
            from es_indexer_spark.query.phrase import match_phrase_prefix

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            hits = match_phrase_prefix(spark, args.index, args.query, k=args.k,
                                       lang=args.lang)
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "mlt":
            from es_indexer_spark.query.engine import more_like_this

            if not args.query:
                print("--query required (the like-text)", file=sys.stderr)
                return 2
            hits = more_like_this(spark, args.index, args.query, k=args.k,
                                  lang=args.lang)
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "simple-qs":
            from es_indexer_spark.query.querystring import simple_query_string

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            hits = simple_query_string(
                spark, args.index, args.query, k=args.k,
                default_operator=args.default_operator, lang=args.lang,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "qs":
            from es_indexer_spark.query.classic import query_string

            if not args.query:
                print("--query required", file=sys.stderr)
                return 2
            hits = query_string(
                spark, args.index, args.query, k=args.k,
                default_operator=args.default_operator, lang=args.lang,
                fuzziness=args.fuzziness,
                minimum_should_match=args.min_should_match,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "span-multi":
            from es_indexer_spark.query.phrase import span_multi_near

            if not args.clauses:
                print("--clauses required", file=sys.stderr)
                return 2
            hits = span_multi_near(
                spark, args.index, args.clauses, slop=args.slop,
                in_order=args.in_order == "true", k=args.k, lang=args.lang,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job in ("knn", "rrf"):
            from pyspark.sql import functions as F

            from es_indexer_spark.ops.similarity import knn_search, rrf_topk

            if not args.emb_input or args.qvec_id is None:
                print("--emb-input and --qvec-id required", file=sys.stderr)
                return 2
            emb = spark.read.parquet(args.emb_input)
            qrow = emb.filter(
                F.col(args.vec_id_col) == args.qvec_id
            ).select(args.vec_col).collect()
            if not qrow:
                print(f"qvec id {args.qvec_id} not found", file=sys.stderr)
                return 2
            qvec = [float(x) for x in qrow[0][0]]
            if args.job == "knn":
                hits = knn_search(
                    emb, args.vec_id_col, args.vec_col, qvec, k=args.k,
                    filter_expr=args.knn_filter, similarity=args.similarity,
                )
            else:
                if not args.query:
                    print("--query required for rrf", file=sys.stderr)
                    return 2
                hits = rrf_topk(
                    spark, args.index, args.query, emb, args.vec_id_col,
                    args.vec_col, qvec, k=args.k,
                    rank_constant=args.rank_constant,
                    rank_window_size=args.rank_window, lang=args.lang,
                )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "dsl":
            from es_indexer_spark.query.dsl import search as dsl_search

            if not args.body:
                print("--body required (JSON request body or @file)", file=sys.stderr)
                return 2
            raw = args.body
            if raw.startswith("@"):
                with open(raw[1:]) as fh:
                    raw = fh.read()
            emb = (
                spark.read.parquet(args.emb_input) if args.emb_input else None
            )
            body = json.loads(raw)
            if body.get("suggest") and "query" not in body:
                from es_indexer_spark.query.dsl import suggest as dsl_suggest

                for name, tbl in dsl_suggest(spark, args.index, body).items():
                    for r in tbl.collect():
                        print(json.dumps(
                            {"suggest": name, **r.asDict()}, default=str
                        ))
                return 0
            aggs_node = body.get("aggs") or body.get("aggregations")
            if aggs_node:
                from es_indexer_spark.query.dsl_aggs import aggregations

                tables = aggregations(spark, args.index, body, lang=args.lang)
                for name, tbl in tables.items():
                    for r in tbl.collect():
                        print(json.dumps({"agg": name, **r.asDict()}, default=str))
            if not aggs_node or int(body.get("size", 10)) > 0:
                hits_body = {
                    k: v for k, v in body.items()
                    if k not in ("aggs", "aggregations")
                }
                hits = dsl_search(
                    spark, args.index, hits_body, emb_df=emb,
                    emb_id_col=args.vec_id_col, emb_vec_col=args.vec_col,
                    lang=args.lang,
                )
                for r in hits.collect():
                    print(json.dumps(r.asDict(), default=str))
        elif args.job == "msearch":
            # ES _msearch: a JSON ARRAY of request bodies; all-plain-match
            # batches share one dictionary lookup + one postings scan
            from es_indexer_spark.query.dsl import msearch

            if not args.body:
                print("--body required (JSON array of bodies or @file)",
                      file=sys.stderr)
                return 2
            raw = args.body
            if raw.startswith("@"):
                with open(raw[1:]) as fh:
                    raw = fh.read()
            bodies = json.loads(raw)
            if not isinstance(bodies, list):
                print("--body must be a JSON array for msearch", file=sys.stderr)
                return 2
            for i, frame in enumerate(msearch(spark, args.index, bodies,
                                              lang=args.lang)):
                for r in frame.collect():
                    print(json.dumps({"q": i, **r.asDict()}, default=str))
        elif args.job == "validate":
            # ES _validate/query over the same dispatch as the dsl job
            from es_indexer_spark.query.dsl import validate_query

            if not args.body:
                print("--body required (JSON request body or @file)", file=sys.stderr)
                return 2
            raw = args.body
            if raw.startswith("@"):
                with open(raw[1:]) as fh:
                    raw = fh.read()
            emb = (
                spark.read.parquet(args.emb_input) if args.emb_input else None
            )
            print(json.dumps(validate_query(
                spark, args.index, json.loads(raw), emb_df=emb,
                emb_id_col=args.vec_id_col, emb_vec_col=args.vec_col,
                lang=args.lang,
            )))
        elif args.job == "percolate":
            from es_indexer_spark.query.percolate import percolate

            if not args.queries_input or not args.input:
                print("--queries-input and --input required", file=sys.stderr)
                return 2
            out = percolate(
                spark.read.parquet(args.queries_input),
                spark.read.format(args.format).load(args.input)
                if args.format != "parquet"
                else spark.read.parquet(args.input),
                doc_id_col=args.id_col or "doc_id",
                text_col=args.content_col,
                tokenizer=args.tokenizer,
                lang_col=args.lang_col,
            )
            for r in out.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "rescore":
            from es_indexer_spark.query.engine import rescore_phrase

            if not args.query or not args.rescore_phrase:
                print("--query and --rescore-phrase required", file=sys.stderr)
                return 2
            hits = rescore_phrase(
                spark, args.index, args.query, args.rescore_phrase, k=args.k,
                window_size=args.window_size,
                rescore_query_weight=args.rescore_weight, lang=args.lang,
            )
            for r in hits.collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "range":
            from es_indexer_spark.query.lookup import range_query

            if not args.field or (args.gte is None and args.lt is None):
                print("--field and --gte/--lt required", file=sys.stderr)
                return 2

            def _num(v):
                if v is None or args.keyword_range:
                    return v
                try:
                    return int(v)
                except ValueError:
                    pass
                try:
                    return float(v)  # handles 1e5, .5, inf notations too
                except ValueError:
                    return v  # keyword (string) range

            bounds = {}
            if args.gte is not None:
                bounds["gte"] = _num(args.gte)
            if args.lt is not None:
                bounds["lt"] = _num(args.lt)
            for r in range_query(spark, args.index, args.field, bounds,
                                 size=args.k).collect():
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "aliases":
            from es_indexer_spark.index.aliases import get_aliases, update_aliases

            if not args.cluster_dir:
                print("--cluster-dir required for aliases", file=sys.stderr)
                return 2
            if args.body:
                table = update_aliases(args.cluster_dir, json.loads(args.body))
            else:
                table = get_aliases(args.cluster_dir)
            print(json.dumps(table, sort_keys=True))
        elif args.job in ("snapshot", "restore", "snapshots"):
            from es_indexer_spark.index import snapshot as snap

            if not args.repo:
                print("--repo required", file=sys.stderr)
                return 2
            if args.job == "snapshots":
                print(json.dumps(snap.list_snapshots(args.repo)))
            elif args.job == "snapshot":
                if not args.snapshot_id:
                    print("--snapshot-id required", file=sys.stderr)
                    return 2
                man = snap.create_snapshot(args.index, args.repo, args.snapshot_id)
                print(json.dumps({"job": "snapshot", **man}))
            else:
                if not (args.snapshot_id and args.dest):
                    print("--snapshot-id and --dest required", file=sys.stderr)
                    return 2
                vdir = snap.restore_snapshot(args.repo, args.snapshot_id, args.dest)
                print(json.dumps({"job": "restore", "version_dir": vdir}))
        elif args.job == "bulk":
            from es_indexer_spark.index.bulk import bulk

            if not args.body:
                print("--body required (NDJSON actions or @file)",
                      file=sys.stderr)
                return 2
            raw = args.body
            if raw.startswith("@"):
                with open(raw[1:]) as fh:
                    raw = fh.read()
            res = bulk(
                spark, args.index, raw.splitlines(),
                content_col=args.content_col,
                id_col=args.id_col or "docid",
                meta_cols=tuple(args.meta_cols),
            )
            print(json.dumps({"job": "bulk", **res}))
        elif args.job == "rank-eval":
            from es_indexer_spark.query.rankeval import rank_eval

            if not args.body:
                print("--body required ({requests, metric} JSON or @file)",
                      file=sys.stderr)
                return 2
            raw = args.body
            if raw.startswith("@"):
                with open(raw[1:]) as fh:
                    raw = fh.read()
            spec = json.loads(raw)
            per = rank_eval(
                spark, args.index, spec["requests"], spec["metric"],
                lang=args.lang,
            )
            rows = per.collect()
            overall = (
                sum(r["metric_score"] for r in rows) / len(rows) if rows else 0.0
            )
            print(json.dumps({
                "metric_score": round(overall, 6),
                "details": {r["qid"]: r.asDict() for r in rows},
            }, default=str))
        elif args.job == "mtermvectors":
            from es_indexer_spark.query.lookup import mterm_vectors

            if not args.body:
                print("--body required ({doc_key: text} JSON)", file=sys.stderr)
                return 2
            rows = mterm_vectors(
                spark, args.index, json.loads(args.body), lang=args.lang
            ).collect()
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.job == "mget":
            from es_indexer_spark.query.lookup import mget

            if not args.ids:
                print("--ids required for mget", file=sys.stderr)
                return 2
            rows = mget(spark, args.index, [int(i) for i in args.ids]).collect()
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.job in ("search-template", "render-template"):
            from es_indexer_spark.query.templates import (
                render_search_template,
                search_template,
            )

            params = json.loads(args.params) if args.params else {}
            if args.job == "render-template":
                body = render_search_template(
                    args.index, source=args.template_source,
                    template_id=args.template_id, params=params,
                )
                print(json.dumps(body))
            else:
                hits = search_template(
                    spark, args.index, source=args.template_source,
                    template_id=args.template_id, params=params,
                )
                for r in hits.collect():
                    print(json.dumps(r.asDict(), default=str))
        elif args.job == "put-template":
            from es_indexer_spark.query.templates import put_template

            if not (args.template_id and args.template_source):
                print("--template-id and --template-source required",
                      file=sys.stderr)
                return 2
            put_template(args.index, args.template_id, args.template_source)
            print(json.dumps({"job": "put-template", "id": args.template_id}))
        elif args.job == "reindex":
            from es_indexer_spark.index.reindex import reindex

            if not (args.input and args.dest):
                print("--input and --dest required for reindex", file=sys.stderr)
                return 2
            res = reindex(
                spark, spark.read.format(args.format).load(args.input),
                args.index, args.dest,
                query=json.loads(args.body) if args.body else None,
                script=json.loads(args.script) if args.script else None,
                content_col=args.content_col, id_col=args.id_col,
                order_cols=args.order_cols, meta_cols=tuple(args.meta_cols),
                lang=args.lang,
            )
            print(json.dumps({"job": "reindex", **res}))
        elif args.job == "update-by-query":
            from es_indexer_spark.index.reindex import update_by_query

            if not (args.input and args.script):
                print("--input and --script required for update-by-query",
                      file=sys.stderr)
                return 2
            res = update_by_query(
                spark, spark.read.format(args.format).load(args.input),
                args.index,
                query=json.loads(args.body) if args.body else None,
                script=json.loads(args.script),
                content_col=args.content_col, id_col=args.id_col,
                meta_cols=tuple(args.meta_cols), lang=args.lang,
            )
            print(json.dumps({"job": "update-by-query", **res}))
        elif args.job == "delete-query":
            from es_indexer_spark.index.tombstones import delete_by_query

            n = delete_by_query(
                spark, args.index,
                field=args.field, value=args.value, must=args.must,
                must_not=args.must_not, filter_phrase=args.filter_phrase,
                match_all=args.match_all,
            )
            print(json.dumps({"job": "delete-query", "deleted": n}))
        elif args.job == "delete":
            from es_indexer_spark.index.tombstones import delete_docs

            if not args.ids:
                print("--ids required for delete", file=sys.stderr)
                return 2
            delete_docs(spark, args.index, [int(i) for i in args.ids])
            print(json.dumps({"job": "delete", "n_ids": len(args.ids)}))
        elif args.job == "compact":
            from es_indexer_spark.index import catalog
            from es_indexer_spark.index.tombstones import compact_index

            vdir = compact_index(spark, args.index)
            print(json.dumps(
                {"job": "compact", "version_dir": vdir,
                 **{k: v for k, v in catalog.read_stats(vdir).items()
                    if k in ("n_docs", "avgdl", "compacted_from", "purged_docs")}}
            ))
    finally:
        if not preexisting:  # embedded callers (tests) keep their session
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
