"""ES ``_reindex`` and ``_update_by_query`` — bulk copy/transform surfaces.

The reference's operational story is "re-run the indexer over the source of
truth" (IndexerController.java:240-257 re-indexes all metadata; per-UUID
updates overwrite by ``_id``). ES exposes the same two shapes as APIs:

- ``_reindex``: copy the docs matching a query from a source index into a
  destination index, optionally transforming each doc with a script;
- ``_update_by_query``: apply a script to every doc matching a query,
  in place (snapshot semantics: the match set is what matched at start).

One deliberate divergence, forced by the storage design and documented in
README: this engine's docs table never stores the corpus text (only sha256 +
metadata — index/builder.py projects content away before the persist), so
both operations take the SOURCE CORPUS DataFrame alongside the index. That is
exactly the reference's own model — its reindex re-reads GeoNetwork, not the
ES ``_source`` field — and it is the honest 100 TB design: duplicating corpus
text into every index generation is what makes ES reindexes expensive.

The "script" slot takes a ``{column: SQL-expression}`` map compiled by
Catalyst (the same Painless-slot convention as ``runtime_mappings`` /
``script_score`` — see README divergences). Expressions may reference any
corpus column; new columns may be created (list them in ``meta_cols`` to
store them).

Scale shape: match set stays distributed end to end (k=None engine paths, no
driver collect), corpus restriction is ONE left-semi equi-join on the
external id (docids map to ids through the docs table first — a docid is a
PHYSICAL address that changes across upsert generations, the external id is
identity), the transform is pure column algebra, and the write is the normal
checkpointed builder pipeline — a reindex of a 100 TB corpus is exactly one
build plus one semi-join.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.merge import upsert_batch


def match_docids(
    spark: SparkSession,
    index_root: str,
    query: dict | None,
    *,
    lang: str | None = None,
) -> DataFrame | None:
    """The FULL (unranked, tombstone-filtered) match set of an ES request-body
    ``query`` node as a 1-column ``docid`` frame — the selector that
    ``_reindex`` / ``_update_by_query`` / ``_delete_by_query`` share. ``None``
    / ``match_all`` mean "everything" and return None (callers skip the
    semi-join entirely — no reason to join against an all-true set).

    Supported kinds are the k=None-capable ones (the same set the ``sort``
    section accepts): ``match_all`` / ``match`` / ``bool`` / ``match_phrase``
    / ``term`` / ``terms`` / ``range`` / ``exists`` / ``ids``. Ranked-only
    kinds raise by name — a top-k frame must never silently become a bulk
    operation's match set."""
    if query is None:
        return None
    if not isinstance(query, dict) or len(query) != 1:
        raise ValueError(f"query must be a single-kind node, got {query!r}")
    kind, v = next(iter(query.items()))
    if kind == "match_all":
        return None
    if kind == "ids":
        from es_indexer_spark.query.lookup import doc_lookup

        return doc_lookup(spark, index_root, v["values"]).select("docid")
    if kind == "term":
        from es_indexer_spark.query.lookup import term_query

        field, spec = next(iter(v.items()))
        val = spec["value"] if isinstance(spec, dict) else spec
        return term_query(spark, index_root, field, val).select("docid")
    if kind == "terms":
        from es_indexer_spark.query.lookup import terms_query

        field, vals = next(iter(v.items()))
        return terms_query(spark, index_root, field, vals).select("docid")
    if kind == "range":
        from es_indexer_spark.query.lookup import range_query

        field, bounds = next(iter(v.items()))
        return range_query(spark, index_root, field, bounds).select("docid")
    if kind == "exists":
        from es_indexer_spark.query.lookup import exists_query

        return exists_query(spark, index_root, v["field"]).select("docid")
    if kind == "match":
        from es_indexer_spark.query.boolean import bool_query

        field_spec = v if "query" in v else next(iter(v.values()))
        text = field_spec["query"] if isinstance(field_spec, dict) else field_spec
        op = (field_spec.get("operator", "or") if isinstance(field_spec, dict)
              else "or")
        kw = {"must" if str(op).lower() == "and" else "should": [str(text)]}
        return bool_query(spark, index_root, k=None, lang=lang, **kw).select(
            "docid"
        )
    if kind == "match_phrase":
        from es_indexer_spark.query.phrase import phrase_match

        field_spec = v if "query" in v else next(iter(v.values()))
        text = field_spec["query"] if isinstance(field_spec, dict) else field_spec
        slop = int(field_spec.get("slop", 0)) if isinstance(field_spec, dict) else 0
        return phrase_match(
            spark, index_root, str(text), k=None, lang=lang, slop=slop
        ).select("docid")
    if kind == "bool":
        from es_indexer_spark.query.dsl import _bool_kwargs
        from es_indexer_spark.query.boolean import bool_query

        return bool_query(
            spark, index_root, k=None, lang=lang, **_bool_kwargs(v)
        ).select("docid")
    raise ValueError(
        f"{kind!r} is not a bulk-selector query kind (k=None-capable kinds: "
        "match_all/match/bool/match_phrase/term/terms/range/exists/ids)"
    )


def _restrict_corpus(
    spark: SparkSession,
    vdir: str,
    corpus: DataFrame,
    docids: DataFrame,
    id_col: str,
    *,
    anti: bool = False,
) -> DataFrame:
    """Corpus rows whose external id corresponds to (``anti``: does NOT
    correspond to) one of ``docids`` in the index version ``vdir``.

    Docids are physical addresses: an upsert generation remaps the replaced
    doc to a new docid. Identity therefore routes through the docs table —
    docid → stored ``id_col`` meta column when the index carries one, else
    docid itself (valid for id_col-built first-generation indexes, where
    docid == external id by construction). One equi-join either way; the
    docid→key hop joins two index-side tables (docs is docid-range-sorted,
    the match set is a projection of it — AQE broadcasts the small side)."""
    docs_path = os.path.join(vdir, "docs")
    doc_cols = spark.read.parquet(docs_path).columns
    if id_col in doc_cols:
        keys = (
            docids.join(
                spark.read.parquet(docs_path).select("docid", id_col), "docid"
            )
            .select(F.col(id_col).alias("__k"))
            .distinct()
        )
        cond = corpus[id_col] == F.col("__k")
    else:
        keys = docids.select(F.col("docid").alias("__k"))
        cond = corpus[id_col].cast("long") == F.col("__k")
    return corpus.join(keys, cond, "left_anti" if anti else "left_semi")


def _apply_script(df: DataFrame, script: dict[str, str] | None) -> DataFrame:
    """The Painless slot: ``{column: Catalyst SQL expression}`` applied as
    withColumns — pure column algebra, whole-stage codegen, no UDF."""
    if not script:
        return df
    return df.withColumns({c: F.expr(e) for c, e in script.items()})


def _has_tombs(vdir: str) -> bool:
    d = os.path.join(vdir, "_tombstones")
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for f in os.listdir(d)
    )


def reindex(
    spark: SparkSession,
    corpus_df: DataFrame,
    src_root: str,
    dst_root: str,
    *,
    query: dict | None = None,
    script: dict[str, str] | None = None,
    content_col: str = "content",
    id_col: str | None = None,
    order_cols: Sequence[str] = ("repo", "path", "commit"),
    meta_cols: Sequence[str] = (),
    lang: str | None = None,
    **build_kwargs,
) -> dict:
    """ES ``_reindex``: build ``dst_root`` from the corpus rows whose docs
    match ``query`` on ``src_root`` (optionally transformed by ``script``).

    The source index supplies MATCHING (analyzed-text queries run against its
    postings) and LIVENESS (tombstoned docs don't reindex — same as ES, which
    reads live docs only); the corpus supplies content. ``id_col`` links the
    two (see :func:`_restrict_corpus`). With ``query=None`` / ``match_all``
    the corpus is still liveness-filtered against the source tombstones.

    Index-shape parameters (tokenizer, k1/b, positions, bucket/shard/block
    sizes) are inherited from the source index's stats manifest unless
    overridden in ``build_kwargs`` — ES's "dest inherits nothing" footgun
    inverted, because a reindex that silently changes BM25 constants is never
    what an operator wants. Returns ``{"created": n, "took_sec": ...,
    "version_dir": ...}``."""
    t0 = time.time()
    src_vdir = catalog.resolve(src_root)
    stats = catalog.read_stats(src_vdir)
    inherit = {
        "tokenizer": stats.get("tokenizer", "standard"),
        "k1": stats.get("k1", 1.2),
        "b": stats.get("b", 0.75),
        "n_buckets": stats.get("n_buckets", 32),
        "shard_size": stats.get("shard_size", 1 << 16),
        "block_size": stats.get("block_size"),
        "store_positions": stats.get("positions", False),
    }
    inherit = {k: v for k, v in inherit.items() if v is not None}
    inherit.update(build_kwargs)

    src = corpus_df
    matched = match_docids(spark, src_root, query, lang=lang)
    if id_col is None and (matched is not None or _has_tombs(src_vdir)):
        raise ValueError(
            "reindex with a query (or over a source with deletes) needs "
            "id_col — the external id linking corpus rows to source docids"
        )
    if matched is not None:
        src = _restrict_corpus(spark, src_vdir, src, matched, id_col)
    elif _has_tombs(src_vdir):
        from es_indexer_spark.index.tombstones import tombstone_df

        tomb = tombstone_df(spark, src_vdir)
        if tomb is not None:
            src = _restrict_corpus(
                spark, src_vdir, src, tomb, id_col, anti=True
            )
    src = _apply_script(src, script)
    vdir = build_index(
        spark, src, dst_root,
        content_col=content_col, id_col=id_col, order_cols=order_cols,
        meta_cols=meta_cols, resume=False, **inherit,
    )
    created = catalog.read_stats(vdir)["n_docs"]
    return {
        "created": int(created),
        "took_sec": round(time.time() - t0, 3),
        "version_dir": vdir,
    }


def update_by_query(
    spark: SparkSession,
    corpus_df: DataFrame,
    index_root: str,
    *,
    script: dict[str, str],
    query: dict | None = None,
    content_col: str = "content",
    id_col: str | None = None,
    meta_cols: Sequence[str] = (),
    lang: str | None = None,
    work_dir: str | None = None,
) -> dict:
    """ES ``_update_by_query``: apply ``script`` to every live doc matching
    ``query``, in place, as the Lucene update it really is — DELETE + ADD.

    Pipeline: (1) match set on the published version (snapshot semantics —
    docs that start matching mid-operation are not picked up, same as ES);
    (2) corpus restriction by external-id semi-join; (3) script transform
    (Catalyst expressions); (4) a delta index built from the transformed rows
    with the main index's own shape parameters; (5) :func:`upsert_batch` —
    old copies tombstoned and the delta merged into a NEW version, published
    atomically. Readers never see a half-updated index; re-running the same
    update is idempotent at the tombstone level.

    Requires ``id_col``. For an index that will be updated MORE THAN ONCE,
    store the external id as a meta column too (``meta_cols=(id_col, ...)``
    at build time): upserts remap replaced docids, and only a stored id keeps
    identity stable across generations — with it, both the match→corpus hop
    and the upsert key use the external id; without it they fall back to
    docid equality, correct for the first update only (same caveat as
    :func:`~es_indexer_spark.index.merge.upsert_batch`). Returns
    ``{"updated": n, "took_sec": ..., "version_dir": ...}``."""
    if id_col is None:
        raise ValueError("update_by_query requires id_col (the external id)")
    t0 = time.time()
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    from es_indexer_spark.index.tombstones import tombstone_df

    matched = match_docids(spark, index_root, query, lang=lang)
    src = corpus_df
    if matched is not None:
        src = _restrict_corpus(spark, vdir, src, matched, id_col)
    else:
        tomb = tombstone_df(spark, vdir)
        if tomb is not None:
            src = _restrict_corpus(spark, vdir, src, tomb, id_col, anti=True)
    src = _apply_script(src, script)

    main_doc_cols = spark.read.parquet(os.path.join(vdir, "docs")).columns
    keyed = id_col in main_doc_cols and id_col in meta_cols
    delta_root = work_dir or tempfile.mkdtemp(prefix="ubq_delta_")
    try:
        build_index(
            spark, src, delta_root,
            content_col=content_col, id_col=id_col, meta_cols=meta_cols,
            tokenizer=stats.get("tokenizer", "standard"),
            k1=stats.get("k1", 1.2), b=stats.get("b", 0.75),
            n_buckets=stats.get("n_buckets", 32),
            shard_size=stats.get("shard_size", 1 << 16),
            store_positions=stats.get("positions", False),
            resume=False,
        )
        n = catalog.read_stats(catalog.resolve(delta_root))["n_docs"]
        new_vdir = upsert_batch(
            spark, index_root, delta_root,
            key_cols=(id_col,) if keyed else ("docid",),
            publish_meta={"op": "update_by_query", "updated": int(n)},
        )
    finally:
        if work_dir is None:
            shutil.rmtree(delta_root, ignore_errors=True)
    return {
        "updated": int(n),
        "took_sec": round(time.time() - t0, 3),
        "version_dir": new_vdir,
    }
