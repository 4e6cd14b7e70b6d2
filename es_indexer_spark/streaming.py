"""Incremental index maintenance via Structured Streaming.

The reference has no stream processing (SURVEY.md §2.10) — its incremental path
is the per-record upsert endpoint (indexer/.../IndexerMetadataServiceImpl.java:
415-451, `_id`-keyed so re-index is idempotent) plus full resumable rebuilds.
The Spark-idiomatic generalization: new documents arrive as a stream; each
micro-batch is built into a small *delta segment* (full build pipeline, cheap —
cost ∝ batch size) and merged into the published index via the metadata-speed
segment merge (:mod:`es_indexer_spark.index.merge`). Readers always see a
consistent published version (the CURRENT pointer swap is atomic), exactly the
reference's alias-swap semantics per batch.

Exactly-once: pair ``checkpoint_location`` (Spark's streaming WAL — a batch
re-delivered after a crash has the same batch_id) with TWO idempotence markers:
the per-batch manifest under ``<root>/_stream/``, and the batch_id recorded
inside the published version's ``_PUBLISHED`` manifest (written before the
atomic CURRENT swap). A crash between publish and manifest-write is therefore
recoverable: the replayed batch sees its id on the CURRENT version, rewrites
the manifest, and skips the merge — no double-count window.

Note the merge itself is APPEND-ONLY (see :func:`..index.merge.merge_indexes`):
a re-sent *document* (as opposed to a replayed batch) is indexed again under a
new docid. Upsert-style pipelines should anti-join incoming docs against the
published docs table (id/sha256) before handing batches to this sink.

Usage::

    q = index_stream(
        spark,
        spark.readStream.schema(sch).parquet(inbox),
        root, content_col="text", id_col=None, order_cols=("repo","path"),
        checkpoint_location=ckpt, trigger_available_now=True,
    )
    q.awaitTermination()
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from es_indexer_spark.index import catalog
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.index.merge import merge_indexes


def _batch_manifest(root: str, batch_id: int) -> str:
    return os.path.join(root, "_stream", f"batch_{batch_id}.json")


def make_batch_indexer(
    spark: SparkSession,
    root: str,
    *,
    content_col: str = "content",
    id_col: str | None = None,
    order_cols: Sequence[str] = ("repo", "path", "commit"),
    meta_cols: Sequence[str] = (),
    tokenizer: str = "standard",
    lang_col: str | None = None,
    n_buckets: int = 32,
    shard_size: int = 1 << 16,
    store_positions: bool = False,
    work_dir: str | None = None,
):
    """Return a ``foreachBatch`` callback that delta-builds + merges each batch.

    Also directly callable on static DataFrames — ``fn(batch_df, batch_id)`` —
    which is how incremental *batch* ingestion (the reference's upsert path)
    uses it without a stream.
    """

    def _write_manifest(batch_id: int, vdir: str, n_docs) -> None:
        manifest = _batch_manifest(root, batch_id)
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"batch_id": batch_id, "version_dir": vdir, "n_docs": n_docs}, f
            )
        os.replace(tmp, manifest)

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        manifest = _batch_manifest(root, batch_id)
        if os.path.exists(manifest):  # replayed batch after restart → idempotent skip
            return
        # Crash window closure (exactly-once): the batch_id is recorded inside
        # the published version's _PUBLISHED manifest BEFORE the CURRENT swap.
        # If we crashed after publish but before writing our own manifest, the
        # replayed batch finds its id on the CURRENT version — recover the
        # manifest and skip instead of merging (and double-counting) again.
        cur = catalog.current_version(root)
        if cur is not None:
            vdir = os.path.join(root, cur)
            try:
                pub = catalog.ckpt_read(vdir, "_PUBLISHED")
            except FileNotFoundError:
                pub = {}
            if pub.get("stream_batch_id") == batch_id:
                _write_manifest(batch_id, vdir, pub.get("n_docs"))
                return
        if len(batch_df.take(1)) == 0:
            return
        kwargs = dict(
            content_col=content_col,
            id_col=id_col,
            order_cols=order_cols,
            meta_cols=meta_cols,
            tokenizer=tokenizer,
            lang_col=lang_col,
            n_buckets=n_buckets,
            shard_size=shard_size,
            store_positions=store_positions,
            n_ckpt_batches=1,
            resume=False,
        )
        marker = {"stream_batch_id": batch_id}
        if catalog.current_version(root) is None:
            vdir = build_index(spark, batch_df, root, publish_meta=marker, **kwargs)
            merged_n = catalog.read_stats(vdir)["n_docs"]
        else:
            delta_root = tempfile.mkdtemp(
                prefix=f"delta_b{batch_id}_", dir=work_dir
            )
            try:
                build_index(spark, batch_df, delta_root, **kwargs)
                vdir = merge_indexes(spark, root, delta_root, publish_meta=marker)
                merged_n = catalog.read_stats(vdir)["n_docs"]
            finally:
                shutil.rmtree(delta_root, ignore_errors=True)
        _write_manifest(batch_id, vdir, merged_n)

    return index_batch


def index_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    root: str,
    *,
    checkpoint_location: str,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
    **indexer_kwargs,
):
    """Attach the incremental indexer to a streaming DataFrame; returns the
    StreamingQuery. Each micro-batch publishes a new index version atomically."""
    fn = make_batch_indexer(spark, root, **indexer_kwargs)
    w = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()
