"""Point reads and resumable ordered scans over the doc table — the native
analogs of the reference's non-ranked query surface (SURVEY.md §3.3):

- ``ids`` point lookup by _id (IndexerMetadataServiceImpl.java:122-127,
  getDocumentByUUID IndexerController.java:116-142) -> :func:`doc_lookup`;
- ``match_all`` + sort + ``search_after`` keyset pagination
  (GeoNetworkServiceImpl.java:586-604, page size 100) -> :func:`scan_after`.

Physical behavior: the docs table is written range-partitioned and sorted by
docid, so both operators reduce to parquet min/max row-group pruning — a point
or range read, never a full scan.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.index import catalog


def doc_lookup(
    spark: SparkSession, index_root: str, docids: Sequence[int]
) -> DataFrame:
    """Fetch doc rows by exact docid (the `ids` query analog). The isin filter
    is pushed to parquet; docid-sorted files make it a row-group point read."""
    from es_indexer_spark.index.tombstones import filter_live

    vdir = catalog.resolve(index_root)
    df = spark.read.parquet(os.path.join(vdir, "docs")).filter(
        F.col("docid").isin([int(d) for d in docids])
    )
    # a logically deleted doc is gone from every read surface immediately
    # (the reference's deleteDocumentByUUID contract)
    return filter_live(spark, vdir, df)


def scan_after(
    spark: SparkSession,
    index_root: str,
    after: int | None = None,
    page_size: int = 100,
) -> DataFrame:
    """One page of the docid-ordered scan, resuming strictly after ``after``
    (keyset pagination — the `search_after` analog; the caller passes the last
    docid of the previous page as the next resume token)."""
    from es_indexer_spark.index.tombstones import filter_live

    vdir = catalog.resolve(index_root)
    df = spark.read.parquet(os.path.join(vdir, "docs"))
    if after is not None:
        df = df.filter(F.col("docid") > int(after))
    return filter_live(spark, vdir, df).orderBy(F.asc("docid")).limit(page_size)
