"""es_indexer_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of the reference pipeline ``aodn/es-indexer``
(see /root/repo/SURVEY.md for the full behavioral map with file:line citations)
Spark-first:

- ``analysis``  — tokenizer chains (standard / code-aware / shingle), the analog of
  the reference's Elasticsearch analysis chain
  (reference: stacmodel/src/main/resources/schema/portal_records_index_schema.json:2-78).
- ``index``     — posting-list construction, varint/delta block codec with block-max
  metadata, resumable checkpointed build, atomic blue/green publish
  (reference delegates this to Lucene; pipeline analogs:
  indexer/.../IndexerMetadataServiceImpl.java:476-662,
  indexer/.../ElasticSearchIndexService.java:37-207).
- ``query``     — BM25(k1=1.2, b=0.75) top-k: brute-force DataFrame oracle and the
  block-max-pruned distributed engine (Lucene-delegated in the reference).
- ``ops``       — training-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search over embeddings, text statistics,
  multimodal column plumbing.

Everything here derives from public knowledge only: the Apache Spark / PySpark API,
the reference repo's observable behavior, and published IR literature (BM25: Robertson
& Zaragoza; block-max WAND: Ding & Suel, SIGIR 2011).
"""

__version__ = "0.1.0"

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
