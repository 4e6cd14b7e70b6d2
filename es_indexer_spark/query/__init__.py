from es_indexer_spark.query.bm25 import bm25_topk_brute, lucene_idf
from es_indexer_spark.query.engine import topk as index_topk

__all__ = ["bm25_topk_brute", "lucene_idf", "index_topk"]
