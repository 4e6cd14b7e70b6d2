"""Exact phrase queries over the positional index.

The reference's searchable surface includes phrase matching (``bool.filter
(match_phrase)``, geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120; the
portal's BM25 text fields are phrase-queryable by ES default) — delegated to
Lucene there, rebuilt natively here over the ``poss`` (position) payload the
builder stores when ``store_positions=True``.

Scoring follows Lucene's PhraseQuery semantics (public Lucene behavior):
``score = (Σ_t idf(t)) * phrase_tf*(k1+1)/(phrase_tf + k1*(1-b+b*dl/avgdl))``
where ``phrase_tf`` is the number of exact-phrase occurrences in the doc.

Execution (same shape as the BM25 path — one narrow shuffle, vectorized):
executors decode, per shard, each query term's postings + positions; docid
intersection via np.isin; occurrence check by iteratively intersecting
``positions(t_0)+i`` with ``positions(t_i)`` (the classic sorted-list phrase
merge); per-shard rows then a global ORDER BY. Shards are independent, so this
scales exactly like the scoring path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index import catalog
from es_indexer_spark.index.codec import decode_block, decode_positions
from es_indexer_spark.query.bm25 import lucene_idf

_PHRASE_SCHEMA = "docid long, phrase_tf long, score double"


def _phrase_shard_scorer(terms: list[str], sum_idf: float, k1: float, b: float, avgdl: float):
    """applyInPandas per-shard: intersect postings, count phrase occurrences."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        if len(pdf) == 0:
            return empty
        # decode each term's postings in this shard -> docid -> positions map
        per_term: dict[str, dict[int, np.ndarray]] = {t: {} for t in terms}
        doc_lens: dict[int, int] = {}
        for row in pdf.itertuples(index=False):
            d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
            flat = decode_positions(row.poss, t)
            ends = np.cumsum(t.astype(np.int64))
            starts = ends - t.astype(np.int64)
            tmap = per_term[row.term]
            for i, docid in enumerate(d.astype(np.int64)):
                tmap[int(docid)] = flat[starts[i] : ends[i]].astype(np.int64)
                doc_lens[int(docid)] = int(l[i])
        # docs containing every term
        common = set(per_term[terms[0]])
        for t in terms[1:]:
            common &= set(per_term[t])
        if not common:
            return empty
        out_d, out_tf, out_s = [], [], []
        for docid in common:
            cand = per_term[terms[0]][docid]
            for i, t in enumerate(terms[1:], start=1):
                cand = cand[np.isin(cand + i, per_term[t][docid])]
                if cand.size == 0:
                    break
            if cand.size == 0:
                continue
            ptf = float(cand.size)
            dl = float(doc_lens[docid])
            s = sum_idf * ptf * (k1 + 1.0) / (ptf + k1 * (1.0 - b + b * dl / avgdl))
            out_d.append(docid)
            out_tf.append(cand.size)
            out_s.append(s)
        return pd.DataFrame({"docid": out_d, "phrase_tf": out_tf, "score": out_s})

    return score


def phrase_match(
    spark: SparkSession,
    index_root: str,
    phrase: str,
    k: int | None = 10,
    *,
    lang: str | None = None,
) -> DataFrame:
    """Docs containing ``phrase`` as consecutive tokens, Lucene-PhraseQuery-scored.

    ``k=None`` returns every matching doc (ordered); otherwise top-k.
    """
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]

    terms = tokenize_one(phrase, stats["tokenizer"], lang=lang)
    if not terms:
        return spark.createDataFrame([], _PHRASE_SCHEMA)

    uniq = sorted(set(terms))
    from es_indexer_spark.query.engine import _dict_df

    dict_rows = _dict_df(spark, vdir).filter(F.col("term").isin(uniq)).collect()
    found = {r["term"]: r for r in dict_rows}
    if any(t not in found for t in uniq):  # conjunctive: a missing term → no match
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    # Lucene PhraseQuery idf: sum of the individual term idfs (duplicate terms in
    # the phrase each contribute — Lucene sums over phrase positions)
    sum_idf = float(sum(lucene_idf(n_docs, found[t]["df"]) for t in terms))
    buckets = sorted({r["bucket"] for r in dict_rows})

    blocks = spark.read.parquet(os.path.join(vdir, "postings")).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(uniq)
    )
    scored = blocks.groupBy("shard").applyInPandas(
        _phrase_shard_scorer(terms, sum_idf, k1, b, avgdl), _PHRASE_SCHEMA
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out
