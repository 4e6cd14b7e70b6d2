"""Corpus curation for training-data assembly: benchmark decontamination and
deterministic weighted source mixing.

Decontamination is the standard eval-set n-gram overlap check (the published
GPT-3 Appendix C / PaLM / Llama recipe: a training doc is contaminated when it
shares an n-gram — canonically a 13-gram — with a benchmark document). Mixing
is the per-source down-sampling step that hits a target corpus composition
("web 50%, code 30%, wiki 20%").

Scale shape (100 TB-ready):

- contamination: the benchmark side reduces to DISTINCT n-grams first (eval
  sets are tiny next to the corpus, so the join's build side stays small —
  Catalyst/AQE broadcasts it); per-doc totals come from one hash agg of the
  exploded grams; nothing is ever per-pair or cartesian.
- mixing: a pure row-local filter (sha-bucket < weight·buckets) — no shuffle
  at all, growth-stable like :func:`es_indexer_spark.ops.packing.assign_split`
  (adding rows never flips an existing row's keep/drop), and bit-replayable
  in ANSI SQL (sha256 of the stringified id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from es_indexer_spark.ops.dedup import _token_shingles
from es_indexer_spark.ops.packing import _sha_bucket


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    ndigits: int = 6,
) -> DataFrame:
    """Per-doc n-gram overlap against a benchmark table:
    ``(doc_id, n_grams, n_contaminated, contamination)`` for EVERY input doc
    (0s for clean docs and docs shorter than ``n`` tokens). ``contamination``
    is the fraction of the doc's distinct n-grams that appear anywhere in the
    benchmark — filter at a threshold (>0 for the strict published rule) to
    get the drop set."""
    doc_g = _token_shingles(docs, id_col, text_col, n)
    bench_g = (
        _token_shingles(
            bench.select(
                F.monotonically_increasing_id().alias("__bid"),
                F.col(bench_text_col),
            ),
            "__bid",
            bench_text_col,
            n,
        )
        .select("shingle")
        .distinct()
    )
    sizes = doc_g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        doc_g.join(bench_g, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    all_ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return all_ids.join(sizes, "doc_id", "left").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.round(
            F.coalesce(
                F.col("n_contaminated") / F.col("n_grams"), F.lit(0.0)
            ),
            ndigits,
        ).alias("contamination"),
    )


def sample_corpus(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted per-source down-sampling (corpus mixing): keep
    a row iff ``sha_bucket(id) < weight[source] * buckets``. Sources absent
    from ``weights`` keep everything (weight 1.0); weight 0.0 drops the
    source entirely. Growth-stable: a doc's keep/drop depends only on its
    own id, so re-running over a grown corpus never flips prior decisions —
    the property that makes incremental corpus refreshes reproducible."""
    for s, w in weights.items():
        if not (0.0 <= float(w) <= 1.0):
            raise ValueError(f"weight for {s!r} must be in [0, 1], got {w}")
    b = _sha_bucket(F.col(id_col), buckets)
    if weights:
        wmap = F.create_map(
            *[F.lit(x) for s, w in weights.items() for x in (s, float(w))]
        )
        thr = F.coalesce(wmap[F.col(source_col)], F.lit(1.0)) * buckets
    else:
        thr = F.lit(float(buckets))
    return df.filter(b < thr)
