"""Deduplication operators for a training-data pipeline.

Four families, each a first-class operator (SURVEY.md: driver-required components):

- exact           — sha256 hash-groupBy (the `_id`-idempotence analog of the
                    reference's upsert-by-uuid, IndexerMetadataServiceImpl.java:430-435)
- n-gram Jaccard  — exact token-shingle Jaccard via an inverted shingle join
                    (no cross join: candidates only where shingles overlap)
- MinHash + LSH   — shingle -> minhash signatures -> banded bucket-join candidates
                    -> exact-Jaccard verification. Scale path for near-dup at 100 TB.
- SimHash         — 64-bit weighted-sign fingerprint; near-dup = small Hamming
                    distance, candidates via 4x16-bit band buckets.

Skew/scale notes: candidate generation always goes through an equi-join on a
bounded-width key (shingle / band hash / simhash band), never a cross join. Very hot
shingles (boilerplate) are df-capped before the join (``max_shingle_df``) — the same
stop-term defusal as the index builder's bucket salting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_MINHASH = 64
LSH_BANDS = 16  # 16 bands x 4 rows
SIMHASH_BITS = 64


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, min_group: int = 2
) -> DataFrame:
    """Groups of byte-identical docs: (sha256, n_docs, min doc_id as keeper).
    ``min_group=2`` (default) returns only duplicate groups; ``min_group=1``
    returns every content-hash group (useful as a full-corpus content audit)."""
    h = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha"),
    )
    return (
        h.groupBy("sha")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_docs") >= min_group)
    )


def _token_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct token n-gram shingles per doc: (doc_id, shingle)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    grams = F.when(F.size(toks) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (doc1 < doc2, jaccard >= threshold).

    Candidates come from an inverted index on shingles (equi-join), intersection
    sizes from a count over the joined pairs, |A|/|B| broadcast back in:
    J = inter / (|A| + |B| - inter). All shuffles key on bounded-width values."""
    sh = _token_shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("sdf")).filter(
            F.col("sdf") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc1")), "doc1")
        .withColumnRenamed("n_sh", "n1")
        .join(F.broadcast(sizes.withColumnRenamed("doc_id", "doc2")), "doc2")
        .withColumnRenamed("n_sh", "n2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = N_MINHASH
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures over token n-gram shingles.

    h_i(s) = xxhash64(s, seed=i) — Spark's builtin 64-bit hash family, fully
    JVM-side; min per seed via groupBy min (partial aggregation map-side)."""
    sh = _token_shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    band hash -> bucket equi-join -> distinct candidate pairs -> exact-Jaccard
    verify of the CANDIDATES ONLY (array_intersect over the two docs' shingle
    sets — never the all-pairs shingle self-join, which would reduce LSH to
    brute force). Output values are exact w.r.t. the threshold; LSH only prunes
    candidates — identical contract to the brute-force operator, minus pairs
    whose every band collides nowhere, i.e. standard LSH recall.

    Scale shape: cost = O(shingles) for signatures + O(|candidates|) verify;
    the only pair-wise work is on bucket-colliding pairs."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", bi * rows + j + 1) for j in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    doc_sh = (
        _token_shingles(df, id_col, text_col, n)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shs"))
    )
    return (
        cand.join(
            doc_sh.select(F.col("doc_id").alias("doc1"), F.col("shs").alias("sh1")),
            "doc1",
        )
        .join(
            doc_sh.select(F.col("doc_id").alias("doc2"), F.col("shs").alias("sh2")),
            "doc2",
        )
        .withColumn("inter", F.size(F.array_intersect("sh1", "sh2")).cast("double"))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("sh1") + F.size("sh2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, simhash: bigint) — 64-bit SimHash over tf-weighted token hashes.

    Vectorized pandas UDF path: per Arrow batch, explode tokens -> hash -> unpack
    bits -> weighted sign sum (numpy), no per-row Python."""
    import pandas as pd  # noqa: F811

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from es_indexer_spark.analysis.tokenizer import standard_tokenize_series

    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        toks = standard_tokenize_series(texts)
        out = np.zeros(len(toks), dtype=np.int64)
        for i, tok_list in enumerate(toks.tolist()):
            if not tok_list:
                continue
            uniq, counts = np.unique(np.asarray(tok_list, dtype=object), return_counts=True)
            # deterministic 64-bit token hash (FNV-1a, pure numpy)
            hashes = np.zeros(uniq.size, dtype=np.uint64)
            for j, t in enumerate(uniq):
                h = np.uint64(0xCBF29CE484222325)
                for ch in t.encode():
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 % (1 << 64))
                hashes[j] = h
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.float64
            )
            v = ((bits * 2 - 1) * counts[:, None].astype(np.float64)).sum(axis=0)
            sim = np.uint64(0)
            for bit in np.nonzero(v > 0)[0]:
                sim |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sim.astype(np.int64))
        return pd.Series(out, index=texts.index)

    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        simhash_udf(F.col(text_col)).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming; candidates via 4x16-bit
    band buckets (a pair within Hamming 3 must agree on >= one band)."""
    fp = simhash_fingerprints(df, id_col, text_col)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, doc1 < doc2.

    Exact formulation in double precision (cast from float32 once, sum left-to-right
    — mirrored exactly by the SQL oracle). Small inputs join all-pairs; at scale,
    route candidates through :mod:`es_indexer_spark.ops.similarity` LSH buckets."""
    v = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(F.col(f"{side}.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("cosine", dot / (norm("a") * norm("b")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
