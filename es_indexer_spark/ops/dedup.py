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
    """Distinct token n-gram shingles per doc: (doc_id, shingle).

    Built as n shifted array slices zipped with concat — O(n·tokens) copies per
    row. (The transform(sequence)+slice+array_join formulation re-sliced the
    token array per output index — O(tokens²)-ish — and measured ~8x slower on
    the sf0.1 corpus; same output.) Docs with < n tokens yield no shingles:
    slice length maxes at 0 and the empty array explodes to nothing."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, i + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
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
    J = inter / (|A| + |B| - inter). All shuffles key on bounded-width values.

    Scale warning: the shingle self-join emits one row per co-occurring pair
    per SHARED shingle, so a boilerplate shingle with df=d contributes O(d²)
    rows — at corpus scale ALWAYS set ``max_shingle_df`` (which makes the
    result exact only w.r.t. the surviving shingle sets; for cap-free
    semantics at scale use minhash_lsh_pairs, whose verify join is restricted
    to banded candidates)."""
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
        inter.join(sizes.withColumnRenamed("doc_id", "doc1"), "doc1")
        .withColumnRenamed("n_sh", "n1")
        .join(sizes.withColumnRenamed("doc_id", "doc2"), "doc2")
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


def _minhash_col(i: int, hash_family: str):
    """Seeded 64/60-bit shingle hash for MinHash seed ``i``. Families as in
    :func:`_term_hash_col`: ``xx`` (xxhash64(shingle, seed)) is the scale
    default; ``sha`` (15 hex digits of sha256(shingle || '#' || i)) is bit-exact
    replayable by the DuckDB oracle. Both JVM-side."""
    if hash_family == "xx":
        return F.xxhash64(F.col("shingle"), F.lit(i))
    if hash_family == "sha":
        return F.conv(
            F.substring(
                F.sha2(F.concat_ws("#", F.col("shingle"), F.lit(i)), 256), 1, 15
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"unknown hash_family: {hash_family}")


def _min_agg_exprs(num_hashes: int, hash_family: str) -> tuple[list, list]:
    """(pre-projection columns, per-seed min aggregates) for a signature agg.

    ``xx`` family uses the standard two-hash construction h_i = h1 + i*h2
    (wrapping int64): two string hashes per shingle row instead of
    ``num_hashes``, and each aggregate is a cheap multiply-add — an order of
    magnitude less codegen and hashing work than seeding xxhash64 64 times.
    ``sha`` computes each seeded hash explicitly (the SQL oracle replays it)."""
    if hash_family == "xx":
        p = (1 << 31) - 1  # Mersenne prime: i*h2 + h1 stays far below 2^63 (ANSI-safe)
        # _h2 in [1, p-1]: mod (p-1) then +1 — mod p would admit _h2 == p ≡ 0,
        # which collapses every seed to _h1 for that shingle (ADVICE r2)
        pre = [
            F.pmod(F.xxhash64(F.col("shingle")), F.lit(p)).alias("_h1"),
            (F.pmod(F.xxhash64(F.col("shingle"), F.lit(1)), F.lit(p - 1)) + 1).alias("_h2"),
        ]
        aggs = [
            F.min(F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(p))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
        return pre, aggs
    aggs = [
        F.min(_minhash_col(i, hash_family)).alias(f"h{i}") for i in range(num_hashes)
    ]
    return [], aggs


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = N_MINHASH,
    hash_family: str = "xx",
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures over token n-gram shingles;
    min per seed via groupBy min (partial aggregation map-side)."""
    sh = _token_shingles(df, id_col, text_col, n)
    pre, mins = _min_agg_exprs(num_hashes, hash_family)
    if pre:
        sh = sh.select("doc_id", "shingle", *pre)
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _banded_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    hash_family: str,
    max_shingle_df: int | None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared LSH front half: (shingles, signatures (with n_sh), banded rows).

    The signature agg also carries ``n_sh`` (the doc's distinct-shingle count)
    so the Jaccard verify never needs a second aggregation pass over the
    shingle relation."""
    rows = num_hashes // bands
    sh = _token_shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    pre, mins = _min_agg_exprs(num_hashes, hash_family)
    sig_src = sh.select("doc_id", "shingle", *pre) if pre else sh
    sig = sig_src.groupBy("doc_id").agg(F.count("*").alias("n_sh"), *mins)

    def band_key(bi: int):
        cols = [F.col(f"h{bi * rows + j}") for j in range(rows)]
        if hash_family == "xx":
            return F.xxhash64(*cols).cast("string")
        return F.concat_ws("#", *cols)  # sha mode: SQL-replayable band key

    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), band_key(bi).alias("bh"))
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    return sh, sig, banded


def minhash_band_skew(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    hash_family: str = "xx",
    max_band_df: int = 1 << 12,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Audit for the ``max_band_df`` skew guard: one row per band bucket that
    the cap WOULD drop — (band, bh, bdf). Run (or ``.count()``) alongside a
    capped :func:`minhash_lsh_pairs` so the recall loss is observable instead
    of silent (ADVICE r2): any returned bucket may hide a near-dup cluster of
    up to ``bdf`` docs."""
    _, _, banded = _banded_rows(
        df, id_col, text_col, n, num_hashes, bands, hash_family, max_shingle_df
    )
    return (
        banded.groupBy("band", "bh")
        .agg(F.count("*").alias("bdf"))
        .filter(F.col("bdf") > max_band_df)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    hash_family: str = "xx",
    max_band_df: int | None = None,
    max_shingle_df: int | None = None,
    persist_intermediates: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    band key -> bucket equi-join -> distinct candidate pairs -> exact-Jaccard
    verify of the CANDIDATES ONLY (shingle equi-join restricted to candidate
    pairs — never an all-pairs join, and no per-doc collect_set of the full
    shingle set). Output values are exact w.r.t. the threshold; LSH only prunes
    candidates — identical contract to the brute-force operator, minus pairs
    whose every band collides nowhere, i.e. standard LSH recall.

    Skew guards (both OPT-IN and both replayed by the SQL oracle when used):
    - ``max_shingle_df`` drops boilerplate shingles before signatures;
    - ``max_band_df`` drops degenerate band buckets (empty/boilerplate docs
      collapsing to one band value) whose self-join would go quadratic — the
      stop-term defusal the index builder applies to hot buckets. NOTE the
      recall cost: a near-dup CLUSTER larger than the cap exceeds it in every
      band, so the whole cluster vanishes from the output (ADVICE r2) — which
      is why the default is None; at scale, set it and reconcile with
      ``minhash_band_skew`` (dropped-bucket audit) so the loss is observable.

    Scale shape: cost = O(shingles) for signatures + O(|candidates|) verify;
    the only pair-wise work is on bucket-colliding pairs, df-capped when
    ``max_band_df`` is set (recommended at scale, with the audit above)."""
    sh, sig, banded = _banded_rows(
        df, id_col, text_col, n, num_hashes, bands, hash_family, max_shingle_df
    )
    if persist_intermediates:
        # The DAG references the signature subtree twice (the candidate
        # self-join's sides) and the shingle relation twice more (the verify
        # joins) — unpersisted, each reference re-evaluates its lineage, i.e.
        # RE-TOKENIZES the corpus. At 100 TB you materialize the tokenized
        # relation once instead; MEMORY_AND_DISK spills rather than
        # recomputes, and Spark evicts LRU. Signatures are n_docs rows — tiny
        # at any scale. (Cache keying is by analyzed plan, so the banded/
        # sizes/verify subtrees all hit these entries.)
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if max_band_df is not None:
        hot_b = (
            banded.groupBy("band", "bh")
            .agg(F.count("*").alias("bdf"))
            .filter(F.col("bdf") > max_band_df)
        )
        banded = banded.join(F.broadcast(hot_b), ["band", "bh"], "left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    # n_sh rides the signature agg — no second aggregation over the shingles
    sizes = sig.select("doc_id", "n_sh")
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc1"), "shingle"), "doc1")
        .join(sh.select(F.col("doc_id").alias("doc2"), "shingle"), ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("inter"))
    )
    # no broadcast hint: sizes is O(n_docs) at scale — AQE picks the strategy
    # (inter is candidate-bounded, so it is the small side worth broadcasting)
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc1"), "doc1")
        .withColumnRenamed("n_sh", "n1")
        .join(sizes.withColumnRenamed("doc_id", "doc2"), "doc2")
        .withColumnRenamed("n_sh", "n2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )


def _term_hash_col(hash_family: str):
    """64- or 60-bit token hash as a Column, per family:

    - ``xx``  — Spark builtin xxhash64 (fastest, JVM; 64 bits) — the scale default;
    - ``sha`` — first 15 hex digits of sha256 (60 bits), chosen because ANSI SQL /
      DuckDB can recompute it exactly, making the whole operator oracle-replayable.
    Both are JVM-side expressions — no Python in the hot path."""
    if hash_family == "xx":
        return F.xxhash64("term"), 64
    if hash_family == "sha":
        return (
            F.conv(F.substring(F.sha2(F.col("term"), 256), 1, 15), 16, 10).cast("long"),
            60,
        )
    raise ValueError(f"unknown hash_family: {hash_family}")


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, hash_family: str = "xx"
) -> DataFrame:
    """(doc_id, simhash: bigint) — SimHash over tf-weighted token hashes, computed
    entirely in JVM column algebra (whole-stage codegen; zero Python):

    explode tokens -> groupBy (doc, term) tf -> per-bit signed tf sums
    (``sum(tf * (2*bit_i - 1))``, one agg per bit, map-side partial) -> sign ->
    assemble the fingerprint. Cost: one hash-agg shuffle keyed on (doc, term) +
    one on doc — both bounded-width keys; scale-safe at any corpus size.

    Docs with zero tokens carry no signal and are omitted (they would otherwise
    all collide at fingerprint 0)."""
    col_h, bits = _term_hash_col(hash_family)
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    tf = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(toks).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", col_h)
    )
    bit_sums = [
        F.sum(
            (
                F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("long")
            * F.col("tf")
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    s = tf.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        # bit 63 is the sign bit: set it by adding -(2^63) (two's complement)
        weight = F.lit(-(1 << 63)) if i == 63 else F.lit(1 << i)
        term = F.when(F.col(f"b{i}") > 0, weight).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return s.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    hash_family: str = "xx",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming; candidates via 4 band
    buckets of bits/4 bits each (by pigeonhole, a pair within Hamming 3 must agree
    on >= one band), verified exactly via bit_count(xor). All JVM-side; with
    ``hash_family='sha'`` the entire pipeline is replayable in ANSI SQL."""
    _, bits = _term_hash_col(hash_family)
    width = bits // 4
    mask = (1 << width) - 1
    fp = simhash_fingerprints(df, id_col, text_col, hash_family)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", width * i)
                        .bitwiseAND(F.lit(mask))
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
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    tile_size: int = 4096,
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, doc1 < doc2. EXACT.

    Exact all-pairs similarity is O(n^2) compares by definition; what must NOT
    be O(n^2) is any single task or any driver/broadcast structure. This tiles
    the pair space: vectors are hashed into ``ceil(n/tile_size)`` tiles, the
    C(T+1,2) tile combos become a broadcast dimension table, and each combo is
    scored by one cogrouped Arrow task as a BLAS matmul (``Xn @ Yn.T``) that
    emits only above-threshold pairs. Physical plan: two broadcast equi-joins +
    one shuffle keyed on combo id — NO CartesianProduct / BroadcastNestedLoop
    (asserted by tests/test_ops.py). Work per task is tile_size^2 vectorized
    flops; tasks scale out with the cluster.

    For approximate near-dup at extreme scale (where even tiled exact is too
    much), use MinHash/SimHash here or the LSH/IVF candidate routes in
    :mod:`es_indexer_spark.ops.similarity`."""
    spark = df.sparkSession
    v = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    n = v.count()
    n_tiles = max(1, -(-n // tile_size))
    # C(T+1,2) tile combos enumerated IN-PLAN (VERDICT r2 #4 removed the
    # O(T²) driver-built Python list): one spark.range over the T×T id space,
    # (ti, tj) decoded by div/mod, upper triangle kept. No cross join, no
    # driver materialization — scales to any tile count. Each side gets its own
    # range lineage (like `side` below re-selects from df) so the cogroup
    # self-join resolves unambiguously.
    def combos(which: str) -> DataFrame:
        return (
            spark.range(n_tiles * n_tiles)
            .select(
                F.col("id").cast("int").alias("cid"),
                (F.col("id") / n_tiles).cast("int").alias("ti"),
                F.pmod(F.col("id"), F.lit(n_tiles)).cast("int").alias("tj"),
            )
            .filter(F.col("ti") <= F.col("tj"))
            .select("cid", F.col(which).alias("tile"))
        )

    combos_a = combos("ti")
    combos_b = combos("tj")
    # two independent lineages (re-select from df) so the cogroup self-join
    # resolves unambiguously
    def side(combos_df: DataFrame) -> DataFrame:
        vv = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).withColumn(
            "tile", F.pmod(F.xxhash64("doc_id"), F.lit(n_tiles)).cast("int")
        )
        return vv.join(F.broadcast(combos_df), "tile").select(
            "cid", "tile", "doc_id", "v"
        )

    a = side(combos_a)
    b = side(combos_b)
    thr = float(threshold)

    def compare(la: pd.DataFrame, lb: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc1": [], "doc2": [], "cosine": []})
        if len(la) == 0 or len(lb) == 0:
            return empty
        ids_a = la["doc_id"].to_numpy(np.int64)
        ids_b = lb["doc_id"].to_numpy(np.int64)
        x = np.stack(la["v"].to_numpy())
        y = np.stack(lb["v"].to_numpy())
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        yn = y / np.linalg.norm(y, axis=1, keepdims=True)
        c = xn @ yn.T
        mask = c >= thr
        if int(la["tile"].iloc[0]) == int(lb["tile"].iloc[0]):
            mask &= ids_a[:, None] < ids_b[None, :]
        ii, jj = np.nonzero(mask)
        if ii.size == 0:
            return empty
        d1 = np.minimum(ids_a[ii], ids_b[jj])
        d2 = np.maximum(ids_a[ii], ids_b[jj])
        return pd.DataFrame(
            {"doc1": d1, "doc2": d2, "cosine": np.round(c[ii, jj], 6)}
        )

    return (
        a.groupby("cid")
        .cogroup(b.groupby("cid"))
        .applyInPandas(compare, "doc1 long, doc2 long, cosine double")
    )


# ---------------------------------------------------------------------------
# pairs -> clusters: the step a training-data dedup pipeline runs AFTER pair
# generation (exact/jaccard/minhash/simhash/cosine all emit pairs).
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    col1: str = "doc1",
    col2: str = "doc2",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node in ``pairs`` — component = the
    minimum doc_id reachable through the near-duplicate graph (Hash-Min
    label propagation, the standard map-reduce connected-components
    construction).

    Scale shape: each round is ONE shuffle join (edges x labels) plus a
    map-side-combined min aggregation, and the loop runs O(max component
    eccentricity) rounds with an exact distributed convergence check (count
    of changed labels). Near-duplicate components are near-cliques (every
    member pairs with most others), so 2-3 rounds is typical no matter the
    corpus size; a pathological chain still terminates in diameter rounds,
    bounded by ``max_iter``. Nodes in no pair are singletons and are not
    emitted (their component is trivially themselves)."""
    e = pairs.select(
        F.col(col1).cast("long").alias("a"), F.col(col2).cast("long").alias("b")
    )
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    cached = labels  # the persisted handle backing the current `labels` view
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            )
            .groupBy("a")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.withColumnRenamed("label", "old")
            .join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("old"), F.coalesce("nl", "old")).alias("label"),
                "old",
            )
            .persist()
        )
        # the count materializes new_labels' cache; only THEN drop the prior
        # round's cache (unpersisting first would force each round to replay
        # the whole lineage from round 0 — quadratic instead of linear)
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("node", "label")  # view over the cached round
        if changed == 0:
            break
    # edges stays cached until here; the result is backed by the final
    # round's materialized cache, so consuming it does not replay the loop
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_components(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, component) clusters of near-duplicate docs via n-gram Jaccard
    pairs + connected components."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return connected_components(pairs)


def dedup_survivors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """``df`` minus non-canonical near-duplicates: each cluster keeps only its
    min-id member (the deterministic canonical choice); singletons all
    survive. The final filter is a left-anti join against the drop set
    (doc_id != component); AQE picks broadcast when the drop set is small and
    falls back to a shuffled anti-join for heavily-duplicated corpora, so the
    plan is safe at either extreme."""
    comps = dedup_components(df, id_col, text_col, n=n, threshold=threshold)
    losers = comps.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
