"""Training-data operators: dedup, similarity, multimodal plumbing (SURVEY-mandated
first-class components)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops.dedup import (
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from es_indexer_spark.ops.multimodal import extract_features, pack_media
from es_indexer_spark.ops.similarity import ann_brute_topk, ann_lsh_topk


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (4, "completely different content about spark and indexes"),
        (5, "spark indexes are completely different content about"),  # shuffled 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(dup_docs):
    got = exact_duplicates(dup_docs, "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2 and got[0]["keeper_id"] == 1


def test_ngram_jaccard_pairs(dup_docs):
    got = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0  # identical
    assert (1, 3) in got and got[(1, 3)] < 1.0  # near dup
    assert (4, 5) not in got  # shuffled word order kills 2-gram overlap


def test_minhash_lsh_finds_near_dups(dup_docs):
    got = {
        (r["doc1"], r["doc2"])
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    assert (1, 2) in got
    assert (1, 3) in got


def test_minhash_persist_off_is_identical(dup_docs, spark):
    """persist_intermediates only changes materialization (the DAG references
    the signature/shingle subtrees 2x/2x), never the pair set."""
    on = {
        (r["doc1"], r["doc2"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    spark.catalog.clearCache()
    off = {
        (r["doc1"], r["doc2"], round(r["jaccard"], 9))
        for r in minhash_lsh_pairs(
            dup_docs, "doc_id", "text", n=2, threshold=0.5, persist_intermediates=False
        ).collect()
    }
    assert on == off and on


def test_minhash_band_cap_loss_is_observable(dup_docs):
    """The opt-in max_band_df cap drops whole near-dup clusters that exceed it
    in every band (ADVICE r2); minhash_band_skew must surface exactly the
    buckets the cap silenced so callers can reconcile the recall loss."""
    from es_indexer_spark.ops.dedup import minhash_band_skew

    uncapped = {
        (r["doc1"], r["doc2"])
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    # cap of 1: docs 1/2/3 collide >1 deep in their shared band buckets -> all
    # their candidate pairs vanish
    capped = {
        (r["doc1"], r["doc2"])
        for r in minhash_lsh_pairs(
            dup_docs, "doc_id", "text", n=2, threshold=0.5, max_band_df=1
        ).collect()
    }
    assert capped < uncapped  # strict subset: the cap lost pairs
    audit = minhash_band_skew(dup_docs, "doc_id", "text", n=2, max_band_df=1).collect()
    assert audit  # ...and the audit reports the dropped buckets
    assert all(r["bdf"] > 1 for r in audit)


def test_simhash_near_pairs(dup_docs):
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in simhash_near_pairs(dup_docs, "doc_id", "text", max_hamming=8).collect()
    }
    assert got[(1, 2)] == 0  # identical text -> identical simhash
    assert (1, 3) in got and got[(1, 3)] <= 8  # near dup (one appended token)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    # 100,101 near-identical to base; base itself is id 99
    rows.append((99, [float(x) for x in base]))
    rows.append((100, [float(x) for x in base + 0.01 * rng.standard_normal(16)]))
    rows.append((101, [float(x) for x in base + 0.02 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), [
        float(x) for x in base
    ]


def test_ann_brute_topk(vectors):
    df, q = vectors
    got = ann_brute_topk(df, "vec_id", "embedding", q, k=3).collect()
    assert [r["vec_id"] for r in got][:3] == [99, 100, 101]
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_ann_lsh_matches_brute_on_neighbors(vectors):
    df, q = vectors
    brute = ann_brute_topk(df, "vec_id", "embedding", q, k=3).collect()
    lsh = ann_lsh_topk(df, "vec_id", "embedding", q, k=3).collect()
    # near-identical vectors share all LSH bands with the query -> recalled
    assert [r["vec_id"] for r in lsh] == [r["vec_id"] for r in brute]
    for a, b in zip(lsh, brute):
        assert a["cosine"] == pytest.approx(b["cosine"], rel=1e-9)


def test_embedding_cosine_pairs(vectors):
    df, _ = vectors
    got = {
        (r["doc1"], r["doc2"])
        for r in embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.95).collect()
    }
    assert {(99, 100), (99, 101), (100, 101)} <= got


def test_embedding_cosine_pairs_tiled_matches_numpy(vectors):
    """Tiny tile_size forces many tile combos; output must equal the exact
    numpy all-pairs result — the tiling must not drop, duplicate, or reorder
    any pair."""
    df, _ = vectors
    rows = df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = xn @ xn.T
    expected = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and c[i, j] >= 0.9:
                expected.add((int(ids[i]), int(ids[j])))
    got = {
        (r["doc1"], r["doc2"])
        for r in embedding_cosine_pairs(
            df, "vec_id", "embedding", threshold=0.9, tile_size=8
        ).collect()
    }
    assert got == expected


def test_embedding_cosine_pairs_no_cartesian_product(vectors):
    """Scale guard: the physical plan must tile via equi-joins + cogroup, never
    a CartesianProduct / BroadcastNestedLoopJoin (VERDICT r1 finding #2)."""
    df, _ = vectors
    plan = embedding_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.9, tile_size=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_plumbing(documents):
    media = pack_media(documents.limit(20), "doc_id", "text")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 20
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same input -> same features
    again = extract_features(pack_media(documents.limit(20), "doc_id", "text")).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_ppm_decode_roundtrip_and_features():
    """Real decode path: PPM (P6) bytes — incl. header comments — round-trip
    through encode/decode, and decode_media emits the true image stats."""
    import numpy as np

    from es_indexer_spark.ops.multimodal import decode_media, decode_ppm, encode_ppm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = encode_ppm(img)
    assert np.array_equal(decode_ppm(payload), img)
    # header comment variant (netpbm grammar)
    commented = b"P6\n# made by a test\n9 5\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(commented), img)
    f = decode_media(payload, "image/ppm")
    assert (f[0], f[1]) == (9, 5)
    assert f[2] == pytest.approx(img[..., 0].mean())
    assert f[6] == img.min() and f[7] == img.max()


def test_wav_decode_roundtrip_and_features():
    import numpy as np

    from es_indexer_spark.ops.multimodal import decode_media, decode_wav, encode_wav

    t = np.linspace(0, 1, 800, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 20 * t)
    payload = encode_wav(sig, 8000)
    x, rate = decode_wav(payload)
    assert rate == 8000 and x.shape == (800, 1)
    assert np.max(np.abs(x[:, 0] - sig)) < 1e-3  # 16-bit quantization
    f = decode_media(payload, "audio/wav")
    assert f[0] == 8000 and f[1] == 800
    assert f[4] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)  # sine RMS
    # 20 Hz over 1 s -> ~40 zero crossings
    assert 35 / 799 <= f[5] <= 45 / 799


def test_decode_media_unknown_format_raises():
    from es_indexer_spark.ops.multimodal import decode_media

    with pytest.raises(ValueError):
        decode_media(b"\x89PNG....", "image/png")


def test_extract_features_real_ppm_path(spark):
    """The mapInPandas feature extraction drives the REAL decoder when rows
    carry PPM payloads (mixed with fake rows in one batch)."""
    import numpy as np

    from es_indexer_spark.ops.multimodal import encode_ppm, extract_features

    img = np.full((4, 6, 3), 200, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_ppm(img)),
         {"format": "image/ppm", "width": 6, "height": 4, "n_bytes": 0}),
        (2, bytearray(b"fake-bytes"),
         {"format": "fake/raw", "width": 0, "height": 0, "n_bytes": 9}),
    ]
    from es_indexer_spark.ops.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r["feature"] for r in extract_features(media).collect()}
    assert out[1][:2] == [6.0, 4.0] and out[1][2] == 200.0
    assert all(0 <= v < 1 for v in out[2])  # sha-fake stays in [0,1)


def test_resize_media_real_ppm(spark):
    import numpy as np

    from es_indexer_spark.ops.multimodal import (
        MEDIA_SCHEMA, decode_ppm, encode_ppm, resize_image, resize_media,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)),
          {"format": "image/ppm", "width": 8, "height": 10, "n_bytes": 0})],
        MEDIA_SCHEMA,
    )
    r = resize_media(media, 4, 5).collect()[0]
    assert r["meta"]["format"] == "image/ppm"
    got = decode_ppm(bytes(r["payload"]))
    assert got.shape == (5, 4, 3)
    assert np.array_equal(got, resize_image(img, 4, 5))
    # nearest-neighbor: every output pixel exists in the source
    src = {tuple(px) for px in img.reshape(-1, 3)}
    assert all(tuple(px) in src for px in got.reshape(-1, 3))


@pytest.fixture(scope="module")
def embeddings(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    return spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

# ---------------------------------------------------------------- IVF ANN
def test_ann_ivf_full_probe_equals_brute(spark, embeddings):
    from es_indexer_spark.ops.similarity import ann_brute_topk, ann_ivf_topk

    qvec = [float(x) for x in embeddings.limit(1).collect()[0]["embedding"]]
    brute = ann_brute_topk(embeddings, "vec_id", "embedding", qvec, k=10).collect()
    full = ann_ivf_topk(
        embeddings, "vec_id", "embedding", qvec, k=10, n_centroids=8, nprobe=8
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]


def test_ann_ivf_partial_probe_subset(spark, embeddings):
    from es_indexer_spark.ops.similarity import ann_brute_topk, ann_ivf_topk

    qvec = [float(x) for x in embeddings.limit(1).collect()[0]["embedding"]]
    approx = ann_ivf_topk(
        embeddings, "vec_id", "embedding", qvec, k=10, n_centroids=8, nprobe=2
    ).collect()
    assert 0 < len(approx) <= 10
    # scores must be true cosines: every returned pair appears in the full ranking
    allc = {
        r["vec_id"]: r["cosine"]
        for r in ann_brute_topk(
            embeddings, "vec_id", "embedding", qvec, k=10_000
        ).collect()
    }
    for r in approx:
        assert allc[r["vec_id"]] == r["cosine"]
    # probing the nearest cells should recover the overall top hit
    top = ann_brute_topk(embeddings, "vec_id", "embedding", qvec, k=1).collect()[0]
    assert approx[0]["vec_id"] == top["vec_id"]


def test_ann_lsh_full_probe_equals_brute(vectors):
    """probe_hamming == band width probes every bucket → exactly brute force
    (the contract entry's oracle-checkable parameterization)."""
    df, q = vectors
    brute = ann_brute_topk(df, "vec_id", "embedding", q, k=10).collect()
    full = ann_lsh_topk(df, "vec_id", "embedding", q, k=10, probe_hamming=8).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]


def test_ann_ivf_index_artifact(spark, embeddings, tmp_path):
    """Build-time IVF artifact: centroids stored, cells partition-pruned at
    query time, full probe over the artifact equals brute (no training and no
    assignment work in the query path)."""
    from es_indexer_spark.ops.similarity import (
        ann_brute_topk,
        ann_ivf_topk,
        build_ivf_index,
        load_ivf_centroids,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(embeddings, "vec_id", "embedding", idx, n_centroids=8)
    cent = load_ivf_centroids(spark, idx)
    assert cent.shape[0] == 8
    qvec = [float(x) for x in embeddings.limit(1).collect()[0]["embedding"]]
    brute = ann_brute_topk(embeddings, "vec_id", "embedding", qvec, k=10).collect()
    full = ann_ivf_topk(
        None, "vec_id", "embedding", qvec, k=10, nprobe=8, index_dir=idx, spark=spark
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]
    # partial probe reads only the probed cells' files (partition pruning)
    part = ann_ivf_topk(
        None, "vec_id", "embedding", qvec, k=10, nprobe=2, index_dir=idx, spark=spark
    )
    assert 0 < len(part.collect()) <= 10
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # cell filter present for partition pruning


# ---------------------------------------------------------------- multimodal resize/frames
def test_resize_media_schema_and_meta(spark, documents):
    from es_indexer_spark.ops.multimodal import pack_media, resize_media

    media = pack_media(documents.limit(20), "doc_id", "text")
    out = resize_media(media, 32, 48).collect()
    assert len(out) == 20
    for r in out:
        assert r["meta"]["format"] == "fake/resized"
        assert (r["meta"]["width"], r["meta"]["height"]) == (32, 48)
        assert r["meta"]["n_bytes"] == len(r["payload"]) == max(1, (32 * 48) // 64)


def test_sample_frames_fanout(spark, documents):
    from es_indexer_spark.ops.multimodal import pack_media, sample_frames

    media = pack_media(documents.limit(20), "doc_id", "text")
    src = {r["doc_id"]: r["meta"]["n_bytes"] for r in media.collect()}
    frames = sample_frames(media, every_n=10).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert set(by_doc) == set(src)
    for d, idxs in by_doc.items():
        n_frames = max(1, src[d] // 1000 + 1)
        assert sorted(idxs) == list(range(0, n_frames, 10))
        assert len(set(idxs)) == len(idxs)


def test_token_counts_bpe_matches_re_reference(spark):
    """n_bpe_tokens == what Python's re produces with the same pattern —
    a third engine (after DuckDB's RE2) agreeing on the pre-tokenizer count."""
    import re

    from es_indexer_spark.ops.textstats import BPE_PATTERN, token_counts

    samples = [
        "don't stop",                      # contraction split: don / 't / stop
        "hello  world 123!",               # multi-space run, digit run, punct
        "it's we're i'll they'd i'm you've",
        "   ",                             # whitespace only -> 0
        "",                                # empty -> 0
        "CamelCase under_score 3.14 -- ok",
    ]
    pat = re.compile(BPE_PATTERN)
    want = {
        i: sum(1 for m in pat.findall(s.lower()) if m.strip())
        for i, s in enumerate(samples)
    }
    df = spark.createDataFrame(list(enumerate(samples)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in token_counts(df, "doc_id", "text").collect()
    }
    assert got == want
    assert want[0] == 3 and want[3] == 0 and want[4] == 0


# ---- pairs -> clusters (connected components + survivor selection) ----------


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_chain_and_clique(spark):
    """A diameter-4 chain forces >1 propagation round; min label wins."""
    from es_indexer_spark.ops.dedup import connected_components

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(pairs, "doc1 long, doc2 long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_dedup_components_matches_union_find(spark, documents):
    from es_indexer_spark.ops.dedup import dedup_components, ngram_jaccard_pairs

    pairs = [
        (r["doc1"], r["doc2"])
        for r in ngram_jaccard_pairs(
            documents, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    ]
    assert pairs  # corpus has near-dups by construction
    exp = _union_find(pairs)
    got = {
        r["doc_id"]: r["component"]
        for r in dedup_components(documents, "doc_id", "text").collect()
    }
    assert got == exp


def test_dedup_survivors_keep_canonical(spark, documents):
    from es_indexer_spark.ops.dedup import dedup_survivors, ngram_jaccard_pairs

    pairs = [
        (r["doc1"], r["doc2"])
        for r in ngram_jaccard_pairs(
            documents, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    ]
    comp = _union_find(pairs)
    drop = {d for d, c in comp.items() if d != c}
    all_ids = {r["doc_id"] for r in documents.select("doc_id").collect()}
    got = {
        r["doc_id"]
        for r in dedup_survivors(documents, "doc_id", "text").collect()
    }
    assert got == all_ids - drop


def test_related_record_links_shape_and_order(spark):
    """J4: parent -> siblings -> children ordering, json title packing,
    uuid: href, non-{parent,sibling,child} relations ignored, linkless
    records get an empty array; the dim side broadcasts."""
    from es_indexer_spark.ops.relational import related_record_links

    records = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    assoc = spark.createDataFrame(
        [
            (1, "child", 30, "Tc", "Dc"),
            (1, "parent", 10, "Tp", "Dp"),
            (1, "sibling", 20, "Ts", "Ds"),
            (1, "related", 99, "Tx", "Dx"),  # ignored rel
            (2, "child", 5, "T5", "D5"),
            (2, "child", 41, "T41", "D41"),
        ],
        "record_id long, rel string, related_id long, title string, description string",
    )
    out = related_record_links(records, assoc)
    got = {r["doc_id"]: r["links"] for r in out.collect()}
    assert [l["rel"] for l in got[1]] == ["parent", "sibling", "child"]
    assert got[1][0]["href"] == "uuid:10"
    assert got[1][0]["title"] == '{"title":"Tp","recordAbstract":"Dp"}'
    assert all(l["type"] == "application/json" for l in got[1])
    # children ordered by related-id string ("41" < "5" lexicographically —
    # deterministic, mirrored by the oracle)
    assert [l["href"] for l in got[2]] == ["uuid:41", "uuid:5"]
    assert got[3] == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cloud_asset_entries_media_rule_and_null(spark):
    """J5: media type by dname suffix, dname-or-key title, records without
    datasets keep a NULL assets map (reference returns null, not {})."""
    from es_indexer_spark.ops.relational import cloud_asset_entries

    records = spark.createDataFrame([(1,), (2,)], "doc_id long")
    datasets = spark.createDataFrame(
        [
            (1, "a", "x.parquet"),
            (1, "b", "y.zarr"),
            (1, "c", None),
        ],
        "record_id long, key string, dname string",
    )
    out = {r["doc_id"]: r["assets"] for r in cloud_asset_entries(records, datasets).collect()}
    a = out[1]
    assert a["a"]["type"] == "application/x-parquet" and a["a"]["title"] == "x.parquet"
    assert a["b"]["type"] == "application/x-zarr"
    assert a["c"]["type"] == "application/json" and a["c"]["title"] == "c"
    assert all(v["role"] == "summary" and v["href"] is None for v in a.values())
    assert out[2] is None
