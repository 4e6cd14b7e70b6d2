"""sampler / diversified_sampler / significant_text — independent Python
references over the tokenized corpus.
"""

from __future__ import annotations

import pytest

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.aggs import sampler_hits, sampler_terms, significant_text
from es_indexer_spark.query.boolean import bool_query


@pytest.fixture(scope="module")
def samp_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_samp"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100, n_ckpt_batches=2,
    )
    rows = documents.select("doc_id", "text", "lang", "source").collect()
    toks = {r["doc_id"]: tokenize_one(r["text"], "standard") for r in rows}
    meta = {r["doc_id"]: (r["lang"], r["source"]) for r in rows}
    return root, toks, meta


def _hits(spark, root):
    return sorted(
        (
            (r["docid"], r["score"])
            for r in bool_query(spark, root, should=["data stream"], k=None).collect()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )


def test_sampler_hits_top_by_score(spark, samp_index):
    root, _, _ = samp_index
    got = sampler_hits(spark, root, "data stream", shard_size=25).collect()
    exp = _hits(spark, root)[:25]
    assert [(r["docid"], r["score"]) for r in got] == exp


def test_diversified_caps_per_value(spark, samp_index):
    root, _, meta = samp_index
    got = sampler_hits(
        spark, root, "data stream", shard_size=15,
        diversify_field="source", max_docs_per_value=2,
    ).collect()
    # brute: rank within each source, keep <=2, then global top 15
    ranked: dict[str, int] = {}
    kept = []
    for d, s in _hits(spark, root):
        src = meta[d][1]
        ranked[src] = ranked.get(src, 0) + 1
        if ranked[src] <= 2:
            kept.append((d, s))
    exp = kept[:15]
    assert [(r["docid"], r["score"]) for r in got] == exp
    per_src: dict[str, int] = {}
    for d, _ in exp:
        per_src[meta[d][1]] = per_src.get(meta[d][1], 0) + 1
    assert max(per_src.values()) <= 2


def test_sampler_terms_counts(spark, samp_index):
    root, _, meta = samp_index
    got = sampler_terms(
        spark, root, "data stream", "lang", shard_size=25, size=10
    ).collect()
    counts: dict[str, int] = {}
    for d, _ in _hits(spark, root)[:25]:
        counts[meta[d][0]] = counts.get(meta[d][0], 0) + 1
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["key"], r["doc_count"]) for r in got] == exp


def test_significant_text_jlh_brute(spark, samp_index, documents):
    root, toks, _ = samp_index
    got = significant_text(
        spark, root, "data stream", documents, size=10, min_doc_count=3
    ).collect()
    fg = {d for d, ts in toks.items() if "data" in ts or "stream" in ts}
    nf, na = float(len(fg)), float(len(toks))
    fgc: dict[str, int] = {}
    bgc: dict[str, int] = {}
    for d, ts in toks.items():
        for t in set(ts):
            bgc[t] = bgc.get(t, 0) + 1
            if d in fg:
                fgc[t] = fgc.get(t, 0) + 1
    scored = []
    for t, c in fgc.items():
        if c >= 3:
            fp, bp = c / nf, bgc[t] / na
            scored.append((t, c, bgc[t], round((fp - bp) * (fp / bp), 8)))
    exp = sorted(scored, key=lambda r: (-r[3], r[0]))[:10]
    assert [(r["term"], r["fg_count"], r["bg_count"], r["score"]) for r in got] == exp


def test_significant_text_sample_size(spark, samp_index, documents):
    """sample_size caps the re-tokenized foreground at the top-N hits (the
    ES sampler-wrapped idiom)."""
    root, toks, _ = samp_index
    n = 10
    got = significant_text(
        spark, root, "data stream", documents, size=5,
        min_doc_count=1, sample_size=n,
    ).collect()
    fg = {d for d, _ in _hits(spark, root)[:n]}
    nf, na = float(len(fg)), float(len(toks))
    fgc: dict[str, int] = {}
    bgc: dict[str, int] = {}
    for d, ts in toks.items():
        for t in set(ts):
            bgc[t] = bgc.get(t, 0) + 1
            if d in fg:
                fgc[t] = fgc.get(t, 0) + 1
    scored = []
    for t, c in fgc.items():
        fp, bp = c / nf, bgc[t] / na
        scored.append((t, round((fp - bp) * (fp / bp), 8)))
    exp = sorted(scored, key=lambda r: (-r[1], r[0]))[:5]
    assert [(r["term"], r["score"]) for r in got] == exp


def test_term_vectors_artificial_doc(spark, samp_index):
    from es_indexer_spark.query.lookup import term_vectors

    root, toks, _ = samp_index
    out = {
        r["term"]: r
        for r in term_vectors(spark, root, "data stream data zzzqx").collect()
    }
    assert out["data"]["term_freq"] == 2 and out["data"]["positions"] == [0, 2]
    assert out["stream"]["positions"] == [1]
    assert out["zzzqx"]["doc_freq"] == 0 and out["zzzqx"]["ttf"] == 0
    assert out["data"]["doc_freq"] == sum(1 for ts in toks.values() if "data" in ts)
    assert out["data"]["ttf"] == sum(ts.count("data") for ts in toks.values())
