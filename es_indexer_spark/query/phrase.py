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
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from es_indexer_spark.analysis.tokenizer import tokenize_one
from es_indexer_spark.index import catalog
from es_indexer_spark.index.codec import decode_block, decode_positions
from es_indexer_spark.query.bm25 import lucene_idf
from es_indexer_spark.index.tombstones import live_mask

_PHRASE_SCHEMA = "docid long, phrase_tf long, score double"


def _sorted_member(sorted_arr: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """Membership mask of ``probes`` in a SORTED array via searchsorted —
    O((|probes|+|arr|)·log) with no Python loop and no re-sort (np.isin would
    re-sort the haystack on every call)."""
    if sorted_arr.size == 0 or probes.size == 0:
        return np.zeros(probes.shape, dtype=bool)
    idx = np.searchsorted(sorted_arr, probes)
    idx[idx == sorted_arr.size] = sorted_arr.size - 1
    return sorted_arr[idx] == probes


def _chain_starts(
    term_keys: dict[str, np.ndarray], terms: list[str], slop: int,
    with_ends: bool = False,
):
    """Start keys (``docid<<32|pos``) of ORDERED sloppy-phrase matches.

    A start key ``k0`` matches when strictly-increasing positions
    ``p_0 < p_1 < ... < p_{m-1}`` exist (``p_i`` an occurrence of
    ``terms[i]``, same doc) with total displacement
    ``(p_{m-1} - p_0) - (m-1) <= slop``.  The greedy chain — always take the
    SMALLEST occurrence of the next term after the current position — decides
    matchability exactly: the greedy ``p_i`` is minimal given any feasible
    prefix and a smaller ``p_i`` never restricts later choices, so greedy
    minimizes the end position for a given start.  ``slop=0`` degenerates to
    exact adjacency and keeps the cheaper membership chain.

    All chains advance in lockstep as numpy arrays — one searchsorted per
    term, no per-doc Python.

    ``with_ends=True`` returns ``(starts, ends)`` — the greedy (minimal)
    END key per surviving start; span_first needs it (a match within the
    first N positions exists iff the MINIMAL end fits, because greedy
    minimizes the end for a given start)."""
    cand = term_keys[terms[0]]
    if slop <= 0:
        for i, t in enumerate(terms[1:], start=1):
            if cand.size == 0:
                return (cand, cand) if with_ends else cand
            cand = cand[_sorted_member(term_keys[t], cand + i)]
        return (cand, cand + (len(terms) - 1)) if with_ends else cand
    cur = cand
    for i, t in enumerate(terms[1:], start=1):
        if cand.size == 0:
            return (cand, cur[:0]) if with_ends else cand
        keys = term_keys[t]
        if keys.size == 0:
            return (cand[:0], cand[:0]) if with_ends else cand[:0]
        # successor occurrence of t strictly after cur, same doc (the +1 can
        # never roll into the next docid: positions stay far below 2^32)
        idx = np.searchsorted(keys, cur + 1)
        ok = idx < keys.size
        nk = keys[np.minimum(idx, keys.size - 1)]
        ok &= (nk >> 32) == (cur >> 32)
        # incremental displacement bound (same-doc keys subtract to position
        # deltas) — prunes dead chains before the next searchsorted
        ok &= (nk - cand) - i <= slop
        cand, cur = cand[ok], nk[ok]
    return (cand, cur) if with_ends else cand


def _phrase_shard_scorer(
    terms: list[str],
    sum_idf: float,
    k1: float,
    b: float,
    avgdl: float,
    tomb: np.ndarray | None = None,
    filter_term: str | None = None,
    slop: int = 0,
    orders: list[list[int]] | None = None,
    first_end: int | None = None,
):
    """applyInPandas per-shard phrase scorer, fully vectorized (VERDICT r2 #4
    replaced a per-posting Python dict-building loop — O(postings) Python work
    per shard for stop-wordy phrases).

    Every (docid, position) pair is packed into one int64 key
    ``docid << 32 | position`` (positions are doc offsets, far below 2^32), so
    the classic per-doc position-adjacency merge becomes ONE sorted-array
    membership chain across all docs at once: a phrase starts at key k iff
    ``k + i`` is a key of term_i for every i — the +i can never cross a docid
    boundary because positions never reach 2^32. Docs missing any term drop
    out implicitly (their keys fail the membership test).

    ``slop``: ordered sloppy matching via :func:`_chain_starts` (greedy
    successor chain; slop=0 keeps the exact-adjacency membership chain).
    ``orders``: evaluate these term-index permutations and union their start
    keys (span_near ``in_order=False``); None = the natural order only."""

    uniq_terms = sorted(set(terms))

    def score(
        pdf: pd.DataFrame, tomb_local: np.ndarray | None = None
    ) -> pd.DataFrame:
        tomb = tomb_local if tomb_local is not None else score.tomb_default
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        if len(pdf) == 0:
            return empty
        # decode per term: sorted position keys + (docid -> doc_len) arrays
        term_keys: dict[str, np.ndarray] = {}
        doc_arr: np.ndarray | None = None
        len_arr: np.ndarray | None = None
        filt_docs: np.ndarray | None = None
        for term, gg in pdf.groupby("term", sort=False):
            key_parts, d_parts, l_parts = [], [], []
            for row in gg.itertuples(index=False):
                d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
                flat = decode_positions(row.poss, t)
                d64 = d.astype(np.int64)
                if tomb is not None:
                    keep = live_mask(tomb, d64)
                    if keep is not None and not keep.all():
                        flat = flat[np.repeat(keep, t.astype(np.int64))]
                        d64, t, l = d64[keep], t[keep], l[keep]
                    if d64.size == 0:
                        continue
                doc_of_pos = np.repeat(d64, t.astype(np.int64))
                key_parts.append((doc_of_pos << 32) | flat.astype(np.int64))
                d_parts.append(d64)
                l_parts.append(l.astype(np.int64))
            if not key_parts:  # every posting of this term was tombstoned
                continue
            if term == filter_term:
                # lang-marker filter: required containment, not a chain slot
                filt_docs = np.sort(np.concatenate(d_parts))
            keys = np.concatenate(key_parts)
            keys.sort()
            term_keys[term] = keys
            if doc_arr is None:  # any one term's postings carry the doc lens
                doc_arr = np.concatenate(d_parts)
                len_arr = np.concatenate(l_parts)
        if any(t not in term_keys for t in uniq_terms):
            return empty  # conjunctive: a term absent from this shard → no match
        if filter_term is not None and filt_docs is None:
            return empty  # required lang marker absent from this shard
        # phrase-start candidates: greedy ordered chain per evaluation order,
        # unioned across orders (span_near in_order=False = OR over the
        # distinct permutations — sorting any valid unordered position set
        # yields an ordered chain of SOME permutation with the same window)
        def starts_for(order_terms: list[str]) -> np.ndarray:
            if first_end is None:
                return _chain_starts(term_keys, order_terms, slop)
            # span_first: keep starts whose MINIMAL (greedy) end position is
            # < first_end — Lucene SpanFirstQuery's exclusive end bound
            st, en = _chain_starts(term_keys, order_terms, slop, with_ends=True)
            return st[(en & 0xFFFFFFFF) < first_end]

        if orders is None:
            cand = starts_for(terms)
        else:
            parts = [starts_for([terms[i] for i in o]) for o in orders]
            parts = [p for p in parts if p.size]
            cand = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
        if cand.size == 0:
            return empty
        docids, ptf = np.unique(cand >> 32, return_counts=True)
        if filt_docs is not None:
            m = _sorted_member(filt_docs, docids)
            docids, ptf = docids[m], ptf[m]
            if docids.size == 0:
                return empty
        order = np.argsort(doc_arr, kind="stable")
        dl = len_arr[order][np.searchsorted(doc_arr[order], docids)].astype(np.float64)
        ptf = ptf.astype(np.float64)
        s = sum_idf * ptf * (k1 + 1.0) / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame(
            {"docid": docids, "phrase_tf": ptf.astype(np.int64), "score": s}
        )

    score.tomb_default = tomb
    return score


def phrase_match(
    spark: SparkSession,
    index_root: str,
    phrase: str,
    k: int | None = 10,
    *,
    slop: int = 0,
    lang: str | None = None,
    shards: Sequence[int] | None = None,
) -> DataFrame:
    """Docs containing ``phrase`` as consecutive tokens, Lucene-PhraseQuery-scored.

    ``k=None`` returns every matching doc (ordered); otherwise top-k.

    ``slop``: ES ``match_phrase`` slop with ORDERED semantics — a doc matches
    when strictly-increasing occurrences of the terms exist whose total
    displacement ``(p_last - p_first) - (m-1)`` is ``<= slop``; ``phrase_tf``
    counts the distinct start positions admitting such a chain (decided
    exactly by the greedy successor chain — :func:`_chain_starts`).
    ``slop=0`` is the exact-adjacency phrase (identical match set, tf and
    scores — pytest-pinned). Divergences from Lucene's SloppyPhraseScorer,
    documented: out-of-order transposition matches are NOT accepted (use
    :func:`span_near` with ``in_order=False``), and scoring uses
    ``phrase_tf`` in the BM25 tf slot rather than Lucene's
    ``Σ 1/(distance+1)`` sloppyFreq — deterministic and SQL-replayable.

    ``shards``: restrict evaluation to these shard ids (shard = docid //
    shard_size) — a PRUNING hook for callers that only care about a known
    docid set (rescore's window): matches outside the listed shards are NOT
    returned, so plain phrase search must leave it None.
    """
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import _tomb_mode

    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))

    from es_indexer_spark.analysis.tokenizer import split_lang_marker

    # the code chain appends a lang:<x> marker as the LAST token — it is a
    # lang-filter term, never a phrase position (it sits at the end of every
    # doc's stream, so chaining it would silently match nothing)
    terms, marker = split_lang_marker(
        tokenize_one(phrase, stats["tokenizer"], lang=lang)
    )
    if not terms:
        return spark.createDataFrame([], _PHRASE_SCHEMA)

    uniq = sorted(set(terms) | ({marker} if marker else set()))
    from es_indexer_spark.query.engine import _dict_lookup

    dict_rows = _dict_lookup(spark, vdir, uniq)
    found = {r["term"]: r for r in dict_rows}
    if any(t not in found for t in uniq):  # conjunctive: a missing term → no match
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    # Lucene PhraseQuery idf: sum of the individual term idfs (duplicate terms in
    # the phrase each contribute — Lucene sums over phrase positions); the lang
    # marker is filter context and does not score
    sum_idf = float(sum(lucene_idf(n_docs, found[t]["df"]) for t in terms))
    buckets = sorted({r["bucket"] for r in dict_rows})

    from es_indexer_spark.query.engine import _postings_df

    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(uniq)
    )
    if shards is not None:
        blocks = blocks.filter(F.col("shard").isin([int(s) for s in shards]))
    from es_indexer_spark.query.engine import _apply_scorer

    scored = _apply_scorer(
        blocks,
        _phrase_shard_scorer(
            terms, sum_idf, k1, b, avgdl, tomb,
            filter_term=marker, slop=int(slop),
        ),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out


def span_near(
    spark: SparkSession,
    index_root: str,
    clauses: Sequence[str],
    *,
    slop: int = 0,
    in_order: bool = True,
    k: int | None = 10,
    lang: str | None = None,
    first_end: int | None = None,
) -> DataFrame:
    """ES/Lucene ``span_near``: the analyzed ``clauses`` occur within a window
    of total displacement ``<= slop`` — ordered (``in_order=True``) or in any
    order. Returns ``(docid, phrase_tf, score)`` like the phrase path
    (``phrase_tf`` = distinct window-start positions; score = the
    PhraseQuery-shaped BM25 over ``phrase_tf``, sum-of-idfs weighted).

    Unordered execution: sorting any valid unordered position set yields an
    ordered chain of SOME permutation of the clauses with the same window, so
    ``in_order=False`` is the union of the DISTINCT permutations' ordered
    chains — each chain evaluated by the same vectorized greedy merge, no
    per-doc Python. Permutation count is bounded: > 6 distinct clauses raises
    (ES span queries are short by construction; 6! = 720 chains is already a
    deliberate ceiling, not a scale path).

    Reference anchor: the portal's phrase surface
    (geonetwork4-api/.../GeoNetworkServiceImpl.java:114-120) inherits ES
    ``match_phrase``/``span_near``; Lucene semantics are public."""
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import _tomb_mode

    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))
    from es_indexer_spark.analysis.tokenizer import split_lang_marker

    terms: list[str] = []
    marker = None
    for c in clauses:
        ts, m = split_lang_marker(tokenize_one(c, stats["tokenizer"], lang=lang))
        terms.extend(ts)
        marker = marker or m
    if not terms:
        return spark.createDataFrame([], _PHRASE_SCHEMA)

    orders: list[list[int]] | None = None
    if not in_order and len(terms) > 1:
        if len(set(terms)) > 6:
            raise ValueError(
                "span_near(in_order=False) supports at most 6 distinct "
                f"clauses, got {len(set(terms))}"
            )
        from itertools import permutations

        # distinct permutations only — duplicate terms would re-evaluate
        # identical chains
        seen: set[tuple[str, ...]] = set()
        orders = []
        for p in permutations(range(len(terms))):
            key = tuple(terms[i] for i in p)
            if key not in seen:
                seen.add(key)
                orders.append(list(p))

    uniq = sorted(set(terms) | ({marker} if marker else set()))
    from es_indexer_spark.query.engine import _dict_lookup

    dict_rows = _dict_lookup(spark, vdir, uniq)
    found = {r["term"]: r for r in dict_rows}
    if any(t not in found for t in uniq):
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    sum_idf = float(sum(lucene_idf(n_docs, found[t]["df"]) for t in terms))
    buckets = sorted({r["bucket"] for r in dict_rows})
    from es_indexer_spark.query.engine import _apply_scorer, _postings_df

    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(uniq)
    )
    scored = _apply_scorer(
        blocks,
        _phrase_shard_scorer(
            terms, sum_idf, k1, b, avgdl, tomb,
            filter_term=marker, slop=int(slop), orders=orders,
            first_end=int(first_end) if first_end is not None else None,
        ),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out


def span_first(
    spark: SparkSession,
    index_root: str,
    clauses: Sequence[str],
    end: int,
    *,
    slop: int = 0,
    in_order: bool = True,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES/Lucene ``span_first``: the wrapped span (a :func:`span_near` of
    ``clauses`` with ``slop``) must END within the first ``end`` positions —
    Lucene's exclusive bound (``span.end <= end`` ⇔ last matched position
    ``< end``). A start survives iff its MINIMAL (greedy) end fits, which is
    exact because greedy minimizes the end per start. ``phrase_tf`` counts
    the surviving starts."""
    return span_near(
        spark, index_root, clauses, slop=slop, in_order=in_order, k=k,
        lang=lang, first_end=int(end),
    )


def _mpp_shard_scorer(
    fixed: list[str],
    expansions: list[str],
    sum_idf: float,
    k1: float,
    b: float,
    avgdl: float,
    tomb: np.ndarray | None = None,
    filter_term: str | None = None,
):
    """Per-shard match_phrase_prefix evaluator: the fixed terms chain exactly
    like the phrase scorer; the LAST position matches the union of the
    expansion terms' position keys (Lucene MultiPhraseQuery's or-position)."""

    def score(
        pdf: pd.DataFrame, tomb_local: np.ndarray | None = None
    ) -> pd.DataFrame:
        tomb = tomb_local if tomb_local is not None else score.tomb_default
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        if len(pdf) == 0:
            return empty
        term_keys: dict[str, np.ndarray] = {}
        term_docs: dict[str, np.ndarray] = {}
        term_lens: dict[str, np.ndarray] = {}
        for term, gg in pdf.groupby("term", sort=False):
            key_parts, d_parts, l_parts = [], [], []
            for row in gg.itertuples(index=False):
                d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
                flat = decode_positions(row.poss, t)
                d64 = d.astype(np.int64)
                if tomb is not None:
                    keep = live_mask(tomb, d64)
                    if keep is not None and not keep.all():
                        flat = flat[np.repeat(keep, t.astype(np.int64))]
                        d64, t, l = d64[keep], t[keep], l[keep]
                    if d64.size == 0:
                        continue
                doc_of_pos = np.repeat(d64, t.astype(np.int64))
                key_parts.append((doc_of_pos << 32) | flat.astype(np.int64))
                d_parts.append(d64)
                l_parts.append(l.astype(np.int64))
            if not key_parts:
                continue
            keys = np.concatenate(key_parts)
            keys.sort()
            term_keys[term] = keys
            term_docs[term] = np.concatenate(d_parts)
            term_lens[term] = np.concatenate(l_parts)
        if any(t not in term_keys for t in fixed):
            return empty  # a fixed term absent from this shard → no match
        if filter_term is not None and filter_term not in term_docs:
            return empty  # required lang marker absent from this shard
        present_exp = [t for t in expansions if t in term_keys]
        if not present_exp:
            return empty
        union_keys = np.concatenate([term_keys[t] for t in present_exp])
        union_keys.sort()
        if fixed:
            cand = term_keys[fixed[0]]
            for i, t in enumerate(fixed[1:], start=1):
                if cand.size == 0:
                    return empty
                cand = cand[_sorted_member(term_keys[t], cand + i)]
            if cand.size == 0:
                return empty
            cand = cand[_sorted_member(union_keys, cand + len(fixed))]
        else:
            cand = union_keys  # bare prefix: every expansion occurrence
        if cand.size == 0:
            return empty
        docids, ptf = np.unique(cand >> 32, return_counts=True)
        if filter_term is not None:
            m = _sorted_member(np.sort(term_docs[filter_term]), docids)
            docids, ptf = docids[m], ptf[m]
            if docids.size == 0:
                return empty
        # doc lengths: a fixed term's postings cover every final doc; with no
        # fixed terms, merge the expansions' (docid, len) pairs
        if fixed:
            doc_arr, len_arr = term_docs[fixed[0]], term_lens[fixed[0]]
        else:
            doc_arr = np.concatenate([term_docs[t] for t in present_exp])
            len_arr = np.concatenate([term_lens[t] for t in present_exp])
        order = np.argsort(doc_arr, kind="stable")
        dl = len_arr[order][np.searchsorted(doc_arr[order], docids)].astype(np.float64)
        ptf_f = ptf.astype(np.float64)
        s = sum_idf * ptf_f * (k1 + 1.0) / (ptf_f + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame(
            {"docid": docids, "phrase_tf": ptf.astype(np.int64), "score": s}
        )

    score.tomb_default = tomb
    return score


def match_phrase_prefix(
    spark: SparkSession,
    index_root: str,
    query: str,
    k: int | None = 10,
    max_expansions: int = 50,
    *,
    lang: str | None = None,
) -> DataFrame:
    """ES ``match_phrase_prefix`` (type-ahead phrase search): the final query
    token is treated as a PREFIX, dictionary-expanded (capped at
    ``max_expansions``, highest-df kept — Lucene's top-terms rewrite bound),
    and a doc matches where the fixed tokens are consecutive and followed by
    ANY expansion. ``phrase_tf`` counts such occurrences.

    Scoring: Lucene's MultiPhraseQuery treats the expanded position as one
    or-position. We score with the PhraseQuery formula where the expanded
    position contributes ``idf(min(n_docs, Σ df(expansion)))`` — the union
    df upper bound, a deterministic, SQL-replayable analog of the or-position
    (NOT bit-identical to Lucene's MultiPhrase idf, which sums all expansion
    idfs and overweights wide prefixes; documented divergence).

    Execution = the phrase path: one dictionary lookup (prefix row-group
    range), one pruned postings scan, per-shard vectorized key-chain merge,
    global top-k."""
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import _tomb_mode

    # past DISTRIBUTED_TOMB_THRESHOLD the delete set cogroups with the blocks
    # (shard-keyed, one shared shuffle) instead of a driver-collected array
    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))
    from es_indexer_spark.analysis.tokenizer import split_lang_marker

    # the lang marker is the code chain's LAST token — without the split it
    # would be mistaken for the user's prefix (and the real prefix demoted
    # to an exact term); it acts as a required filter term instead
    toks, marker = split_lang_marker(
        tokenize_one(query, stats["tokenizer"], lang=lang)
    )
    if not toks:
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    fixed, prefix = toks[:-1], toks[-1]

    from es_indexer_spark.query.engine import _dict_df

    d = _dict_df(spark, vdir)
    exp_rows = (
        d.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    if not exp_rows:
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    uniq_fixed = sorted(set(fixed) | ({marker} if marker else set()))
    fixed_rows = (
        d.filter(F.col("term").isin(uniq_fixed)).collect() if uniq_fixed else []
    )
    found = {r["term"]: r for r in fixed_rows}
    if any(t not in found for t in uniq_fixed):
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    union_df = min(n_docs, sum(r["df"] for r in exp_rows))
    sum_idf = float(
        sum(lucene_idf(n_docs, found[t]["df"]) for t in fixed)
        + lucene_idf(n_docs, union_df)
    )
    expansions = sorted(r["term"] for r in exp_rows)
    all_terms = sorted(set(uniq_fixed) | set(expansions))
    buckets = sorted(
        {r["bucket"] for r in fixed_rows} | {r["bucket"] for r in exp_rows}
    )
    from es_indexer_spark.query.engine import _postings_df

    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    )
    from es_indexer_spark.query.engine import _apply_scorer

    scored = _apply_scorer(
        blocks,
        _mpp_shard_scorer(fixed, expansions, sum_idf, k1, b, avgdl, tomb,
                          filter_term=marker),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out


def _span_or_shard_scorer(terms: list[str], sum_idf: float, k1, b, avgdl, tomb):
    """Per-shard Lucene ``SpanOrQuery`` scorer: a doc matches when ANY clause
    term occurs; freq = the total span (occurrence) count across clauses,
    scored with the union SpanWeight (sum of the clause idfs — Lucene builds
    one SimWeight over all wrapped terms). Positions are not needed — the
    per-doc tf sums are already in the posting blocks."""

    def score(pdf: pd.DataFrame, tomb_local: np.ndarray | None = None) -> pd.DataFrame:
        tomb = tomb_local if tomb_local is not None else score.tomb_default
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        d_parts, t_parts, l_parts = [], [], []
        for row in pdf.itertuples(index=False):
            d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
            d64 = d.astype(np.int64)
            if tomb is not None:
                keep = live_mask(tomb, d64)
                if keep is not None and not keep.all():
                    d64, t, l = d64[keep], t[keep], l[keep]
            if d64.size:
                d_parts.append(d64)
                t_parts.append(t.astype(np.int64))
                l_parts.append(l.astype(np.int64))
        if not d_parts:
            return empty
        docs = np.concatenate(d_parts)
        tfs = np.concatenate(t_parts)
        lens = np.concatenate(l_parts)
        order = np.argsort(docs, kind="stable")
        docs, tfs, lens = docs[order], tfs[order], lens[order]
        uniq, start = np.unique(docs, return_index=True)
        ptf = np.add.reduceat(tfs, start).astype(np.float64)
        dl = lens[start].astype(np.float64)
        s = sum_idf * ptf * (k1 + 1.0) / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame(
            {"docid": uniq, "phrase_tf": ptf.astype(np.int64), "score": s}
        )

    score.tomb_default = tomb
    return score


def span_or(
    spark: SparkSession,
    index_root: str,
    clauses: Sequence[str],
    *,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES/Lucene ``span_or``: union of the clause spans. Returns
    ``(docid, phrase_tf, score)`` — phrase_tf = total occurrences across the
    clauses, scored with the combined SpanWeight (sum of clause idfs), the
    public Lucene SpanOrQuery behavior. One pruned postings scan over the
    clause terms' buckets; the per-shard combine is pure numpy reduceat."""
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import (
        _apply_scorer,
        _dict_lookup,
        _postings_df,
        _tomb_mode,
    )

    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))
    terms = sorted(
        {
            t
            for c in clauses
            for t in tokenize_one(c, stats["tokenizer"], lang=lang)
        }
    )
    if not terms:
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    dict_rows = [r for r in _dict_lookup(spark, vdir, terms) if r is not None]
    if not dict_rows:
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    # absent clauses contribute nothing (disjunction) but keep their weight
    # out of the sum — Lucene computes the SimWeight over the FOUND terms
    sum_idf = float(sum(lucene_idf(n_docs, r["df"]) for r in dict_rows))
    buckets = sorted({r["bucket"] for r in dict_rows})
    found = sorted({r["term"] for r in dict_rows})
    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(found)
    )
    scored = _apply_scorer(
        blocks,
        _span_or_shard_scorer(found, sum_idf, k1, b, avgdl, tomb),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out


def _span_not_shard_scorer(
    include: str, exclude: str, idf: float, k1, b, avgdl, tomb, pre: int, post: int
):
    """Per-shard Lucene ``SpanNotQuery`` scorer over single-term spans: an
    include occurrence at position p survives unless an exclude occurrence
    sits within [p - pre, p + post]. Same packed ``docid<<32|pos`` int64 keys
    as the phrase scorer: the window test is two searchsorted probes against
    the sorted exclude keys (clamped to the doc floor so a window never leaks
    into the previous doc; it cannot reach the next doc because positions are
    far below 2^32)."""

    def score(pdf: pd.DataFrame, tomb_local: np.ndarray | None = None) -> pd.DataFrame:
        tomb = tomb_local if tomb_local is not None else score.tomb_default
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        inc_keys, inc_docs, inc_lens, exc_parts = [], [], [], []
        for term, gg in pdf.groupby("term", sort=False):
            for row in gg.itertuples(index=False):
                d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
                flat = decode_positions(row.poss, t)
                d64 = d.astype(np.int64)
                if term == include and tomb is not None:
                    keep = live_mask(tomb, d64)
                    if keep is not None and not keep.all():
                        flat = flat[np.repeat(keep, t.astype(np.int64))]
                        d64, t, l = d64[keep], t[keep], l[keep]
                if d64.size == 0:
                    continue
                keys = (np.repeat(d64, t.astype(np.int64)) << 32) | flat.astype(
                    np.int64
                )
                if term == include:
                    inc_keys.append(keys)
                    inc_docs.append(d64)
                    inc_lens.append(l.astype(np.int64))
                else:
                    exc_parts.append(keys)
        if not inc_keys:
            return empty
        ik = np.concatenate(inc_keys)
        if exc_parts:
            ek = np.sort(np.concatenate(exc_parts))
            floor = (ik >> 32) << 32
            lo = np.maximum(ik - pre, floor)
            hi = ik + post
            hit = np.searchsorted(ek, hi, side="right") > np.searchsorted(
                ek, lo, side="left"
            )
            ik = ik[~hit]
        if ik.size == 0:
            return empty
        docids, ptf = np.unique(ik >> 32, return_counts=True)
        docs = np.concatenate(inc_docs)
        lens = np.concatenate(inc_lens)
        order = np.argsort(docs, kind="stable")
        dl = lens[order][np.searchsorted(docs[order], docids)].astype(np.float64)
        ptf = ptf.astype(np.float64)
        s = idf * ptf * (k1 + 1.0) / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame(
            {"docid": docids, "phrase_tf": ptf.astype(np.int64), "score": s}
        )

    score.tomb_default = tomb
    return score


def span_not(
    spark: SparkSession,
    index_root: str,
    include: str,
    exclude: str,
    *,
    pre: int = 0,
    post: int = 0,
    k: int | None = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES/Lucene ``span_not``: occurrences of ``include`` with no ``exclude``
    occurrence within ``pre`` positions before or ``post`` after (Lucene's
    dist parameters; 0/0 = overlap-only, which single-term spans can never
    trigger — pass pre/post >= 1 for adjacency exclusion). Returns
    ``(docid, phrase_tf, score)``; phrase_tf = surviving include occurrences,
    scored by the include term's BM25 weight (the SpanNot weight is the
    include span's, Lucene semantics — the exclusion only drops spans)."""
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import (
        _apply_scorer,
        _dict_lookup,
        _postings_df,
        _tomb_mode,
    )

    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))
    inc_terms = tokenize_one(include, stats["tokenizer"], lang=lang)
    exc_terms = tokenize_one(exclude, stats["tokenizer"], lang=lang)
    if len(inc_terms) != 1 or len(exc_terms) != 1:
        raise ValueError("span_not wraps single-term spans on each side")
    inc, exc = inc_terms[0], exc_terms[0]
    if inc == exc:
        raise ValueError("include and exclude must differ")
    dict_rows = _dict_lookup(spark, vdir, sorted({inc, exc}))
    found = {r["term"]: r for r in dict_rows}
    if inc not in found:
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    idf = float(lucene_idf(n_docs, found[inc]["df"]))
    buckets = sorted({r["bucket"] for r in dict_rows})
    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(sorted(found))
    )
    scored = _apply_scorer(
        blocks,
        _span_not_shard_scorer(
            inc, exc, idf, k1, b, avgdl, tomb, int(pre), int(post)
        ),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out


def _span_multi_scorer(
    slots: list[list[str]],
    sum_idf: float,
    k1,
    b,
    avgdl,
    tomb,
    slop: int = 0,
    orders: list[list[int]] | None = None,
):
    """Per-shard scorer for span_near chains whose SLOTS are term SETS
    (Lucene SpanMultiTermQueryWrapper): slot i matches at a position where
    ANY of its terms occurs. Each slot's position keys are the merged union
    of its present terms' keys — one sorted int64 array per slot — and the
    chain then runs EXACTLY like the single-term sloppy merge
    (:func:`_chain_starts` over synthetic per-slot names). Two terms can
    never share a (doc, position), so the union concat is duplicate-free."""
    flat = sorted({t for s in slots for t in s})

    def score(pdf: pd.DataFrame, tomb_local: np.ndarray | None = None) -> pd.DataFrame:
        tomb = tomb_local if tomb_local is not None else score.tomb_default
        empty = pd.DataFrame({"docid": [], "phrase_tf": [], "score": []})
        if len(pdf) == 0:
            return empty
        term_keys: dict[str, np.ndarray] = {}
        doc_arr: np.ndarray | None = None
        len_arr: np.ndarray | None = None
        for term, gg in pdf.groupby("term", sort=False):
            if term not in flat:
                continue
            key_parts, d_parts, l_parts = [], [], []
            for row in gg.itertuples(index=False):
                d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
                flat_pos = decode_positions(row.poss, t)
                d64 = d.astype(np.int64)
                if tomb is not None:
                    keep = live_mask(tomb, d64)
                    if keep is not None and not keep.all():
                        flat_pos = flat_pos[np.repeat(keep, t.astype(np.int64))]
                        d64, t, l = d64[keep], t[keep], l[keep]
                    if d64.size == 0:
                        continue
                doc_of_pos = np.repeat(d64, t.astype(np.int64))
                key_parts.append((doc_of_pos << 32) | flat_pos.astype(np.int64))
                d_parts.append(d64)
                l_parts.append(l.astype(np.int64))
            if not key_parts:
                continue
            keys = np.concatenate(key_parts)
            keys.sort()
            term_keys[term] = keys
            if doc_arr is None:
                doc_arr = np.concatenate(d_parts)
                len_arr = np.concatenate(l_parts)
            else:
                doc_arr = np.concatenate([doc_arr, np.concatenate(d_parts)])
                len_arr = np.concatenate([len_arr, np.concatenate(l_parts)])
        slot_keys: dict[str, np.ndarray] = {}
        names: list[str] = []
        for i, s in enumerate(slots):
            parts = [term_keys[t] for t in s if t in term_keys]
            if not parts:
                return empty  # a required slot absent from this shard
            u = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts))
            nm = f"#{i}"
            slot_keys[nm] = u
            names.append(nm)
        if orders is None:
            cand = _chain_starts(slot_keys, names, slop)
        else:
            parts = [
                _chain_starts(slot_keys, [names[i] for i in o], slop)
                for o in orders
            ]
            parts = [p for p in parts if p.size]
            cand = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
        if cand.size == 0:
            return empty
        docids, ptf = np.unique(cand >> 32, return_counts=True)
        order = np.argsort(doc_arr, kind="stable")
        dl = len_arr[order][np.searchsorted(doc_arr[order], docids)].astype(np.float64)
        ptf_f = ptf.astype(np.float64)
        s = sum_idf * ptf_f * (k1 + 1.0) / (ptf_f + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame(
            {"docid": docids, "phrase_tf": ptf.astype(np.int64), "score": s}
        )

    score.tomb_default = tomb
    return score


def span_multi_near(
    spark: SparkSession,
    index_root: str,
    clauses: Sequence[str],
    *,
    slop: int = 0,
    in_order: bool = True,
    k: int | None = 10,
    lang: str | None = None,
    max_expansions: int = 50,
) -> DataFrame:
    """ES/Lucene ``span_near`` whose clauses may be ``span_multi`` wrappers:
    a clause ending in ``*`` matches ANY dictionary expansion of its prefix
    at that chain position (Lucene SpanMultiTermQueryWrapper around a
    PrefixQuery, top-``max_expansions``-by-df rewrite — the same cap as
    match_phrase_prefix). Literal clauses chain exactly as
    :func:`span_near`; with no ``*`` clause the two functions agree
    (pytest-pinned).

    Scoring keeps the phrase shape: a multi slot contributes
    ``idf(min(n_docs, Σ df(expansion)))`` — the union-df bound, the same
    deterministic or-position analog as match_phrase_prefix — and literal
    slots their own idf; ``phrase_tf`` counts distinct chain starts.

    Execution: ONE dictionary lookup resolves the expansions driver-side
    (O(max_expansions) rows), one pruned postings scan over all slot terms,
    per-shard union-merge + the vectorized greedy chain. ``in_order=False``
    unions the distinct slot permutations (<= 6 slots, as span_near)."""
    vdir = catalog.resolve(index_root)
    stats = catalog.read_stats(vdir)
    if not stats.get("positions"):
        raise ValueError(
            f"index at {index_root} was built without store_positions=True"
        )
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    from es_indexer_spark.query.engine import (
        _apply_scorer,
        _dict_df,
        _dict_lookup,
        _postings_df,
        _tomb_mode,
    )
    from es_indexer_spark.analysis.tokenizer import split_lang_marker

    tomb, tomb_shards = _tomb_mode(spark, vdir, int(stats["shard_size"]))

    slots: list[list[str]] = []
    slot_dfs: list[float] = []
    d = None
    for c in clauses:
        if c.endswith("*") and len(c) > 1:
            body = c[:-1]
            if "*" in body or "?" in body:
                raise ValueError(
                    "span_multi supports a single trailing * prefix"
                )
            ts, _m = split_lang_marker(
                tokenize_one(body, stats["tokenizer"], lang=lang)
            )
            if len(ts) != 1:
                raise ValueError(
                    f"a span_multi prefix must analyze to one token, got {ts!r}"
                )
            if d is None:
                d = _dict_df(spark, vdir)
            rows = (
                d.filter(F.col("term").startswith(ts[0]))
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(int(max_expansions))
                .collect()
            )
            if not rows:
                return spark.createDataFrame([], _PHRASE_SCHEMA)
            slots.append(sorted(r["term"] for r in rows))
            slot_dfs.append(float(min(n_docs, sum(r["df"] for r in rows))))
        else:
            ts, _m = split_lang_marker(
                tokenize_one(c, stats["tokenizer"], lang=lang)
            )
            for t in ts:
                slots.append([t])
                slot_dfs.append(-1.0)  # resolved from the dict below
    if not slots:
        return spark.createDataFrame([], _PHRASE_SCHEMA)

    lit_terms = sorted({s[0] for s, df_ in zip(slots, slot_dfs) if df_ < 0})
    found = {r["term"]: r for r in _dict_lookup(spark, vdir, lit_terms)}
    if any(t not in found for t in lit_terms):
        return spark.createDataFrame([], _PHRASE_SCHEMA)
    sum_idf = 0.0
    for s, df_ in zip(slots, slot_dfs):
        sum_idf += lucene_idf(
            n_docs, found[s[0]]["df"] if df_ < 0 else df_
        )

    orders: list[list[int]] | None = None
    if not in_order and len(slots) > 1:
        if len(slots) > 6:
            raise ValueError(
                "span_multi_near(in_order=False) supports at most 6 slots"
            )
        from itertools import permutations

        seen: set[tuple[tuple[str, ...], ...]] = set()
        orders = []
        for p in permutations(range(len(slots))):
            key = tuple(tuple(slots[i]) for i in p)
            if key not in seen:
                seen.add(key)
                orders.append(list(p))

    all_terms = sorted({t for s in slots for t in s})
    dict_rows = _dict_lookup(spark, vdir, all_terms)
    buckets = sorted({r["bucket"] for r in dict_rows})
    present = sorted({r["term"] for r in dict_rows})
    blocks = _postings_df(spark, vdir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(present)
    )
    scored = _apply_scorer(
        blocks,
        _span_multi_scorer(
            slots, float(sum_idf), k1, b, avgdl, tomb,
            slop=int(slop), orders=orders,
        ),
        tomb_shards,
        schema=_PHRASE_SCHEMA,
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(k) if k is not None else out
