"""Property-based tests (hypothesis) for the codec and the streaming encoder.

The reference has no randomized tests (SURVEY.md §5 "NOT present"); these go
beyond it: random inputs exercise the varint/delta codec across the full uint64
width and the seam-splitting encoder across arbitrary file-packing fragmentations
— the invariants that, if broken, corrupt the index silently.

Pure-python/numpy properties — no SparkSession needed, so this module is fast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from es_indexer_spark.index.builder import _make_encoder
from es_indexer_spark.index.codec import (
    decode_block,
    decode_positions,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_varints,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.asarray(vals, dtype=np.uint64)
    out = decode_varints(encode_varints(a))
    assert out.dtype == np.uint64
    assert np.array_equal(out, a)


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted(vals):
    a = np.sort(np.unique(np.asarray(vals, dtype=np.uint64)))
    base = int(a[0]) if a.size else 0
    gaps = delta_encode(a, base=base)
    back = delta_decode(gaps, base=base)
    assert np.array_equal(back, a)


@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=40),
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(tfs, rnd):
    tfs_arr = np.asarray(tfs, dtype=np.uint64)
    flat = []
    for tf in tfs:
        pos = sorted(rnd.sample(range(0, 10_000), tf))
        flat.extend(pos)
    flat_arr = np.asarray(flat, dtype=np.uint64)
    buf = encode_positions(flat_arr, tfs_arr)
    back = decode_positions(buf, tfs_arr)
    assert np.array_equal(back, flat_arr)


# ---------------------------------------------------------------- encoder
def _run_encoder(batches, block_size=16, shard_size=64):
    """Drive the streaming encoder directly with crafted pandas batches."""
    enc = _make_encoder(block_size, shard_size, avgdl=10.0, k1=1.2, b=0.75)
    out = list(enc(iter(batches)))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _decode_all(blocks: pd.DataFrame) -> dict[tuple, list[tuple]]:
    """(bucket, term) -> sorted [(docid, tf, dl)] decoded from all blocks."""
    got: dict[tuple, list[tuple]] = {}
    for row in blocks.itertuples(index=False):
        d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
        got.setdefault((row.bucket, row.term), []).extend(
            zip(d.tolist(), t.tolist(), l.tolist())
        )
    return {k: sorted(v) for k, v in got.items()}


@given(
    st.lists(  # fragments: each a sorted run of (docid, tf) for one term
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),
                st.integers(min_value=1, max_value=9),
            ),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=5),  # batch split granularity
)
@settings(max_examples=150, deadline=None)
def test_encoder_tolerates_arbitrary_fragmentation(fragments, n_batches):
    """The seam-splitting encoder must reproduce the exact posting multiset for
    ANY concatenation of individually-sorted fragments (the shape produced by
    salted hot-term slices and Spark small-file packing), under ANY Arrow batch
    boundary placement — with every block's docids strictly increasing."""
    rows = []
    seen_global: set[int] = set()
    for frag in fragments:
        # make the fragment internally sorted+unique, and disjoint from other
        # fragments (raw holds each (term,docid) once globally)
        frag_docids = sorted({d for d, _ in frag} - seen_global)
        seen_global.update(frag_docids)
        for d, (_, tf) in zip(frag_docids, frag):
            rows.append((0, "t", d, tf, 10))
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["bucket", "term", "docid", "tf", "doc_len"])
    # split into n_batches arbitrary contiguous Arrow batches
    splits = np.array_split(np.arange(len(pdf)), n_batches)
    batches = [pdf.iloc[ix] for ix in splits if len(ix)]
    blocks = _run_encoder(batches)
    expected = sorted((int(r[2]), int(r[3]), int(r[4])) for r in rows)
    got = _decode_all(blocks).get((0, "t"), [])
    assert got == expected
    # every emitted block is internally strictly increasing and shard-local
    for row in blocks.itertuples(index=False):
        d, _, _ = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
        assert np.all(np.diff(d.astype(np.int64)) > 0)
        assert (d // 64 == d[0] // 64).all()  # shard_size=64


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=1, max_value=200),
        ),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=100, deadline=None)
def test_encoder_blockmax_bound_holds(postings):
    """Block-max invariant: every block's stored max_score_free upper-bounds
    the BM25 idf-free factor of every posting in the block (rank-safety of the
    pruning pass depends on exactly this)."""
    from es_indexer_spark.index.codec import bm25_tf_factor

    uniq = {}
    for d, tf, dl in postings:
        uniq[d] = (tf, dl)
    rows = [(0, "t", d, tf, dl) for d, (tf, dl) in sorted(uniq.items())]
    pdf = pd.DataFrame(rows, columns=["bucket", "term", "docid", "tf", "doc_len"])
    blocks = _run_encoder([pdf])
    for row in blocks.itertuples(index=False):
        d, t, l = decode_block(row.gaps, row.tfs, row.dls, row.first_docid)
        factors = bm25_tf_factor(
            t.astype(np.float64), l.astype(np.float64), 10.0, 1.2, 0.75
        )
        assert row.max_score_free >= factors.max() - 1e-12
