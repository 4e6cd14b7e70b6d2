"""Codec round-trip + block-max invariants (SURVEY.md §5 carry-over #5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from es_indexer_spark.index.codec import (
    bm25_tf_factor,
    decode_block,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_blocks,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(a)), a)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    a = np.sort(np.array(vals, dtype=np.uint64))
    base = int(a[0])
    assert np.array_equal(delta_decode(delta_encode(a, base=base), base=base), a)


def test_varint_empty():
    assert encode_varints(np.empty(0, dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0


def test_block_roundtrip_and_blockmax_bound():
    rng = np.random.default_rng(42)
    n = 1000
    docids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(10, 2000, size=n).astype(np.uint64)
    avgdl, k1, b = 350.0, 1.2, 0.75
    blocks = encode_blocks(docids, tfs, dls, avgdl, k1, b, block_size=128)

    out_d, out_t, out_l = [], [], []
    for blk in blocks:
        d, t, l = decode_block(blk["gaps"], blk["tfs"], blk["dls"], blk["first_docid"])
        assert d[0] == blk["first_docid"] and d[-1] == blk["last_docid"]
        assert d.size == blk["n"]
        # block-max bound: max stored score factor >= every member's factor
        factors = bm25_tf_factor(t, l, avgdl, k1, b)
        assert blk["max_score_free"] >= factors.max() - 1e-12
        assert blk["max_tf"] == int(t.max())
        out_d.append(d)
        out_t.append(t)
        out_l.append(l)
    assert np.array_equal(np.concatenate(out_d), docids)
    assert np.array_equal(np.concatenate(out_t), tfs)
    assert np.array_equal(np.concatenate(out_l), dls)
