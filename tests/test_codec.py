"""Round-trip property tests for the delta+varbyte codec (SURVEY.md §5 item 4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.indexing.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_compression_small_gaps():
    arr = np.arange(1000, dtype=np.uint64) % 100
    assert len(varbyte_encode(arr)) == 1000  # 1 byte per small value vs 4 u32


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert delta_decode(delta_encode(arr)).tolist() == arr.tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**31),
            st.lists(st.integers(min_value=1, max_value=2**20), min_size=1, max_size=8),
        ),
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings):
    # unique sorted doc_ids; per-posting sorted positions
    seen, rows = set(), []
    for doc_id, positions in postings:
        if doc_id in seen:
            continue
        seen.add(doc_id)
        rows.append((doc_id, sorted(set(positions))))
    rows.sort()
    doc_ids = np.array([r[0] for r in rows], dtype=np.uint64)
    tfs = np.array([len(r[1]) for r in rows], dtype=np.uint64)
    flat = np.array([p for r in rows for p in r[1]], dtype=np.uint64)

    d, t, p = decode_block(encode_block(doc_ids, tfs, flat))
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert p.tolist() == flat.tolist()


def test_block_empty():
    z = np.empty(0, dtype=np.uint64)
    d, t, p = decode_block(encode_block(z, z, z))
    assert d.size == 0 and t.size == 0 and p.size == 0
