"""Delta + varbyte posting-list codec (SURVEY.md §2 B4, north rule).

The reference gap-encodes docIDs and positions but stores every field as a
fixed 4-byte u32 (reference: engine/indexing/spimi.py:145-187).  Here the
same logical record — ``df, then per posting (doc_gap, tf, pos_gaps...)`` —
is compressed with classic varbyte (7 data bits per byte, high bit set on the
terminal byte of each value), giving ~1 byte per small gap instead of 4.

Everything is vectorized numpy — these kernels run inside Arrow-batched
pandas UDFs on executors (no per-row Python, per the north rule).  Values
must be < 2**56 (docID gaps, tfs and position gaps are far below).
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)
_TERM_BIT = np.uint8(0x80)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array (little-endian 7-bit
    groups; high bit marks the final byte of each value)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1 — computed by
    # repeated shifts (<= 8 iterations for 56-bit values)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _SEVEN
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= _SEVEN
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    # fill byte slot k of every value that has >k bytes (vectorized per slot)
    max_b = int(nbytes.max())
    shifted = v.copy()
    for k in range(max_b):
        alive = nbytes > k
        idx = starts[alive] + k
        out[idx] = (shifted[alive] & _MASK7).astype(np.uint8)
        shifted = shifted >> _SEVEN
    out[ends - 1] |= _TERM_BIT
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & _TERM_BIT) > 0
    n_vals = int(term.sum())
    # group index per byte: number of terminators strictly before it
    grp = np.zeros(b.size, dtype=np.int64)
    np.cumsum(term[:-1], out=grp[1:])
    starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
    within = np.arange(b.size, dtype=np.int64) - starts[grp]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        _SEVEN * within.astype(np.uint64)
    )
    values = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(values, grp, contrib)
    return values


def delta_encode(sorted_vals: np.ndarray, first_prev: int = 0) -> np.ndarray:
    """Gaps of a sorted array (first gap relative to ``first_prev``) —
    the reference's gap scheme (spimi.py:160-186)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0] - np.uint64(first_prev)
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray, first_prev: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64) + np.uint64(first_prev)


def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions_flat: np.ndarray,
) -> bytes:
    """One posting block -> one varbyte blob.

    Layout mirrors the reference record (spimi.py:145-187) minus the term
    header (the term is a table column):
        n_postings, then per posting: doc_gap, tf, pos_gap * tf
    positions_flat is the concatenation of each posting's sorted positions
    (length == tfs.sum()).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    positions_flat = np.asarray(positions_flat, dtype=np.uint64)
    n = doc_ids.size
    if n == 0:
        return varbyte_encode(np.zeros(1, dtype=np.uint64))
    doc_gaps = delta_encode(doc_ids)
    # per-posting position gaps: delta within each posting's own list
    pos_gaps = positions_flat.copy()
    if positions_flat.size:
        pos_gaps[1:] = positions_flat[1:] - positions_flat[:-1]
        starts = np.concatenate(([0], np.cumsum(tfs[:-1]))).astype(np.int64)
        pos_gaps[starts] = positions_flat[starts]
    # interleave: [n] + per posting (doc_gap, tf, pos_gaps...)
    total = 1 + 2 * n + positions_flat.size
    stream = np.empty(total, dtype=np.uint64)
    stream[0] = n
    # slot index of each posting's doc_gap in the stream
    rec_len = 2 + tfs  # doc_gap + tf + tf positions
    rec_start = 1 + np.concatenate(([0], np.cumsum(rec_len[:-1]))).astype(np.int64)
    stream[rec_start] = doc_gaps
    stream[rec_start + 1] = tfs
    if positions_flat.size:
        pos_slots = np.arange(total, dtype=np.int64)
        mask = np.ones(total, dtype=bool)
        mask[0] = False
        mask[rec_start] = False
        mask[rec_start + 1] = False
        stream[pos_slots[mask]] = pos_gaps
    return varbyte_encode(stream)


def decode_block(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_block` ->
    (doc_ids, tfs, positions_flat)."""
    stream = varbyte_decode(blob)
    if stream.size == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z, z
    n = int(stream[0])
    body = stream[1:]
    doc_gaps = np.empty(n, dtype=np.uint64)
    tfs = np.empty(n, dtype=np.uint64)
    # walk record starts (data-dependent: each record is 2 + tf slots);
    # this scalar loop is over *postings in one block* (bounded by the block
    # size, default 128) — not over corpus rows
    pos_list = []
    off = 0
    for i in range(n):
        doc_gaps[i] = body[off]
        tf = int(body[off + 1])
        tfs[i] = tf
        pos_list.append(body[off + 2 : off + 2 + tf])
        off += 2 + tf
    doc_ids = delta_decode(doc_gaps)
    positions_flat = (
        np.concatenate([delta_decode(p) for p in pos_list])
        if pos_list
        else np.empty(0, dtype=np.uint64)
    )
    return doc_ids, tfs, positions_flat
