"""Posting-list compression: delta + varbyte encoding with block-max
metadata (north-rule requirement; the reference keeps raw per-doc dicts in a
pickle, service/build_text_index.py:403-410 — no compressed index exists
there, so this layout is designed Spark-first).

Layout: postings sorted by (term, doc_int); each term's list is cut into
blocks of <= block_size docs. Per block we store:

    first_doc  - absolute first docID (int64)
    n          - docs in block
    doc_deltas - varbyte(d_1..d_{n-1}) where d_i = doc_i - doc_{i-1}
    tfs        - varbyte(tf_0..tf_{n-1})
    max_score  - max over the block of doc_weight * idf * tf*(k1+1) /
                 (tf + k1*(1-b+b*dl/avgdl))  — a valid per-(term,block)
                 upper bound on any contained doc's contribution INCLUDING
                 its weight multiplier, so sum-of-block-maxima bounds the
                 total weighted score (block-max WAND safe; see
                 index/query.py)

Varbyte: big-endian 7-bit digits, high bit set on the TERMINAL byte.
Encode/decode are numpy-vectorized (no per-value Python in decode, which is
the query-time hot path; max 5 digit-rounds for 32-bit deltas).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode; also returns per-value byte lengths so a
    caller can slice the stream into sub-ranges (block encoding encodes a
    whole partition in ONE call and slices per block)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # number of 7-bit digits per value (>=1), by repeated shift-and-compare
    lengths = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(128)
    work = v.copy()
    while True:
        bigger = work >= thresh
        if not bigger.any():
            break
        lengths[bigger] += 1
        work = work >> np.uint64(7)
        work[~bigger] = 0
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(lengths) - 1  # index of terminal byte per value
    # place digits least-significant-first walking backwards from the end
    rem = v.copy()
    pos = ends.copy()
    active = np.ones(v.shape, dtype=bool)
    first = True
    while active.any():
        digit = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        if first:
            digit = digit | np.uint8(0x80)  # terminal byte marker
        out[pos[active]] = digit
        rem[active] = rem[active] >> np.uint64(7)
        pos[active] -= 1
        starts = ends - lengths + 1
        active = active & (pos >= starts)
        first = False
    return out.tobytes(), lengths


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    return varbyte_encode_with_lengths(values)[0]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    digits = (b & 0x7F).astype(np.uint64)
    is_last = (b & 0x80) != 0
    ends = np.nonzero(is_last)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    lmax = int(lengths.max())
    for l in range(lmax):
        sel = lengths > l
        vals[sel] = (vals[sel] << np.uint64(7)) | digits[starts[sel] + l]
    return vals


def encode_blocks_for_term(
    doc_ints: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray,
    block_size: int,
) -> list[tuple[int, int, int, int, bytes, bytes, float]]:
    """Cut one term's sorted postings into encoded blocks.

    Returns [(block_id, first_doc, last_doc, n, doc_deltas, tfs_vb,
    max_score)]. ``doc_ints`` must be sorted ascending; ``scores`` are the
    weighted per-doc contributions used for the block-max bound.
    """
    out = []
    n = len(doc_ints)
    for bi, lo in enumerate(range(0, n, block_size)):
        hi = min(lo + block_size, n)
        docs = doc_ints[lo:hi].astype(np.uint64)
        deltas = np.diff(docs)
        out.append(
            (
                bi,
                int(docs[0]),
                int(docs[-1]),
                hi - lo,
                varbyte_encode(deltas),
                varbyte_encode(tfs[lo:hi].astype(np.uint64)),
                float(scores[lo:hi].max()),
            )
        )
    return out


def decode_block(first_doc: int, n: int, doc_deltas: bytes, tfs: bytes) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ints int64[n], tfs int64[n])."""
    deltas = varbyte_decode(doc_deltas)
    docs = np.empty(n, dtype=np.int64)
    docs[0] = first_doc
    if n > 1:
        docs[1:] = first_doc + np.cumsum(deltas.astype(np.int64))
    return docs, varbyte_decode(tfs).astype(np.int64)
