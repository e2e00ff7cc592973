"""Delta-gap + variable-byte posting compression (numpy-vectorized).

The reference delta-encodes position lists above a threshold
(``/root/reference/src/domain/ShardedInvertedIndex.ts:93-118,264-287``);
this module generalizes that into the standard inverted-index codec
(VByte over delta gaps — Williams & Zobel style, public technique) applied
to doc-id gaps, term frequencies, doc lengths and position lists.

Everything is vectorized: encode/decode cost is a handful of numpy passes
per block, no per-integer Python loop, so ``map_groups``/``map_batches``
stages stay cheap at scale.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

_THRESH = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def varbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode a uint64 array (little-endian 7-bit groups, high bit =
    continuation)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # exact byte length per value: 1 + (#thresholds <= v), via binary
    # search (no n×9 comparison matrix)
    lengths = np.searchsorted(_THRESH, v, side="right") + 1
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    out = np.zeros(int(lengths.sum()), dtype=np.uint8)
    for k in range(10):
        sel = lengths > k
        if not sel.any():
            break
        chunk = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (lengths[sel] > k + 1).astype(np.uint8) << 7
        out[offsets[sel] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_encode_with_offsets(values: np.ndarray) -> Tuple[bytes, np.ndarray]:
    """Like :func:`varbyte_encode` but also returns the ``n+1`` byte offsets
    of each value in the blob, so a caller can slice out contiguous value
    ranges (used to cut one whole-batch encode into per-block slices —
    keeps the posting-block builder fully vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bounds = np.zeros(v.size + 1, dtype=np.int64)
    if v.size == 0:
        return b"", bounds
    lengths = np.searchsorted(_THRESH, v, side="right") + 1
    np.cumsum(lengths, out=bounds[1:])
    offsets = bounds[:-1]
    out = np.zeros(int(bounds[-1]), dtype=np.uint8)
    for k in range(10):
        sel = lengths > k
        if not sel.any():
            break
        chunk = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (lengths[sel] > k + 1).astype(np.uint8) << 7
        out[offsets[sel] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes(), bounds


def varbyte_decode(blob: bytes | memoryview) -> np.ndarray:
    """Decode a VByte blob back into a uint64 array.

    One numpy pass per byte-length tier (mirrors the encoder) instead of
    a byte-granular repeat + reduceat — ~10-50× faster on the 1-2-byte
    gaps/tfs that dominate posting data."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(raw < 128)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = (raw[starts] & np.uint8(0x7F)).astype(np.uint64)
    for k in range(1, int(lengths.max())):
        sel = lengths > k
        out[sel] |= (
            raw[starts[sel] + k].astype(np.uint64) & np.uint64(0x7F)
        ) << np.uint64(7 * k)
    return out


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Strictly-increasing (or non-decreasing) array → first value + gaps."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    if gaps.size == 0:
        return np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(gaps, dtype=np.uint64)


def encode_sorted(values: np.ndarray) -> bytes:
    """delta + varbyte for a sorted array (doc ids, positions)."""
    return varbyte_encode(delta_encode(values))


def decode_sorted(blob: bytes | memoryview) -> np.ndarray:
    return delta_decode(varbyte_decode(blob))


def encode_positions(positions_per_doc: Sequence[np.ndarray]) -> bytes:
    """Encode per-doc sorted position lists as one blob:
    ``[n_0, gaps_0..., n_1, gaps_1..., ...]`` varbyte-encoded."""
    parts: List[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.uint64)
        parts.append(np.array([p.size], dtype=np.uint64))
        if p.size:
            parts.append(delta_encode(p))
    if not parts:
        return b""
    return varbyte_encode(np.concatenate(parts))


def decode_positions(blob: bytes | memoryview, n_docs: int) -> List[np.ndarray]:
    """Inverse of :func:`encode_positions`."""
    flat = varbyte_decode(blob)
    out: List[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        n = int(flat[i])
        i += 1
        out.append(delta_decode(flat[i : i + n]))
        i += n
    return out


def positions_lengths(blob: bytes | memoryview, n_docs: int) -> np.ndarray:
    """Per-doc position counts without materializing the lists."""
    flat = varbyte_decode(blob)
    counts = np.empty(n_docs, dtype=np.int64)
    i = 0
    for d in range(n_docs):
        n = int(flat[i])
        counts[d] = n
        i += 1 + n
    return counts
