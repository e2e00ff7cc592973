import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.codecs import (
    decode_positions,
    decode_sorted,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_sorted,
    positions_lengths,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_small_values():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384], dtype=np.uint64)
    blob = varbyte_encode(v)
    assert varbyte_decode(blob).tolist() == v.tolist()
    # 0..127 take one byte, 128..16383 two, 16384 three
    assert len(blob) == 3 * 1 + 3 * 2 + 1 * 3


def test_varbyte_u64_max():
    v = np.array([2**64 - 1, 2**63, 0], dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=100).map(sorted)
)
def test_sorted_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert decode_sorted(encode_sorted(v)).tolist() == values


def test_delta():
    v = np.array([5, 9, 9, 30], dtype=np.uint64)
    assert delta_encode(v).tolist() == [5, 4, 0, 21]
    assert delta_decode(delta_encode(v)).tolist() == v.tolist()


def test_positions_roundtrip():
    per_doc = [
        np.array([0, 3, 17], dtype=np.uint64),
        np.array([], dtype=np.uint64),
        np.array([2], dtype=np.uint64),
        np.array([1, 2, 3, 4, 1000], dtype=np.uint64),
    ]
    blob = encode_positions(per_doc)
    out = decode_positions(blob, len(per_doc))
    assert [o.tolist() for o in out] == [p.tolist() for p in per_doc]
    assert positions_lengths(blob, len(per_doc)).tolist() == [3, 0, 1, 5]


def test_compression_is_compact():
    # 10k dense doc ids: gaps of 1 → one byte each (plus the big first value)
    ids = np.arange(10_000, dtype=np.uint64) + 5_000_000
    blob = encode_sorted(ids)
    assert len(blob) < 10_000 + 10
