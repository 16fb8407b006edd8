"""Property tests: decode(encode(x)) == x (SURVEY.md §5 test plan)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_osmosis_plugin_spark.functions.varbyte import (
    decode_posting_ids,
    delta_decode,
    delta_encode,
    encode_posting_ids,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(xs):
    a = np.array(xs, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(a)), a)


@given(st.sets(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_posting_roundtrip(xs):
    a = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(decode_posting_ids(encode_posting_ids(a)), a)


def test_delta_roundtrip_basic():
    a = np.array([0, 1, 5, 1 << 61, (1 << 62) - 1], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_empty():
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_encode_is_compact():
    # small gaps -> ~1 byte per entry
    ids = np.arange(0, 10_000, 3, dtype=np.uint64)
    buf = encode_posting_ids(ids)
    assert len(buf) < ids.size * 1.1 + 8
