"""Codec roundtrip properties (FIXTURES.md F6; pack.h:315-325 semantics)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xapian_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(arr), len(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=1, max_value=2**62), min_size=0, max_size=500, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_docid_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    enc = codec.encode_docids(arr)
    assert np.array_equal(codec.decode_docids(enc, len(arr)), arr)


def test_single_byte_fast_path():
    arr = np.arange(0, 128, dtype=np.uint64)
    enc = codec.vbyte_encode(arr)
    assert len(enc) == 128  # 1 byte per value
    assert np.array_equal(codec.vbyte_decode(enc, 128), arr)


def test_compression_ratio_dense():
    # dense docids → ~1 byte/posting after delta
    arr = np.arange(1, 100001, dtype=np.uint64)
    assert len(codec.encode_docids(arr)) <= 100000 + 4
