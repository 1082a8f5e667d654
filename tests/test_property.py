"""Property-based round-trip tests (hypothesis) — beyond the reference's own
test strategy (SURVEY.md §5 notes rugo has no randomized testing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from rugo_spark.block import decode_array, encode_array
from rugo_spark.codecs import BYTES_CODECS, INT_CODECS


int_arrays = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62 - 1), min_size=0, max_size=300
).map(lambda xs: np.array(xs, dtype=np.int64))


@settings(max_examples=60, deadline=None)
@given(values=int_arrays, codec=st.sampled_from(sorted(INT_CODECS)))
def test_int_codecs_roundtrip(values, codec):
    enc, dec = INT_CODECS[codec]
    try:
        blob = enc(values)
    except OverflowError:
        return  # selector-avoided regime
    np.testing.assert_array_equal(dec(blob), values)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096), codec=st.sampled_from(sorted(BYTES_CODECS)))
def test_bytes_codecs_roundtrip(data, codec):
    enc, dec = BYTES_CODECS[codec]
    assert dec(enc(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31 - 1), max_size=50)),
        min_size=0,
        max_size=60,
    )
)
def test_token_list_blocks_roundtrip(rows):
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    blob, _ = encode_array(arr)
    assert decode_array(blob, arr.type).equals(arr)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(st.one_of(st.none(), st.text(max_size=60)), min_size=0, max_size=80)
)
def test_string_blocks_roundtrip(rows):
    arr = pa.array(rows, type=pa.string())
    blob, _ = encode_array(arr)
    assert decode_array(blob, arr.type).equals(arr)
