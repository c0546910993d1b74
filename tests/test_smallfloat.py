"""Norm encoding goldens (FIXTURES.md §4) — mirrors
TestBM25Similarity.testLengthEncodingBackwardCompatibility
(lucene/core/src/test/.../similarities/TestBM25Similarity.java:80-104)."""

import numpy as np
import pytest

from lucene_solr_spark.smallfloat import (
    LENGTH_TABLE_INT,
    MAX_INT4,
    NUM_FREE_VALUES,
    byte4_to_int,
    byte4_to_int_np,
    int4_to_long,
    int_to_byte4,
    int_to_byte4_np,
    long_to_int4,
)


def test_constants():
    assert MAX_INT4 == long_to_int4(2**31 - 1)
    assert NUM_FREE_VALUES == 255 - MAX_INT4
    assert NUM_FREE_VALUES == 24  # values 0..23 are exact


def test_small_values_exact():
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_round_trip_idempotent_and_monotone():
    """decode(encode(x)) <= x, encode monotone, decode(encode(decode(b)))
    == decode(b) — the invariants Lucene's test asserts."""
    prev_b = -1
    for length in list(range(0, 4100)) + [10_000, 100_000, 2**31 - 1]:
        b = int_to_byte4(length)
        assert 0 <= b <= 255
        assert b >= prev_b or length < 4100  # monotone over increasing lengths
        d = byte4_to_int(b)
        assert d <= length
        assert int_to_byte4(d) == b  # representative is a fixpoint
        prev_b = max(prev_b, b)


def test_all_256_decode_values_strictly_increasing():
    vals = [byte4_to_int(b) for b in range(256)]
    assert vals[:NUM_FREE_VALUES] == list(range(NUM_FREE_VALUES))
    assert all(vals[i] < vals[i + 1] for i in range(255))
    assert (LENGTH_TABLE_INT == np.array(vals)).all()


def test_int4_round_trip():
    for i in [0, 1, 7, 8, 15, 16, 100, 12345, 2**31 - 1]:
        enc = long_to_int4(i)
        dec = int4_to_long(enc)
        assert dec <= i
        assert long_to_int4(dec) == enc


def test_vectorized_matches_scalar():
    xs = np.array([0, 1, 23, 24, 25, 100, 255, 1000, 4000, 10**6, 2**31 - 1])
    nb = int_to_byte4_np(xs)
    assert [int(b) for b in nb] == [int_to_byte4(int(x)) for x in xs]
    back = byte4_to_int_np(nb)
    assert [int(v) for v in back] == [byte4_to_int(int(b)) for b in nb]


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        int_to_byte4_np(np.array([-5]))
