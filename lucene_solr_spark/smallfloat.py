"""Norm-byte encoding: exact reimplementation of Lucene's SmallFloat
int<->byte4 quantization (reference semantics from
lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169).

BM25 stores each doc's field length as one byte: values < 24 are exact,
larger values keep 4 significant bits (float-like, order-preserving).
All functions are pure integer math and have vectorized numpy variants
used inside Arrow UDFs.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Float-like 4-significant-bit encoding for non-negative ints."""
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24: values 0..23 encode exactly


def int_to_byte4(i: int) -> int:
    """Encode field length -> unsigned byte 0..255."""
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode unsigned byte 0..255 -> representative field length."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table (float32), the engine-wide LENGTH_TABLE analog
# (BM25Similarity.java:135-140).
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)
LENGTH_TABLE_INT = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def int_to_byte4_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array -> uint8 array."""
    x = np.asarray(lengths, dtype=np.int64)
    if (x < 0).any():
        raise ValueError("only supports positive values")
    out = np.empty(x.shape, dtype=np.int64)
    small = x < NUM_FREE_VALUES
    out[small] = x[small]
    big = ~small
    if big.any():
        v = x[big] - NUM_FREE_VALUES
        # bit_length via log2 on int64 (exact for values < 2^53):
        num_bits = np.where(v > 0, np.floor(np.log2(np.maximum(v, 1))).astype(np.int64) + 1, 0)
        sub = num_bits < 4
        shift = np.maximum(num_bits - 4, 0)
        enc = ((v >> shift) & 0x07) | ((shift + 1) << 3)
        out[big] = NUM_FREE_VALUES + np.where(sub, v, enc)
    return out.astype(np.uint8)


def byte4_to_int_np(bytes_: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int over a uint8 array -> int64 array."""
    b = np.asarray(bytes_).astype(np.int64) & 0xFF
    return LENGTH_TABLE_INT[b]
