"""Posting-list compression: FOR bit-packing + VByte, numpy-vectorized.

Mirrors the reference's layout decisions (semantics, not bytes):
  - full blocks of 128 values bit-packed with a per-block width
    (Lucene50PostingsFormat.java:397 BLOCK_SIZE=128; ForUtil.java:40-130),
  - tail (< 128 entries) VInt-encoded with freq==1 folded into the doc
    delta's low bit: (delta<<1)|1 vs delta<<1, freq
    (Lucene50PostingsWriter.java:322-351),
  - df==1 terms pulsed: the single (docID, tf) lives in the term-level
    metadata, no blob (singletonDocID, Lucene50PostingsWriter.java:333),
  - per-block (max_doc, max_tf, min_norm) metadata — the Spark analog of
    skip lists: queries prune whole blocks by metadata instead of
    pointer-chasing (SURVEY §4), and block-max WAND needs max_tf.

Everything encodes/decodes whole numpy arrays per call — these run
inside Arrow UDFs on 1000s of postings per batch, no per-row Python.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------------------
# FOR (Frame of Reference) bit-packing of uint32 arrays
# ---------------------------------------------------------------------------

def for_encode(values: np.ndarray) -> bytes:
    """Pack a uint32 array: [u8 bitwidth][u32 n][packed LSB-first bits]."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return struct.pack("<BI", 0, 0)
    maxv = int(v.max())
    width = max(1, maxv.bit_length())
    # expand each value into `width` bits, LSB first, then packbits
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8).reshape(-1)
    packed = np.packbits(bits, bitorder="little")
    return struct.pack("<BI", width, n) + packed.tobytes()


def for_decode(blob: bytes, offset: int = 0) -> Tuple[np.ndarray, int]:
    """Inverse of for_encode; returns (uint32 array, bytes consumed)."""
    width, n = struct.unpack_from("<BI", blob, offset)
    header = struct.calcsize("<BI")
    if n == 0:
        return np.array([], dtype=np.uint32), header
    nbytes = (n * width + 7) // 8
    raw = np.frombuffer(blob, dtype=np.uint8, count=nbytes, offset=offset + header)
    bits = np.unpackbits(raw, bitorder="little")[: n * width].reshape(n, width)
    weights = (1 << np.arange(width, dtype=np.uint64))
    vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
    return vals.astype(np.uint32), header + nbytes


# ---------------------------------------------------------------------------
# VByte (VInt) — vectorized encode/decode of uint64 arrays
# ---------------------------------------------------------------------------

def vbyte_encode(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    out = bytearray()
    # vectorized per-7-bit-group extraction
    groups = [(v >> np.uint64(7 * i)) & np.uint64(0x7F) for i in range(10)]
    need = np.ones(len(v), dtype=np.int64)
    for i in range(1, 10):
        need = np.where((v >> np.uint64(7 * i)) > 0, i + 1, need)
    for idx in range(len(v)):
        k = int(need[idx])
        for g in range(k):
            byte = int(groups[g][idx])
            if g < k - 1:
                byte |= 0x80
            out.append(byte)
    return bytes(out)


def vbyte_decode(blob: bytes, count: int, offset: int = 0) -> Tuple[np.ndarray, int]:
    arr = np.frombuffer(blob, dtype=np.uint8, offset=offset)
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    for i in range(count):
        val = 0
        shift = 0
        while True:
            b = int(arr[pos])
            pos += 1
            val |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        out[i] = val
    return out, pos


# ---------------------------------------------------------------------------
# Lucene-style posting-list codec (docs + freqs), for the property suite
# ---------------------------------------------------------------------------

def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Full-list codec: [u32 df][i64 singleton_or_-1] then, unless
    pulsed: FOR-128 full blocks of (deltas, tfs) + VByte tail with the
    freq==1 low-bit folding."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    df = len(doc_ids)
    assert df == len(tfs) and df > 0
    if df == 1:
        # singleton pulse: docID in header, tf implicit = totalTermFreq
        return struct.pack("<Iq q", df, int(doc_ids[0]), int(tfs[0]))
    out = [struct.pack("<Iq q", df, -1, -1)]
    # deltas from previous docID; first delta is from 0 (absolute first doc)
    deltas = np.diff(doc_ids, prepend=0).astype(np.uint64)
    n_full = df // BLOCK_SIZE
    for bi in range(n_full):
        sl = slice(bi * BLOCK_SIZE, (bi + 1) * BLOCK_SIZE)
        out.append(for_encode(deltas[sl]))
        out.append(for_encode(tfs[sl].astype(np.uint64)))
    tail = slice(n_full * BLOCK_SIZE, df)
    tail_d = deltas[tail]
    tail_f = tfs[tail]
    folded = np.where(tail_f == 1, (tail_d << np.uint64(1)) | np.uint64(1), tail_d << np.uint64(1))
    pieces = []
    for d, f in zip(folded, tail_f):
        pieces.append(vbyte_encode(np.array([d], dtype=np.uint64)))
        if f != 1:
            pieces.append(vbyte_encode(np.array([f], dtype=np.uint64)))
    out.extend(pieces)
    return b"".join(out)


def decode_posting_list(blob: bytes) -> Tuple[np.ndarray, np.ndarray]:
    df, singleton, st = struct.unpack_from("<Iq q", blob, 0)
    off = struct.calcsize("<Iq q")
    if singleton >= 0:
        return (np.array([singleton], dtype=np.int64), np.array([st], dtype=np.int64))
    deltas = np.empty(df, dtype=np.uint64)
    tfs = np.empty(df, dtype=np.int64)
    n_full = df // BLOCK_SIZE
    for bi in range(n_full):
        d, used = for_decode(blob, off)
        off += used
        f, used = for_decode(blob, off)
        off += used
        deltas[bi * BLOCK_SIZE : (bi + 1) * BLOCK_SIZE] = d
        tfs[bi * BLOCK_SIZE : (bi + 1) * BLOCK_SIZE] = f
    i = n_full * BLOCK_SIZE
    while i < df:
        v, used = vbyte_decode(blob, 1, off)
        off += used
        folded = int(v[0])
        if folded & 1:
            deltas[i] = folded >> 1
            tfs[i] = 1
        else:
            deltas[i] = folded >> 1
            f, used = vbyte_decode(blob, 1, off)
            off += used
            tfs[i] = int(f[0])
        i += 1
    doc_ids = np.cumsum(deltas.astype(np.int64))
    return doc_ids, tfs


# ---------------------------------------------------------------------------
# Segment block codec: self-describing blocks (the storage the engine
# actually queries). One block row = up to BLOCK_SIZE postings of one
# term: FOR-packed (doc deltas from base_doc, tfs, norm bytes).
# ---------------------------------------------------------------------------

def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    positions: np.ndarray | None = None,
) -> bytes:
    """positions: flat concatenation of each posting's sorted positions
    (len == sum(tfs)); stored delta-encoded within each posting."""
    base = int(doc_ids[0])
    deltas = np.diff(np.asarray(doc_ids, dtype=np.int64), prepend=base).astype(np.uint64)
    out = (
        struct.pack("<qB", base, 1 if positions is not None else 0)
        + for_encode(deltas)
        + for_encode(np.asarray(tfs, dtype=np.uint64))
        + for_encode(np.asarray(norm_bytes, dtype=np.uint64))
    )
    if positions is not None:
        pos = np.asarray(positions, dtype=np.int64)
        # delta within each posting: subtract previous position, reset at
        # posting starts (first position of each posting stays absolute)
        d = np.diff(pos, prepend=0)
        starts = np.zeros(len(pos), dtype=bool)
        starts[np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]] = True
        starts[0] = True
        d = np.where(starts, pos, d).astype(np.uint64)
        out += for_encode(d)
    return out


def decode_block(blob: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    (base, _has_pos) = struct.unpack_from("<qB", blob, 0)
    off = 9
    deltas, used = for_decode(blob, off)
    off += used
    tfs, used = for_decode(blob, off)
    off += used
    norms, used = for_decode(blob, off)
    doc_ids = base + np.cumsum(deltas.astype(np.int64))
    return doc_ids, tfs.astype(np.int64), norms.astype(np.int64)


def decode_block_positions(blob: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like decode_block but also returns the flat positions array
    (empty if the block was written without positions)."""
    (base, has_pos) = struct.unpack_from("<qB", blob, 0)
    off = 9
    deltas, used = for_decode(blob, off)
    off += used
    tfs, used = for_decode(blob, off)
    off += used
    norms, used = for_decode(blob, off)
    off += used
    doc_ids = base + np.cumsum(deltas.astype(np.int64))
    tfs_i = tfs.astype(np.int64)
    if not has_pos:
        return doc_ids, tfs_i, norms.astype(np.int64), np.array([], dtype=np.int64)
    pd_, used = for_decode(blob, off)
    d = pd_.astype(np.int64)
    # invert the per-posting delta encoding: cumsum within posting spans
    starts = np.zeros(len(d), dtype=bool)
    if len(d):
        starts[0] = True
        starts[np.cumsum(tfs_i)[:-1]] = True
    # vectorized segmented cumsum: pos = cumsum(d) - (cumsum before the
    # posting's start). (g-d) at starts is monotone, so max-accumulate
    # broadcasts each posting's base forward.
    g = np.cumsum(d)
    seg_base = np.maximum.accumulate(np.where(starts, g - d, -(2**62)))
    return doc_ids, tfs_i, norms.astype(np.int64), g - seg_base


def split_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    lengths: np.ndarray,
    positions: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> List[dict]:
    """Split one term's sorted postings into block rows with WAND metadata.

    positions: flat concat of each posting's sorted positions (len ==
    sum(tfs)), or None to omit positions from the blocks.
    """
    out = []
    n = len(doc_ids)
    pos_offsets = np.concatenate([[0], np.cumsum(np.asarray(tfs, dtype=np.int64))])
    for lo in range(0, n, block_size):
        hi = min(lo + block_size, n)
        d, f, nb, ln = doc_ids[lo:hi], tfs[lo:hi], norm_bytes[lo:hi], lengths[lo:hi]
        p = None
        if positions is not None:
            p = positions[pos_offsets[lo] : pos_offsets[hi]]
        out.append(
            {
                "block_ord": lo // block_size,
                "n": hi - lo,
                "min_doc": int(d[0]),
                "max_doc": int(d[-1]),
                "max_tf": int(f.max()),
                "sum_tf": int(f.sum()),
                "min_norm": int(nb[int(np.argmin(ln))]),
                "blob": encode_block(d, f, nb, p),
            }
        )
    return out
