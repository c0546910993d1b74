"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no codec libraries, so the DECODE step is stubbed
behind a deterministic fake (`fake_decode=True`) or raises
NotImplementedError — but the Spark-side plumbing is real and tested:
binary schema, Arrow batch shape through mapInPandas, partition-count
preservation, metadata extraction. Swap `_decode_stub` for
PIL/ffmpeg in production; nothing else changes.

Scale notes: binary payloads ride the normal columnar path (Parquet
BYTE_ARRAY); decode is a map-only Arrow stage — one pass, no shuffle;
feature vectors come back as array<float> ready for datapipe.similarity.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16


def binary_meta(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Treat the payload as binary and extract metadata JVM-side:
    byte length + sha256 — the typed-metadata pattern for any blob
    column (works unchanged on real image bytes)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"),
    )


def _decode_stub(blob: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': md5-seeded feature vector in
    [-1, 1]. Replace with a real image/audio decoder in production."""
    h = hashlib.md5(blob).digest()
    seed = int.from_bytes(h[:8], "big") % (2 ** 32)
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, FEATURE_DIM).astype(np.float32)


def extract_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", fake_decode: bool = True) -> DataFrame:
    """(doc_id, n_bytes, features array<float>): Arrow-batched decode +
    feature extraction via mapInPandas. Batch shape: whole Arrow record
    batches in, one pandas frame out — no per-row Python dispatch."""
    if not fake_decode:
        raise NotImplementedError(
            "real codecs unavailable in this container; pass fake_decode=True"
        )
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["blob"]]
            feats = [_decode_stub(b).tolist() for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "features": feats,
                }
            )

    return src.mapInPandas(
        decode_batches, schema="doc_id long, n_bytes long, features array<float>"
    )


def resize_images(df: DataFrame, target_w: int = 8, target_h: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  fake_decode: bool = True) -> DataFrame:
    """Image-resize plumbing: blob -> decode to a HxW pixel array ->
    area (block-mean) downsample to target -> re-encoded bytes. The
    decode is the deterministic fake (md5-seeded pixels + source dims
    derived from the payload); the numpy resample, Arrow batch shape,
    and binary-out schema are the real production plumbing — swap the
    decode for PIL and nothing else changes."""
    if not fake_decode:
        raise NotImplementedError(
            "real codecs unavailable in this container; pass fake_decode=True"
        )
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sw, sh, out_blob, out_sha = [], [], [], [], []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                h_d = hashlib.md5(b).digest()
                # fake source dims + pixels, deterministic in the payload
                src_h = target_h * (1 + h_d[0] % 4)
                src_w = target_w * (1 + h_d[1] % 4)
                rng = np.random.default_rng(int.from_bytes(h_d[:8], "big") % (2 ** 32))
                px = rng.integers(0, 256, (src_h, src_w), dtype=np.uint8)
                # area downsample: mean over (src_h/target_h, src_w/target_w) tiles
                small = (
                    px.reshape(target_h, src_h // target_h,
                               target_w, src_w // target_w)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.uint8)
                )
                raw = small.tobytes()
                ids.append(did)
                sw.append(src_w)
                sh.append(src_h)
                out_blob.append(raw)
                out_sha.append(hashlib.sha256(raw).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "src_w": sw, "src_h": sh,
                 "resized": out_blob, "resized_sha": out_sha}
            )

    return src.mapInPandas(
        resize,
        schema="doc_id long, src_w int, src_h int, resized binary, resized_sha string",
    )


def frame_sample(df: DataFrame, n_frames: int = 4, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling plumbing: one input row -> n_frames
    output rows (doc_id, frame_idx, frame_sha) — the explode-shaped
    mapInPandas pattern for frame/segment extraction."""
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step:(i + 1) * step]
                    ids.append(did)
                    idxs.append(i)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return src.mapInPandas(sample, schema="doc_id long, frame_idx int, frame_sha string")


def byte_features(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bytes, mean_byte, std_byte, byte_entropy,
    n_distinct_bytes): REAL codec-free feature extraction over the
    binary payload — byte-level statistics (the standard cheap
    image/audio screening features: uniformity, dynamic range,
    entropy), computed with numpy over Arrow batches via mapInPandas.
    Unlike the decode stub this is the production computation itself,
    not a fake: byte statistics need no codec, and the same
    mapInPandas stage carries a real decoder's pixel statistics
    unchanged. Map-only, one pass; exact enough to replay in SQL
    (population std, natural-log entropy, all rounded to 6)."""
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "mean_byte": [],
                   "std_byte": [], "byte_entropy": [], "n_distinct_bytes": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                n = arr.size
                out["doc_id"].append(did)
                out["n_bytes"].append(int(n))
                if n == 0:
                    out["mean_byte"].append(0.0)
                    out["std_byte"].append(0.0)
                    out["byte_entropy"].append(0.0)
                    out["n_distinct_bytes"].append(0)
                    continue
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / n
                out["mean_byte"].append(round(float(arr.mean()), 6))
                out["std_byte"].append(round(float(arr.astype(np.float64).std()), 6))
                out["byte_entropy"].append(round(float(-(p * np.log(p)).sum()), 6))
                out["n_distinct_bytes"].append(int((counts > 0).sum()))
            yield pd.DataFrame(out)

    return src.mapInPandas(
        stats,
        schema="doc_id long, n_bytes long, mean_byte double, std_byte double,"
               " byte_entropy double, n_distinct_bytes long",
    )
