"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata — with REAL pure-numpy decoders for the
uncompressed formats (PPM/PGM images, PCM WAV audio, a trivial
concatenated-frame video container). No codec libraries needed: these
formats are header + raw samples, so decode is numpy slicing.

Compressed formats (JPEG/PNG/MP4) still raise NotImplementedError —
the container ships no codec libs — but the whole pipeline after
decode (area resize, feature extraction, frame sampling, byte/pixel
statistics) runs on real decoded planes, through the same
mapInPandas stages a PIL/ffmpeg decoder would feed.

Scale notes: binary payloads ride the normal columnar path (Parquet
BYTE_ARRAY); decode is a map-only Arrow stage — one pass, no shuffle;
feature vectors come back as array<float> ready for datapipe.similarity.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# Pure-numpy codecs for uncompressed formats (no external libs).
# ---------------------------------------------------------------------------

def _parse_pnm_header(blob: bytes) -> Tuple[str, int, int, int, int]:
    """Parse a PPM(P6)/PGM(P5) binary header: returns (magic, w, h,
    maxval, data_offset). Whitespace/comment handling per the netpbm
    spec (tokens separated by blanks, '#' comments to EOL)."""
    magic = blob[:2].decode("ascii", "strict")
    if magic not in ("P5", "P6"):
        raise ValueError(f"not a binary PGM/PPM: magic {magic!r}")
    i, toks = 2, []
    n = len(blob)
    while len(toks) < 3:
        while i < n and blob[i:i + 1].isspace():
            i += 1
        if i < n and blob[i:i + 1] == b"#":
            while i < n and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not blob[j:j + 1].isspace():
            j += 1
        toks.append(int(blob[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = toks
    return magic, w, h, maxval, i


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 array (h, w, 3); PGM (P5) -> (h, w).
    Real decoder: header parse + one np.frombuffer reshape."""
    magic, w, h, maxval, off = _parse_pnm_header(blob)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    px = np.frombuffer(blob, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def encode_ppm(px: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM P6; (h, w) -> PGM P5."""
    if px.ndim == 3:
        h, w, ch = px.shape
        assert ch == 3
        head = f"P6\n{w} {h}\n255\n".encode()
    else:
        h, w = px.shape
        head = f"P5\n{w} {h}\n255\n".encode()
    return head + px.astype(np.uint8).tobytes()


def decode_wav(blob: bytes) -> Tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono/stereo -> (sample_rate, int16 samples
    [n, channels]). Walks RIFF chunks (fmt / data) per the spec."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(blob)
    rate = channels = bits = None
    data = None
    while i + 8 <= n:
        cid = blob[i:i + 4]
        size = int.from_bytes(blob[i + 4:i + 8], "little")
        body = blob[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError(f"non-PCM wav (format {fmt})")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only PCM16 supported (got {bits}-bit)")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, samples.reshape(-1, channels)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 [n] or [n, channels] -> RIFF/WAVE PCM16."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    byte_rate = rate * channels * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    chunk = b"data" + len(data).to_bytes(4, "little") + data
    riff_len = 4 + len(fmt) + len(chunk)
    return b"RIFF" + riff_len.to_bytes(4, "little") + b"WAVE" + fmt + chunk


FRAMES_MAGIC = b"FRAMES\n"


def decode_frames(blob: bytes) -> np.ndarray:
    """Trivial concatenated-frame video container:
    b"FRAMES\\n<n> <w> <h>\\n" + n raw grayscale planes (w*h bytes
    each) -> uint8 array (n, h, w)."""
    if not blob.startswith(FRAMES_MAGIC):
        raise ValueError("not a FRAMES container")
    eol = blob.index(b"\n", len(FRAMES_MAGIC))
    nf, w, h = (int(x) for x in blob[len(FRAMES_MAGIC):eol].split())
    px = np.frombuffer(blob, dtype=np.uint8, count=nf * w * h, offset=eol + 1)
    return px.reshape(nf, h, w)


def encode_frames(frames: np.ndarray) -> bytes:
    """uint8 (n, h, w) -> FRAMES container bytes."""
    nf, h, w = frames.shape
    return (FRAMES_MAGIC + f"{nf} {w} {h}\n".encode()
            + frames.astype(np.uint8).tobytes())


def area_resize(px: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Area (block-mean) downsample of a (h, w[, c]) uint8 plane to
    (target_h, target_w[, c]), truncating the mean toward zero (SQL
    floor(avg) semantics so relational oracles replay it exactly).
    Arbitrary source dims: rows/cols are partitioned into near-equal
    bins (np.add.reduceat), the standard INTER_AREA shape."""
    h, w = px.shape[:2]
    if h % target_h == 0 and w % target_w == 0:
        bh, bw = h // target_h, w // target_w
        if px.ndim == 3:
            out = px.reshape(target_h, bh, target_w, bw, -1).astype(
                np.float64).mean(axis=(1, 3))
        else:
            out = px.reshape(target_h, bh, target_w, bw).astype(
                np.float64).mean(axis=(1, 3))
        return out.astype(np.uint8)  # truncation == floor for >= 0
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    ycnt = np.diff(np.append(ys, h)).astype(np.float64)
    xcnt = np.diff(np.append(xs, w)).astype(np.float64)
    acc = np.add.reduceat(px.astype(np.float64), ys, axis=0)
    acc = np.add.reduceat(acc, xs, axis=1)
    if px.ndim == 3:
        out = acc / (ycnt[:, None, None] * xcnt[None, :, None])
    else:
        out = acc / (ycnt[:, None] * xcnt[None, :])
    return out.astype(np.uint8)


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


def _blob_src(df: DataFrame, text_col: str, id_col: str,
              binary_col: str | None) -> DataFrame:
    """(doc_id, blob): from a real binary column when given, else the
    UTF-8 bytes of the text column (the opaque-payload pattern)."""
    payload = (F.col(binary_col) if binary_col is not None
               else F.encode(F.col(text_col), "UTF-8"))
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("blob"))


def _image_features(px: np.ndarray) -> np.ndarray:
    """FEATURE_DIM real image features from a decoded plane: per-channel
    mean/std (/255) + a 10-bin normalized grayscale histogram —
    the standard cheap screening embedding."""
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=-1)
    f = px.astype(np.float64)
    means = f.mean(axis=(0, 1)) / 255.0
    stds = f.std(axis=(0, 1)) / 255.0
    gray = f.mean(axis=2)
    hist = np.histogram(gray, bins=10, range=(0.0, 256.0))[0]
    hist = hist / max(1, gray.size)
    return np.concatenate([means, stds, hist]).astype(np.float32)


def extract_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", fake_decode: bool = True,
                     binary_col: str | None = None) -> DataFrame:
    """(doc_id, n_bytes, features array<float>): Arrow-batched decode +
    feature extraction via mapInPandas. Batch shape: whole Arrow record
    batches in, one pandas frame out — no per-row Python dispatch.

    fake_decode=False decodes REAL uncompressed images (PPM P6 /
    PGM P5, decode_ppm above — no codec libs needed) and computes
    _image_features on actual pixels; compressed formats raise
    (swap in PIL in production — only this decode call changes)."""
    src = _blob_src(df, text_col, id_col, binary_col)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["blob"]]
            if fake_decode:
                feats = [_decode_stub(b).tolist() for b in blobs]
            else:
                feats = [_image_features(decode_ppm(b)).tolist() for b in blobs]
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
                  fake_decode: bool = True,
                  binary_col: str | None = None) -> DataFrame:
    """Image resize: blob -> decode to a HxW[,3] pixel array -> area
    (block-mean, floor semantics) downsample to target -> re-encoded
    bytes + plane statistics.

    fake_decode=False runs the REAL path: decode_ppm parses actual
    PPM/PGM bytes (pure numpy, no codec libs) and area_resize
    downsamples real pixels; the re-encoded output is a valid netpbm
    file. fake_decode=True keeps the md5-seeded deterministic fake for
    plumbing tests. resized_mean/resized_sum are floor(avg)-exact so a
    relational oracle can replay them from the pixel formula."""
    src = _blob_src(df, text_col, id_col, binary_col)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sw, sh, out_blob, out_sha, out_sum, out_mean = (
                [], [], [], [], [], [], [])
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if fake_decode:
                    h_d = hashlib.md5(b).digest()
                    src_h = target_h * (1 + h_d[0] % 4)
                    src_w = target_w * (1 + h_d[1] % 4)
                    rng = np.random.default_rng(
                        int.from_bytes(h_d[:8], "big") % (2 ** 32))
                    px = rng.integers(0, 256, (src_h, src_w), dtype=np.uint8)
                else:
                    px = decode_ppm(b)
                    src_h, src_w = px.shape[:2]
                small = area_resize(px, target_h, target_w)
                raw = encode_ppm(small)
                ids.append(did)
                sw.append(src_w)
                sh.append(src_h)
                out_blob.append(raw)
                out_sha.append(hashlib.sha256(raw).hexdigest())
                out_sum.append(int(small.astype(np.int64).sum()))
                out_mean.append(round(float(small.astype(np.float64).mean()), 6))
            yield pd.DataFrame(
                {"doc_id": ids, "src_w": sw, "src_h": sh,
                 "resized": out_blob, "resized_sha": out_sha,
                 "resized_sum": out_sum, "resized_mean": out_mean}
            )

    return src.mapInPandas(
        resize,
        schema="doc_id long, src_w int, src_h int, resized binary, "
               "resized_sha string, resized_sum long, resized_mean double",
    )


def frame_sample(df: DataFrame, n_frames: int = 4, text_col: str = "text",
                 id_col: str = "doc_id",
                 binary_col: str | None = None) -> DataFrame:
    """Video-style frame sampling: one input row -> n_frames output
    rows — the explode-shaped mapInPandas pattern for frame/segment
    extraction.

    Blobs in the FRAMES container format (decode_frames above) take
    the REAL path: parse the container, sample n_frames evenly across
    the clip (frame i -> source frame floor(i * nf / n_frames), the
    ffmpeg fps-resample analog), and emit true per-frame statistics
    (src_frame, frame_mean over the decoded plane, frame_sha of the
    raw plane bytes). Other payloads fall back to byte-range slicing
    (opaque-blob plumbing)."""
    src = _blob_src(df, text_col, id_col, binary_col)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, srcf, means, shas = [], [], [], [], []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                if b.startswith(FRAMES_MAGIC):
                    frames = decode_frames(b)
                    nf = frames.shape[0]
                    for i in range(n_frames):
                        j = (i * nf) // n_frames
                        plane = frames[j]
                        ids.append(did)
                        idxs.append(i)
                        srcf.append(j)
                        means.append(
                            round(float(plane.astype(np.float64).mean()), 6))
                        shas.append(hashlib.sha256(plane.tobytes()).hexdigest())
                else:
                    step = max(1, len(b) // n_frames)
                    for i in range(n_frames):
                        chunk = b[i * step:(i + 1) * step]
                        arr = np.frombuffer(chunk, dtype=np.uint8)
                        ids.append(did)
                        idxs.append(i)
                        srcf.append(i)
                        means.append(
                            round(float(arr.mean()), 6) if arr.size else 0.0)
                        shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "src_frame": srcf, "frame_mean": means,
                                "frame_sha": shas})

    return src.mapInPandas(
        sample, schema="doc_id long, frame_idx int, src_frame int, "
                       "frame_mean double, frame_sha string")


def image_stats(df: DataFrame, id_col: str = "doc_id",
                binary_col: str = "blob", hist_bins: int = 8) -> DataFrame:
    """(doc_id, width, height, channels, n_pixels, pixel_sum,
    hist array<long>): REAL PPM/PGM decode + EXACT integer pixel
    statistics — the relationally-replayable face of image feature
    extraction (every output is an integer, so a SQL oracle reproduces
    it bit-for-bit from the synthesis formula; the float32 embedding
    variant is extract_features). hist = per-bin counts of the
    channel-sum gray value (0..255*channels in hist_bins equal bins)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob"))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "channels": [],
                   "n_pixels": [], "pixel_sum": [], "hist": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                px = decode_ppm(bytes(blob))
                ch = px.shape[2] if px.ndim == 3 else 1
                h, w = px.shape[:2]
                f = px.astype(np.int64)
                graysum = f.sum(axis=2) if px.ndim == 3 else f
                span = 256 * ch
                bins = (graysum * hist_bins) // span  # integer binning
                hist = np.bincount(bins.ravel(), minlength=hist_bins)
                out["doc_id"].append(did)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["channels"].append(int(ch))
                out["n_pixels"].append(int(h * w))
                out["pixel_sum"].append(int(f.sum()))
                out["hist"].append(hist.astype(np.int64).tolist())
            yield pd.DataFrame(out)

    return src.mapInPandas(
        stats, schema="doc_id long, width int, height int, channels int, "
                      "n_pixels long, pixel_sum long, hist array<long>")


def wav_stats(df: DataFrame, id_col: str = "doc_id",
              binary_col: str = "blob") -> DataFrame:
    """(doc_id, sample_rate, n_samples, n_channels, mean_amp, rms,
    peak): REAL PCM16 WAV decode (decode_wav, pure numpy) + amplitude
    statistics — the audio screening features (clipping/silence
    detection). Map-only Arrow stage; floor-free float math rounded to
    6 so relational oracles can replay it."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("blob"))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_samples": [],
                   "n_channels": [], "sum_amp": [], "mean_amp": [],
                   "rms": [], "peak": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, s = decode_wav(bytes(blob))
                f = s.astype(np.float64)
                out["doc_id"].append(did)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(s.shape[0]))
                out["n_channels"].append(int(s.shape[1]))
                out["sum_amp"].append(int(s.astype(np.int64).sum()))
                out["mean_amp"].append(round(float(f.mean()), 6))
                out["rms"].append(round(float(np.sqrt((f * f).mean())), 6))
                out["peak"].append(int(np.abs(s.astype(np.int64)).max())
                                   if s.size else 0)
            yield pd.DataFrame(out)

    return src.mapInPandas(
        stats, schema="doc_id long, sample_rate int, n_samples long, "
                      "n_channels int, sum_amp long, mean_amp double, "
                      "rms double, peak long")


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
