"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
hyperplane-LSH bucketing is the scale path: at 10^12 vectors the cross
join is impossible, so candidates come from a hash-bucket join and only
bucket-mates are scored.

All arithmetic is float64 with a fixed fold order (F.aggregate = left
fold; F.zip_with elementwise), so scores are bit-reproducible against
the SQL oracle's list_dot_product.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(df: DataFrame, query_id: int, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cos) top-k most-cosine-similar to the query vector,
    excluding itself. The query row is broadcast (1 row); scoring is a
    map-only stage + TakeOrderedAndProject — no shuffle of the corpus."""
    q = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = df.where(F.col(id_col) != query_id).crossJoin(F.broadcast(q))
    return (
        scored.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_near_pairs(df: DataFrame, threshold: float = 0.9,
                      max_id: Optional[int] = None,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(a, b, cos) pairs with cosine >= threshold, a < b — embedding
    near-duplicate detection (exact, quadratic: the verifier for LSH
    candidates; cap with max_id for tests)."""
    base = df if max_id is None else df.where(F.col(id_col) <= max_id)
    a = base.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = base.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_topk(df: DataFrame, query_id: int, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-Flat approximate nearest neighbor (the inverted-file index
    from Jegou et al., "Product Quantization for Nearest Neighbor
    Search", 2011 — coarse quantizer only, exact scoring in-list).

    Coarse quantizer: the embeddings of the first n_centroids ids
    (deterministic — no k-means iterations, so the DuckDB oracle can
    replay assignment exactly). Every vector joins its max-cosine
    centroid (broadcast K-row dim table + window argmax; at scale this
    is a one-off materialization, bucketed by cid). A query scores the
    K centroids driver-side, probes its n_probe best buckets and
    brute-forces only those — the corpus-side work drops from N to
    ~N*(n_probe/K) while the bucket join stays shuffle-free (broadcast
    probe list)."""
    from pyspark.sql import Window

    cents = df.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    assigned = df.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"), "cid",
        cosine(F.col(vec_col), F.col("cvec")).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    buckets = (
        assigned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "vec", "cid")
    )
    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))
    probe_rows = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cvec"), F.col("qvec")).alias("s"))
        .orderBy(F.desc("s"), F.asc("cid"))
        .limit(n_probe)
        .collect()
    )
    probe_cids = [int(r["cid"]) for r in probe_rows]
    cand = buckets.where(F.col("cid").isin(probe_cids)).where(
        F.col("vec_id") != query_id)
    return (
        cand.crossJoin(F.broadcast(q))
        .select("vec_id",
                F.round(cosine(F.col("vec"), F.col("qvec")), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int) -> List[float]:
    """Deterministic pseudo-random hyperplane: component j derives from
    the 60-bit md5 h60 construction seeded by (plane_idx, j), mapped to
    [-1, 1]. Pure Python, tiny, broadcast as a literal array."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"plane:{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        out.append(h / float(1 << 59) - 1.0)
    return out


def lsh_bucket_topk(df: DataFrame, query_id: int, k: int = 10, n_planes: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN scale path: sign-of-projection LSH — bucket = n_planes sign
    bits; only the query's bucket is scored. Recall < 1 by design
    (rows-only check); the partition-friendly plan is the point: bucket
    assignment is a map-only expression, candidate scoring touches one
    bucket. Multi-probe (flip one bit) widens recall."""
    dim = len(df.select(vec_col).first()[0])
    planes = [_hyperplane(dim, i) for i in range(n_planes)]

    def bucket_expr(vec: Column) -> Column:
        bits = None
        for i, p in enumerate(planes):
            proj = dot(vec, F.array(*[F.lit(x) for x in p]))
            bit = F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits

    with_b = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    qrow = with_b.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qvec"), F.col("bucket").alias("qb")
    )
    # multi-probe: exact bucket + all one-bit flips
    probes = F.array(*([F.col("qb")] + [
        F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
    ]))
    qx = qrow.select("qvec", F.explode(probes).alias("bucket"))
    cand = with_b.where(F.col("vec_id") != query_id).join(
        F.broadcast(qx), "bucket"
    )
    return (
        cand.select("vec_id", F.round(cosine(F.col("v"), F.col("qvec")), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_near_pairs(df: DataFrame, threshold: float = 0.9,
                   n_bands: int = 4, band_planes: int = 4,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup PAIRS at scale: banded sign-LSH discovery +
    exact cosine verification — the all-pairs counterpart of
    lsh_bucket_topk (which answers one query) and the scale path for
    cosine_near_pairs (which is the quadratic verifier). Signature =
    n_bands x band_planes deterministic hyperplane sign bits; two
    vectors are CANDIDATES iff they agree on all bits of >= 1 band
    (P(candidate | cos 0.9) ~ 0.95 at 4x4), then candidates — deduped
    across bands BEFORE the vector join, the same bare-pair-first
    shape as minhash_lsh_pairs — are verified with exact cosine >=
    threshold. At 100 TB: bucket assignment is map-only, the join key
    is (band, bits) so no cross join ever forms, and the verify join
    touches candidate rows only."""
    head = df.select(vec_col).first()
    if head is None:  # empty corpus: no pairs (and no dim to hash with)
        return df.sparkSession.createDataFrame(
            [], "a long, b long, cos double")
    dim = len(head[0])
    planes = [_hyperplane(dim, i) for i in range(n_bands * band_planes)]

    def band_key(vec: Column, band: int) -> Column:
        bits: Optional[Column] = None
        for i in range(band_planes):
            p = planes[band * band_planes + i]
            proj = dot(vec, F.array(*[F.lit(x) for x in p]))
            bit = F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return F.lit(band * (1 << band_planes)) + bits

    keys = F.array(*[band_key(F.col(vec_col), b) for b in range(n_bands)])
    buckets = df.select(F.col(id_col).alias("vid"),
                        F.explode(keys).alias("bucket"))
    left = buckets.select(F.col("vid").alias("a"), "bucket")
    right = buckets.select(F.col("vid").alias("b"), "bucket")
    cand = (
        left.join(right, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "a").join(vb, "b")
        .select("a", "b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
