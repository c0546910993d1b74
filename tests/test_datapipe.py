"""Training-data pipeline operators: properties the DuckDB gate can't
check — MinHash-LSH recall vs exact Jaccard, hyperplane-LSH recall vs
brute force, multimodal decode determinism and batch shape.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_finds_exact_near_dups(spark, docs):
    """Every pair with TRUE jaccard >= 0.9 must be surfaced by the
    32-hash/8-band LSH (banding theory: P(candidate) ~ 1-(1-s^4)^8 >
    0.9999 at s=0.9), and est_jaccard must be within 0.35 of truth."""
    from lucene_solr_spark.datapipe import dedup

    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    cand = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    missed = set(exact) - set(cand)
    assert not missed, f"LSH missed true near-dups: {missed}"
    for pair, jac in exact.items():
        assert abs(cand[pair] - jac) < 0.35


def test_simhash_band_join_equals_exhaustive(spark, docs):
    """The pigeonhole band join must equal the exhaustive pairwise
    hamming check (no false negatives at hamming <= 3)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.datapipe import dedup

    fps = dedup.simhash_fingerprints(docs).collect()
    by_id = {r["doc_id"]: r["simhash"] for r in fps}
    exact = set()
    ids = sorted(by_id)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(by_id[a] ^ by_id[b]).count("1") <= 3:
                exact.add((a, b))
    got = {
        (r["a"], r["b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert got == exact


def test_lsh_bucket_topk_recall(spark, embeddings):
    """Multi-probe hyperplane LSH top-10 must recover >= 5 of the true
    brute-force top-10 with 4 planes on 500 64-d vectors (probe set =
    exact bucket + 4 one-bit flips = 5/16 of the space; plane count
    scales up with corpus size in production)."""
    from lucene_solr_spark.datapipe import similarity

    true = [r["vec_id"] for r in similarity.brute_force_topk(embeddings, 0, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.lsh_bucket_topk(embeddings, 0, k=10, n_planes=4).collect()]
    assert len(set(true) & set(approx)) >= 5


def test_mm_features_deterministic_and_shaped(spark, docs):
    from lucene_solr_spark.datapipe import multimodal

    a = multimodal.extract_features(docs).orderBy("doc_id").collect()
    b = multimodal.extract_features(docs).orderBy("doc_id").collect()
    assert len(a) == docs.count()
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in a)
    assert [r["features"] for r in a] == [r["features"] for r in b]


def test_mm_real_decode_rejects_non_image(spark, docs):
    """fake_decode=False now runs the REAL pure-numpy PPM decoder —
    non-image payloads (raw text bytes) must fail loudly, not decode
    garbage."""
    from py4j.protocol import Py4JJavaError

    from lucene_solr_spark.datapipe import multimodal

    with pytest.raises((Py4JJavaError, Exception)):
        multimodal.extract_features(docs, fake_decode=False).collect()


def test_mm_real_ppm_pipeline(spark, docs):
    """Real decode end-to-end: synthesize valid PPM bytes, decode with
    decode_ppm through extract_features/resize_images/image_stats, and
    check pixel-exact results against numpy ground truth."""
    import numpy as np
    import pandas as pd

    from lucene_solr_spark.datapipe import multimodal

    def px_of(did: int) -> np.ndarray:
        w, h = 16 * (1 + did % 3), 8 * (1 + did % 2)
        yy = np.arange(h)[:, None, None] * 7
        xx = np.arange(w)[None, :, None] * 3
        cc = np.arange(3)[None, None, :] * 11
        return ((did * 31 + yy + xx + cc) % 256).astype(np.uint8)

    src = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(6)),
        "blob": [multimodal.encode_ppm(px_of(i)) for i in range(6)],
    }))
    stats = {r["doc_id"]: r for r in
             multimodal.image_stats(src).collect()}
    resized = {r["doc_id"]: r for r in
               multimodal.resize_images(src, fake_decode=False,
                                        binary_col="blob").collect()}
    feats = {r["doc_id"]: r for r in
             multimodal.extract_features(src, fake_decode=False,
                                         binary_col="blob").collect()}
    for did in range(6):
        px = px_of(did)
        assert stats[did]["width"] == px.shape[1]
        assert stats[did]["height"] == px.shape[0]
        assert stats[did]["pixel_sum"] == int(px.astype(np.int64).sum())
        small = multimodal.area_resize(px, 8, 8)
        assert resized[did]["resized_sum"] == int(small.astype(np.int64).sum())
        # the resized payload is itself a decodable PPM
        rt = multimodal.decode_ppm(bytes(resized[did]["resized"]))
        assert np.array_equal(rt, small)
        f = feats[did]["features"]
        assert len(f) == multimodal.FEATURE_DIM
        assert abs(f[0] - px[..., 0].mean() / 255.0) < 1e-5


def test_mm_wav_and_frames_real_decode(spark):
    """Real WAV and FRAMES decode through the Arrow stages: amplitude
    stats and frame sampling match numpy ground truth."""
    import numpy as np
    import pandas as pd

    from lucene_solr_spark.datapipe import multimodal

    s0 = (((np.arange(300) * 13) % 4097) - 2048).astype(np.int16)
    fr0 = ((np.arange(5 * 6 * 8) * 7) % 256).astype(np.uint8).reshape(5, 6, 8)
    src = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "blob": [multimodal.encode_wav(s0, 8000)]}))
    r = multimodal.wav_stats(src).collect()[0]
    assert r["sample_rate"] == 8000 and r["n_samples"] == 300
    assert r["sum_amp"] == int(s0.astype(np.int64).sum())
    assert r["peak"] == int(np.abs(s0.astype(np.int64)).max())
    fsrc = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "blob": [multimodal.encode_frames(fr0)]}))
    rows = (multimodal.frame_sample(fsrc, n_frames=4, binary_col="blob")
            .orderBy("frame_idx").collect())
    assert [r["src_frame"] for r in rows] == [(i * 5) // 4 for i in range(4)]
    for r in rows:
        plane = fr0[r["src_frame"]]
        assert abs(r["frame_mean"] - plane.astype(np.float64).mean()) < 1e-6


def test_frame_sample_fanout(spark, docs):
    from lucene_solr_spark.datapipe import multimodal

    n = docs.count()
    out = multimodal.frame_sample(docs, n_frames=4)
    assert out.count() == 4 * n
    one = out.where("doc_id = 0").orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == [0, 1, 2, 3]


def test_mm_resize_deterministic_and_shaped(spark, docs):
    from lucene_solr_spark.datapipe import multimodal

    a = multimodal.resize_images(docs, target_w=8, target_h=8).orderBy("doc_id").collect()
    b = multimodal.resize_images(docs, target_w=8, target_h=8).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["resized_sha"]) for r in a] == [
        (r["doc_id"], r["resized_sha"]) for r in b]
    r0 = a[0]
    # resized payload is a re-encoded PGM (header + 8x8 raster)
    import numpy as np

    rt = multimodal.decode_ppm(bytes(r0["resized"]))
    assert rt.shape == (8, 8)
    assert r0["src_w"] % 8 == 0 and r0["src_h"] % 8 == 0
    assert r0["resized_sum"] == int(rt.astype(np.int64).sum())


def test_lsh_near_pairs_recall_vs_exact(spark, embeddings):
    """Banded sign-LSH pair discovery must find every exact cosine >=
    0.9 pair in a corpus with planted near-dups (50 perturbed copies,
    cosine ~0.992: P(candidate) ~ 0.997/pair at 4x4 banding) and never
    report a pair below the threshold (exact verify step)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.datapipe import similarity

    base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    dups = base.where(F.col("vec_id") <= 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(sequence(1, size(embedding)),"
               " i -> element_at(embedding, i)"
               " * (1.0d + CASE WHEN (i - 1) % 3 = 0 THEN 0.3d ELSE 0.0d END))"
               ).alias("embedding"))
    corpus = base.union(dups)
    exact = {(r["a"], r["b"])
             for r in similarity.cosine_near_pairs(corpus, 0.9).collect()}
    approx = {(r["a"], r["b"]): r["cos"]
              for r in similarity.lsh_near_pairs(corpus, 0.9).collect()}
    assert exact, "planted dups must produce exact pairs"
    recall = len(exact & set(approx)) / len(exact)
    assert recall >= 0.9, f"recall {recall}"
    assert all(c >= 0.9 for c in approx.values())


def test_repetition_stats_flags_duplicate_heavy_doc(spark):
    """A doc that is one 6-token line repeated 20x must show maximal
    dup_line_frac (19/20) and fail gopher_keep; a diverse doc of the
    same length must pass."""
    from lucene_solr_spark.datapipe.textqa import repetition_stats

    line = "alpha bravo charlie delta echo foxtrot"
    diverse = " ".join(f"tok{i} word{i*7%97}" for i in range(60))
    df = spark.createDataFrame(
        [(1, " ".join([line] * 20)), (2, diverse)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_line_frac"] == pytest.approx(19 / 20)
    assert rows[1]["bigram_dup_frac"] > 0.9
    assert rows[1]["gopher_keep"] == 0
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["gopher_keep"] == 1


def test_pii_scrub_redacts_everything_it_counts(spark):
    """Counts match the injected PII and the redacted text (recomputed
    through the same expressions) contains none of the raw values."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.datapipe.textqa import (
        PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE, pii_scrub)

    df = spark.createDataFrame(
        [(1, "mail a@b.com and c.d@e.org ip 10.0.0.1 call 555-1234"),
         (2, "clean text with no pii at all")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (2, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 0, 0)
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>"),
                PII_IP_RE, "<IP>"),
            PII_PHONE_RE, "<PHONE>").alias("r")
    ).collect()
    assert red[0]["r"] == "mail <EMAIL> and <EMAIL> ip <IP> call <PHONE>"
    assert red[1]["r"] == "clean text with no pii at all"


def test_decontaminate_exact_copy_is_fully_contaminated(spark):
    """A training doc that IS an eval doc shows contamination 1.0; a
    disjoint-vocabulary doc is absent from the result."""
    from lucene_solr_spark.datapipe.textqa import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words entirely here now ok yes"),
         (3, "prefix words then the quick brown fox appears")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in decontaminate(train, eval_df, k=4).collect()}
    assert rows[1]["contamination"] == pytest.approx(1.0)
    assert 2 not in rows
    assert rows[3]["n_contaminated"] == 1  # "the quick brown fox"


def test_no_inferred_filter_retokenizes_explodes(spark):
    """Plan-shape guard for the InferFiltersFromGenerate pathology: the
    decontamination training side must tokenize each row exactly once —
    an inner generate would let the optimizer push an inferred
    size(arr)>0 filter below the projections and inline a second (and
    third) tokenize into a per-row Filter (measured 15x slower)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.datapipe.textqa import decontaminate

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z w v u t s")],
        "doc_id long, text string")
    out = decontaminate(df.where(F.col("doc_id") == 1),
                        df.where(F.col("doc_id") == 2), k=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one split() per corpus scan side: train + eval = 2 total
    assert plan.count("split(") == 2, plan


def test_byte_features_match_numpy(spark):
    """byte_features through the Arrow stage equals a direct numpy
    computation on the raw payload (the oracle-independent check)."""
    import numpy as np

    from lucene_solr_spark.datapipe.multimodal import byte_features

    texts = [(1, "hello world"), (2, "aaaaaaaa"), (3, "")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in byte_features(df).collect()}
    for did, t in texts:
        arr = np.frombuffer(t.encode(), dtype=np.uint8)
        if arr.size == 0:
            assert rows[did]["n_bytes"] == 0
            assert rows[did]["byte_entropy"] == 0.0
            continue
        counts = np.bincount(arr, minlength=256).astype(float)
        p = counts[counts > 0] / arr.size
        assert rows[did]["n_bytes"] == arr.size
        assert rows[did]["mean_byte"] == round(float(arr.mean()), 6)
        assert rows[did]["std_byte"] == round(float(arr.astype(float).std()), 6)
        assert rows[did]["byte_entropy"] == round(float(-(p * np.log(p)).sum()), 6)
        assert rows[did]["n_distinct_bytes"] == int((counts > 0).sum())


def test_lsh_bucket_cap_star_fallback(spark):
    """Megacluster skew immunity: a bucket larger than bucket_cap must
    emit star edges (rep = min id) instead of quadratic pairwise
    expansion — same connected components, bounded pair count — while
    small-bucket behavior stays exact."""
    import pandas as pd

    from lucene_solr_spark.datapipe import dedup

    # 60 identical docs (one giant bucket) + 2 distinct near-dup docs
    docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(60)]
    docs += [(100, "completely different text about spark engines"),
             (101, "completely different text about spark engines")]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))

    capped = dedup.simhash_near_pairs(df, bucket_cap=16).toPandas()
    exact = dedup.simhash_near_pairs(df, bucket_cap=10**9).toPandas()
    # star edges: every member of the megacluster connects to doc 0
    star = capped[(capped["a"] == 0)]
    assert len(star) == 59, len(star)
    # pair count bounded: 59 star edges + the small pair, NOT C(60,2)
    assert len(capped) == 60, len(capped)
    assert len(exact) == 59 * 60 // 2 + 1
    assert {(100, 101)} <= set(map(tuple, capped[["a", "b"]].values))
    # components identical under either expansion
    ids = df.select("doc_id")
    comp_c = dedup.connected_components(
        capped_df := spark.createDataFrame(capped[["a", "b"]]), ids).toPandas()
    comp_e = dedup.connected_components(
        spark.createDataFrame(exact[["a", "b"]]), ids).toPandas()
    assert comp_c.sort_values("doc_id").reset_index(drop=True).equals(
        comp_e.sort_values("doc_id").reset_index(drop=True))

    mh_capped = dedup.minhash_lsh_pairs(df, bucket_cap=16).toPandas()
    assert len(mh_capped[mh_capped["a"] == 0]) == 59
    assert (mh_capped["est_jaccard"] >= 0.5).all()
