"""TextLogit training parity: the distributed one-agg-per-iteration
gradient descent must match a literal numpy implementation of the same
updates on the same features, and must actually learn (loss falls).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "join", "query", "scan"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def numpy_logit(X, y, iterations, lr):
    w = np.zeros(X.shape[1])
    b = 0.0
    losses = []
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        eps = 1e-12
        losses.append(float(np.mean(
            -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))))
        w -= lr * (X.T @ err) / len(y)
        b -= lr * float(np.mean(err))
    return np.append(w, b), losses


def test_logit_matches_numpy(spark, docs):
    from lucene_solr_spark.datapipe import textml

    feats = textml.doc_features(
        docs, TERMS, F.col("lang") == "en").orderBy("doc_id").toPandas()
    X = feats[[f"x{i}" for i in range(len(TERMS))]].to_numpy()
    y = feats["label"].to_numpy()
    want_w, want_losses = numpy_logit(X, y, iterations=6, lr=2.0)

    got_w, final_loss, got_losses = textml.logit_train(
        docs, TERMS, F.col("lang") == "en", iterations=6, lr=2.0)
    assert np.allclose(got_w, want_w, rtol=1e-8, atol=1e-10)
    assert np.allclose(got_losses, want_losses, rtol=1e-8)
    # it must actually learn something
    assert got_losses[-1] < got_losses[0]


def test_logit_df_shape(spark, docs):
    from lucene_solr_spark.datapipe import textml

    out = textml.logit_train_df(
        spark, docs, TERMS, F.col("lang") == "en", iterations=2).collect()
    terms = {r["term"] for r in out}
    assert terms == set(TERMS) | {"__bias__"}
    assert all(np.isfinite(r["weight"]) for r in out)
