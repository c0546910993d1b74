"""Conjunction block pruning (the leapfrog/skip-list analog): exact —
must never change any result — and must actually prune blocks when the
MUST terms live in disjoint chunk ranges."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.queryast import BooleanClause, BooleanQuery, Occur, TermQuery


@pytest.fixture(scope="module")
def chunked_index(spark, tmp_path_factory):
    """Corpus spanning many 8192-doc chunks with chunk-local marker
    terms: markerA only in chunk 0, markerB only in chunk 2, common
    words everywhere."""
    from lucene_solr_spark.indexing.builder import build_index

    n = 30000  # ~4 chunks of 8192
    rows = []
    for i in range(n):
        words = ["common", f"w{i % 97}"]
        if i < 2000:
            words.append("markera")
        if 17000 <= i < 19000:
            words.append("markerb")
        if i % 3 == 0:
            words.append("markerc")
        rows.append(
            {
                "repo": "r0",
                "path": f"p{i:06d}",
                "commit": "c",
                "lang": "py",
                "content": " ".join(words),
            }
        )
    pdf = pd.DataFrame(rows)
    idx = str(tmp_path_factory.mktemp("chunked") / "idx")
    build_index(spark, idx, [("all", spark.createDataFrame(pdf))])
    return idx


@pytest.fixture(scope="module")
def chunked_searcher(spark, chunked_index):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    return Searcher(IndexReader(spark, chunked_index))


def _and_query(*terms):
    return BooleanQuery(clauses=tuple(
        BooleanClause(Occur.MUST, TermQuery(term=t)) for t in terms
    ))


def test_disjoint_terms_prune_to_empty_cheaply(chunked_searcher):
    """markera (chunk 0) AND markerb (chunk 2): the common chunk set is
    empty, so the pruned frame is empty BEFORE any decode."""
    s = chunked_searcher
    pruned = s._conjunction_blocks(["markera", "markerb"], ["markera", "markerb"])
    assert pruned.count() == 0
    assert len(s.search(_and_query("markera", "markerb"), k=10)) == 0


def test_pruning_reduces_blocks_for_localized_term(chunked_searcher):
    """common AND markera: only blocks overlapping markera's chunk
    survive — far fewer than common's full block count."""
    from pyspark.sql import functions as F

    s = chunked_searcher
    total = s.reader.blocks.where(F.col("term") == "common").count()
    pruned = (
        s._conjunction_blocks(["common", "markera"], ["common", "markera"])
        .where(F.col("term") == "common")
        .count()
    )
    assert pruned < total


@pytest.mark.parametrize("terms", [
    ("common", "markera"),
    ("common", "markerb"),
    ("markera", "markerc"),
    ("common", "markerc", "markerb"),
])
def test_pruned_and_results_exact(chunked_searcher, terms, spark, chunked_index):
    """Pruned conjunction == brute-force per-clause evaluation."""
    from pyspark.sql import functions as F

    s = chunked_searcher
    res = s.search(_and_query(*terms), k=50)
    # independent check: intersect per-term doc sets, recompute sums
    sets = []
    for t in terms:
        one = s.search(TermQuery(term=t), k=10_000_000)
        sets.append({int(d): float(sc) for d, sc in zip(one["doc_id"], one["score"])})
    docs = set(sets[0])
    for m in sets[1:]:
        docs &= set(m)
    import numpy as np

    expected = sorted(
        ((np.float32(sum(np.float64(m[d]) for m in sets)), d) for d in docs),
        key=lambda x: (-x[0], x[1]),
    )[:50]
    assert [d for _, d in expected] == list(res["doc_id"])
