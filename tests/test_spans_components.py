"""Span-family queries (SpanOr/SpanFirst/SpanNot), the DFI/IB/Axiomatic
similarities, and connected-components duplicate clustering — semantics
the DuckDB gate checks only on the synthetic corpus; here on hand-built
docs where the expected matches are enumerable by eye.
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.fulltext import FulltextIndex


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha alpha beta"),
        (2, "gamma delta epsilon"),
        (3, "zeta eta theta iota kappa mu nu xi omicron pi rho sigma alpha"),
        (4, "beta gamma beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return FulltextIndex(df, stop=False)


def test_span_or_freq_is_summed_tf(idx):
    got = {r["doc_id"]: r["score"] for r in idx.span_or(["alpha", "beta"], k=10).collect()}
    # every doc containing either term matches
    assert set(got) == {0, 1, 3, 4}
    # doc 1 has alpha x2 + beta x1 = freq 3; doc 4 beta x2 = freq 2;
    # same dl (3) => doc 1 must outrank doc 4
    assert got[1] > got[4]


def test_span_first_cuts_late_positions(idx):
    # 'alpha' in doc 3 sits at 1-based position 13 — outside end=10
    got = {r["doc_id"] for r in idx.span_first("alpha", end=10, k=10).collect()}
    assert got == {0, 1}
    # widening the window readmits it
    got13 = {r["doc_id"] for r in idx.span_first("alpha", end=13, k=10).collect()}
    assert got13 == {0, 1, 3}


def test_span_not_excludes_adjacent(idx):
    # 'gamma' adjacent to 'beta' in docs 0 and 4; standalone in doc 2
    got = {r["doc_id"] for r in idx.span_not("gamma", "beta", pre=1, post=1, k=10).collect()}
    assert got == {2}
    # with pre=post=0 (overlap only) nothing is excluded for distinct terms
    got0 = {r["doc_id"] for r in idx.span_not("gamma", "beta", pre=0, post=0, k=10).collect()}
    assert got0 == {0, 2, 4}


def test_span_containing_and_within(idx):
    # doc 0 "alpha beta gamma delta": big = near(alpha, gamma, slop=1)
    # spans [1,3], containing beta@2
    got = {r["doc_id"] for r in idx.span_containing("alpha", "gamma", "beta", slop=1).collect()}
    assert got == {0}
    # no 'epsilon' inside any alpha..gamma span
    got = {r["doc_id"] for r in idx.span_containing("alpha", "gamma", "epsilon", slop=1).collect()}
    assert got == set()
    # within: beta@2 inside alpha@1..delta@4 (slop 2)
    got = {r["doc_id"] for r in idx.span_within("beta", "alpha", "delta", slop=2).collect()}
    assert got == {0}
    # gamma@3 of doc 2 has no surrounding alpha..delta span
    got = {r["doc_id"] for r in idx.span_within("gamma", "alpha", "delta", slop=2).collect()}
    assert got == {0}


def test_dfi_formula(idx):
    st = idx.stats
    rows = {r["doc_id"]: r["score"] for r in idx.dfi_term_query("alpha", k=10).collect()}
    # doc 1: tf=2, dl=3; ttf(alpha)=4 (docs 0,1x2,3)
    ttf, tot = 4, st.total_tokens
    expected = (ttf + 1.0) * 3 / (tot + 1.0)
    chi2 = (2 - expected) ** 2 / expected
    want = math.log(chi2 + 1.0) / math.log(2.0)
    # _topk rounds scores to 6 decimals (oracle rank parity)
    assert rows[1] == pytest.approx(round(want, 6), abs=1e-9)
    # docs where tf <= expected are dropped entirely
    for score in rows.values():
        assert score > 0


def test_ib_spl_and_f2exp_rank_short_docs_first(idx):
    # doc 1 (alpha x2, dl 3) must beat doc 3 (alpha x1, dl 13) under
    # every similarity — sanity that tf and length normalization act
    for fn in (idx.ib_spl_term_query, idx.axiomatic_f2exp_term_query):
        got = {r["doc_id"]: r["score"] for r in fn("alpha", k=10).collect()}
        assert set(got) == {0, 1, 3}
        assert got[1] > got[0] > got[3]


def test_connected_components_transitive(spark):
    from lucene_solr_spark.datapipe.dedup import connected_components

    ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # chain 0-1-2 (0,2 never paired directly), pair 4-5, singletons 3, 6
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs, ids).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6}


def test_curate_decision(spark):
    """Near-identical docs collapse to one canonical survivor; junk
    (too-short) docs are dropped even when canonical."""
    from lucene_solr_spark.datapipe.curate import curate

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest while the hunters watch it go "
            "with their old dogs waiting near the fence of the farm ") * 3
    rows = [
        (0, base + "ending one"),
        (1, base + "ending two"),   # near-dup of 0
        (2, "tiny doc"),            # unique but junk-short
        (3, "completely different content about spark dataframes and the "
            "catalyst optimizer running whole stage codegen over columnar "
            "batches of data while the scheduler assigns tasks to executors "
            "and the shuffle service moves blocks between the worker nodes "
            "of the cluster so that wide dependencies can be satisfied"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["component"], r["keep"]) for r in curate(df).collect()}
    assert got[0][0] == got[1][0] == 0   # same cluster
    assert got[0][1] == 1 and got[1][1] == 0  # only canonical kept
    assert got[2] == (2, 0)              # canonical but below quality bar
    assert got[3][0] == 3 and got[3][1] == 1


def test_curate_exact_collapse_preserves_components(spark):
    """curate collapses exact dups before LSH; the per-doc components
    must equal the naive path (components over ALL docs directly)."""
    from lucene_solr_spark.datapipe.curate import curate
    from lucene_solr_spark.datapipe.dedup import (
        connected_components, simhash_near_pairs)

    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    rows = [
        (0, body + "suffix one"),
        (1, body + "suffix one"),    # exact dup of 0
        (2, body + "suffix one"),    # exact dup of 0
        (3, body + "suffix two"),    # near-dup of the group
        (4, "totally different text about query planning and shuffles "
            "in a distributed execution engine with columnar batches "
            "and adaptive partition coalescing at runtime for joins"),
        (5, "totally different text about query planning and shuffles "
            "in a distributed execution engine with columnar batches "
            "and adaptive partition coalescing at runtime for joins"),  # exact dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["component"] for r in curate(df).collect()}
    naive = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            simhash_near_pairs(df), df.select("doc_id")).collect()
    }
    assert got == naive
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == got[5] == 4


def test_connected_components_long_chain_converges(spark):
    from lucene_solr_spark.datapipe.dedup import connected_components

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs, ids).collect()}
    assert got == {i: 0 for i in range(n)}
