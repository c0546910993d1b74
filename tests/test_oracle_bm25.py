"""BM25 micro-corpus scoring goldens (FIXTURES.md §6) + oracle engine
semantics. Expected values are recomputed INLINE from the formula
(BM25Similarity.java:72-74,208-218,250-263) in float32, independently of
lucene_solr_spark.bm25, to catch float64 leakage in either place."""

import math

import numpy as np
import pandas as pd

from lucene_solr_spark import bm25
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.queryast import (
    BooleanClause,
    BooleanQuery,
    Occur,
    TermQuery,
    parse_query,
)
from lucene_solr_spark.smallfloat import byte4_to_int, int_to_byte4

# 6 docs over a 5-term vocabulary; lengths 1, 2, 4 ... (TestBM25Similarity.java:83 style)
MICRO_DOCS = [
    "alpha",                                   # len 1
    "alpha beta",                              # len 2
    "beta beta gamma delta",                   # len 4
    "alpha alpha alpha beta gamma",            # len 5
    "delta epsilon delta epsilon delta",       # len 5
    "gamma",                                   # len 1
]


def inline_bm25_score(tf, dl_byte, df, doc_count, sum_ttf, k1=1.2, b=0.75):
    """Literal float32 transliteration of the reference formula."""
    f32 = np.float32
    idf = f32(math.log(1 + (doc_count - df + 0.5) / (df + 0.5)))
    weight = f32(idf * f32(1.0))
    weight_value = f32(weight * (f32(k1) + f32(1)))
    avgdl = f32(sum_ttf / float(doc_count))
    decoded = f32(byte4_to_int(dl_byte))
    cache = f32(f32(k1) * ((f32(1) - f32(b)) + (f32(b) * decoded) / avgdl))
    freq = f32(tf)
    return f32((weight_value * freq) / (freq + cache))


def make_index():
    docs = pd.DataFrame({"content": MICRO_DOCS})
    return OracleIndex(docs, analyzer="standard", norms="byte")


def test_collection_stats():
    idx = make_index()
    assert idx.doc_count == 6
    assert idx.sum_ttf == 1 + 2 + 4 + 5 + 5 + 1
    assert idx.df == {"alpha": 3, "beta": 3, "gamma": 3, "delta": 2, "epsilon": 1}
    assert idx.ttf == {"alpha": 5, "beta": 4, "gamma": 3, "delta": 4, "epsilon": 2}


def test_term_scores_match_inline_formula():
    idx = make_index()
    for term in ["alpha", "beta", "gamma", "delta", "epsilon"]:
        ids, scores = idx.evaluate(TermQuery(term=term))
        for d, s in zip(ids, scores):
            tf = idx.postings[term][int(d)]
            expected = inline_bm25_score(
                tf, int_to_byte4(int(idx.lengths[int(d)])), idx.df[term],
                idx.doc_count, idx.sum_ttf,
            )
            assert s == expected, (term, d, s, expected)
            assert isinstance(s, np.float32) or s.dtype == np.float32


def test_rank_order_and_tiebreak():
    idx = make_index()
    # doc0 (len 1, tf 1) should outrank doc1 (len 2) and doc3 for 'alpha'?
    top = idx.top_k(TermQuery(term="alpha"), k=10)
    assert list(top["doc_id"])[0] in (0, 3)
    # tie-break check: two docs with identical (tf, length) for 'gamma'
    # docs 2 (len 4, tf 1), 3 (len 5, tf 1), 5 (len 1, tf 1): no exact tie,
    # but equal-score docs must order by doc_id asc — construct one:
    docs = pd.DataFrame({"content": ["zeta", "zeta", "zeta eta"]})
    idx2 = OracleIndex(docs)
    top2 = idx2.top_k(TermQuery(term="zeta"), k=3)
    assert list(top2["doc_id"]) == [0, 1, 2]  # docs 0,1 tie -> docID asc


def test_boolean_and_sums_in_double_casts_float():
    idx = make_index()
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term="alpha")),
        BooleanClause(Occur.MUST, TermQuery(term="beta")),
    ))
    ids, scores = idx.evaluate(q)
    assert set(ids) == {1, 3}
    a_ids, a_sc = idx.evaluate(TermQuery(term="alpha"))
    b_ids, b_sc = idx.evaluate(TermQuery(term="beta"))
    a_map = dict(zip(a_ids, a_sc))
    b_map = dict(zip(b_ids, b_sc))
    for d, s in zip(ids, scores):
        exp = np.float32(float(a_map[d]) + float(b_map[d]))
        assert s == exp


def test_boolean_or_not_minshouldmatch():
    idx = make_index()
    q = parse_query("alpha OR epsilon")
    ids, _ = idx.evaluate(q)
    assert set(ids) == {0, 1, 3, 4}
    q = parse_query("beta -gamma")
    ids, _ = idx.evaluate(q)
    assert set(ids) == {1}
    q = BooleanQuery(
        clauses=(
            BooleanClause(Occur.SHOULD, TermQuery(term="alpha")),
            BooleanClause(Occur.SHOULD, TermQuery(term="beta")),
            BooleanClause(Occur.SHOULD, TermQuery(term="gamma")),
        ),
        min_should_match=2,
    )
    ids, _ = idx.evaluate(q)
    assert set(ids) == {1, 2, 3}


def test_absent_term_empty():
    idx = make_index()
    ids, scores = idx.evaluate(TermQuery(term="nosuchterm"))
    assert len(ids) == 0


def test_stopword_clause_vanishes():
    idx = make_index()
    from lucene_solr_spark.analysis import simple_analyze

    q = parse_query("alpha AND the", analyzer=lambda s: simple_analyze(s, stop=True))
    ids, scores = idx.evaluate(q)
    # 'the' analyzed to nothing -> pure single-term query
    t_ids, t_sc = idx.evaluate(TermQuery(term="alpha"))
    assert list(ids) == list(t_ids)
    assert list(scores) == list(t_sc)


def test_phrase_query():
    idx = make_index()
    from lucene_solr_spark.queryast import PhraseQuery

    ids, scores = idx.evaluate(PhraseQuery(terms=("alpha", "beta")))
    assert list(ids) == [1, 3]
    ids2, _ = idx.evaluate(PhraseQuery(terms=("beta", "alpha")))
    assert list(ids2) == []


def test_multiterm_expansion():
    idx = make_index()
    q = parse_query("*lpha OR gam*")
    ids, scores = idx.evaluate(q)
    assert set(ids) == {0, 1, 2, 3, 5}


def test_weight_zero_for_absent_term():
    w = bm25.make_term_weight("zzz", 0, 10, 100)
    assert w.weight_value == np.float32(0.0)
