"""LRU query cache: FILTER doc-set reuse (LRUQueryCache analog)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queryast import (
    BooleanClause, BooleanQuery, MultiTermQuery, Occur, TermQuery,
)
from lucene_solr_spark.search.cache import QueryCache

pytestmark = pytest.mark.spark


def _q(filter_q, scored_term="import"):
    return BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term=scored_term)),
        BooleanClause(Occur.FILTER, filter_q),
    ))


def test_filter_cache_hit_and_identical_results(spark, tiny_index):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    reader = IndexReader(spark, tiny_index)
    plain = Searcher(reader)
    cache = QueryCache(max_entries=4)
    cached = Searcher(reader, query_cache=cache)

    filt = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="class")),
        BooleanClause(Occur.SHOULD, TermQuery(term="def")),
    ))
    a = cached.search(_q(filt), k=10)
    assert cache.misses == 1 and cache.hits == 0
    b = cached.search(_q(filt), k=10)          # same filter, reused
    c = cached.search(_q(filt, "ident007"), k=10)  # different scored part
    assert cache.misses == 1 and cache.hits == 2

    want = plain.search(_q(filt), k=10)
    assert list(a["doc_id"]) == list(b["doc_id"]) == list(want["doc_id"])
    assert list(a["score"]) == list(b["score"]) == list(want["score"])
    assert len(c) > 0
    cache.clear()


def test_cache_eviction_unpersists(spark, tiny_index):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    cache = QueryCache(max_entries=2)
    s = Searcher(IndexReader(spark, tiny_index), query_cache=cache)
    for t in ("class", "def", "return"):
        filt = BooleanQuery(clauses=(
            BooleanClause(Occur.SHOULD, TermQuery(term=t)),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident001")),
        ))
        s.search(_q(filt), k=5)
    assert len(cache._entries) == 2  # LRU evicted the first
    assert cache.misses == 3
    cache.clear()
    assert len(cache._entries) == 0
