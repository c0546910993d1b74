"""Deletes/updates: tombstone semantics, liveDocs filtering, merge
purge (reference: IndexWriter delete/update + PendingDeletes + .liv;
stats ignore deletions until merge).
"""

from __future__ import annotations

import shutil

import pytest

from lucene_solr_spark.queryast import TermQuery


@pytest.fixture()
def fresh_index(spark, tiny_corpus_pdf, tmp_path):
    from lucene_solr_spark.indexing.builder import build_index

    idx = str(tmp_path / "idx")
    n = len(tiny_corpus_pdf)
    half = n // 2
    b0 = spark.createDataFrame(tiny_corpus_pdf.iloc[:half])
    b1 = spark.createDataFrame(tiny_corpus_pdf.iloc[half:])
    build_index(spark, idx, [("b0", b0), ("b1", b1)])
    return idx


def _searcher(spark, idx):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    return Searcher(IndexReader(spark, idx))


def test_delete_by_term_filters_hits_keeps_stats(spark, fresh_index):
    from lucene_solr_spark.indexing import deletes

    s0 = _searcher(spark, fresh_index)
    before_hits = s0.count(TermQuery(term="ident007"))
    before_df = s0.reader.term_stats(["ident007"])["ident007"][0]
    assert before_hits > 0

    n_del = deletes.delete_by_terms(spark, fresh_index, ["ident007"])
    assert n_del == before_hits

    s1 = _searcher(spark, fresh_index)
    assert s1.count(TermQuery(term="ident007")) == 0
    # Lucene semantics: df/docCount unchanged until merge purge
    assert s1.reader.term_stats(["ident007"])["ident007"][0] == before_df
    assert s1.reader.doc_count == s0.reader.doc_count

    # other queries exclude the tombstoned docs too
    res = s1.search(TermQuery(term="import"), k=200)
    deleted = {r["doc_id"] for r in s1.reader.deletes.collect()}
    assert not (set(res["doc_id"]) & deleted)


def test_delete_idempotent(spark, fresh_index):
    from lucene_solr_spark.indexing import deletes

    n1 = deletes.delete_by_terms(spark, fresh_index, ["ident007"])
    n2 = deletes.delete_by_terms(spark, fresh_index, ["ident007"])
    assert n1 > 0 and n2 == 0


def test_update_documents(spark, fresh_index, tiny_corpus_pdf):
    from lucene_solr_spark.indexing import deletes

    victim = tiny_corpus_pdf.iloc[[0]].copy()
    victim["content"] = "zzupdated marker content"
    before_total = _searcher(spark, fresh_index).reader.doc_count

    out = deletes.update_documents(spark, fresh_index, spark.createDataFrame(victim))
    assert out["n_deleted"] == 1 and out["n_added"] == 1

    s = _searcher(spark, fresh_index)
    hits = s.search(TermQuery(term="zzupdated"), k=10)
    assert len(hits) == 1
    assert hits["doc_id"][0] >= before_total  # fresh docID appended


def test_merge_purges_deletes(spark, fresh_index):
    from lucene_solr_spark.indexing import deletes
    from lucene_solr_spark.indexing.merge import force_merge

    s0 = _searcher(spark, fresh_index)
    total = s0.reader.doc_count
    n_del = deletes.delete_by_terms(spark, fresh_index, ["ident007"])

    s1 = _searcher(spark, fresh_index)
    live_hits_before = s1.search(TermQuery(term="import"), k=500)

    force_merge(spark, fresh_index, max_segments=1)
    s2 = _searcher(spark, fresh_index)
    # physically purged: docCount shrinks, tombstones compacted away
    assert s2.reader.doc_count == total - n_del
    assert not s2.reader.has_deletes
    assert s2.count(TermQuery(term="ident007")) == 0
    # same matching docs (scores and hence order legitimately shift:
    # stats now reflect the purge — reference behavior after merges)
    after = s2.search(TermQuery(term="import"), k=500)
    assert set(after["doc_id"]) == set(live_hits_before["doc_id"])


def test_wand_respects_deletes(spark, fresh_index):
    from lucene_solr_spark.indexing import deletes

    deletes.delete_by_terms(spark, fresh_index, ["ident007"])
    s = _searcher(spark, fresh_index)
    q = TermQuery(term="import")
    a = s.search(q, k=10)
    b = s.search(q, k=10, prune=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])
