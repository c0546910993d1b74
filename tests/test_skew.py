"""Skewed-term stress: a mega-term present in EVERY doc (the worst
write- and read-path skew case). The build is shuffle-free so the
mega-term cannot skew an exchange; the read path parallelizes over its
block rows. Checks correctness end to end at maximal term skew."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.queryast import BooleanClause, BooleanQuery, Occur, TermQuery

pytestmark = pytest.mark.spark

N = 3000


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    from lucene_solr_spark.indexing.builder import build_index

    pdf = pd.DataFrame(
        {
            "repo": "r0",
            "path": [f"p{i:05d}" for i in range(N)],
            "commit": "c0",
            "lang": "txt",
            # "mega" in every doc; uniq only in its own; "half" in evens
            "content": [
                f"mega uniq{i:05d} " + ("half " if i % 2 == 0 else "")
                + "filler common words here"
                for i in range(N)
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("skew") / "idx")
    h = N // 2
    build_index(spark, idx, [("b0", spark.createDataFrame(pdf.iloc[:h])),
                             ("b1", spark.createDataFrame(pdf.iloc[h:]))])
    return idx


def test_mega_term_df_and_count(spark, skew_index):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    s = Searcher(IndexReader(spark, skew_index))
    assert s.reader.term_stats(["mega"])["mega"] == (N, N)
    assert s.count(TermQuery(term="mega")) == N
    assert s.count(TermQuery(term="half")) == N // 2


def test_mega_term_wand_rank_identical(spark, skew_index):
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    s = Searcher(IndexReader(spark, skew_index))
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="mega")),
        BooleanClause(Occur.SHOULD, TermQuery(term="uniq00042")),
    ))
    a = s.search(q, k=10)
    b = s.search(q, k=10, prune=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])
    # the unique term's doc carries both contributions -> must rank 1st
    assert a["doc_id"][0] == 42


def test_mega_selective_conjunction(spark, skew_index):
    """mega AND uniq: the chunk-intersection prefilter engages on the
    selective term and the result is exactly the one doc."""
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    s = Searcher(IndexReader(spark, skew_index))
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term="mega")),
        BooleanClause(Occur.MUST, TermQuery(term="uniq01234")),
    ))
    hits = s.search(q, k=10)
    assert list(hits["doc_id"]) == [1234]


def test_merge_with_mega_term(spark, skew_index, tmp_path):
    """Tiered merge re-packs the mega-term postings (term-keyed shuffle
    WITH chunk salt) and queries stay identical."""
    import shutil

    from lucene_solr_spark.indexing.check import check_index
    from lucene_solr_spark.indexing.merge import force_merge
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    idx = str(tmp_path / "copy")
    shutil.copytree(skew_index, idx)
    before = Searcher(IndexReader(spark, idx)).search(TermQuery(term="mega"), k=10)
    force_merge(spark, idx, max_segments=1)
    after = Searcher(IndexReader(spark, idx)).search(TermQuery(term="mega"), k=10)
    assert list(before["doc_id"]) == list(after["doc_id"])
    assert list(before["score"]) == list(after["score"])
    assert check_index(spark, idx)["clean"]
