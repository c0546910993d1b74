"""JSON Facet API mini-planner vs direct DataFrame aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.facets import json_facets

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_terms_facet_with_stats(spark, docs):
    res = json_facets(docs, {
        "type": "terms", "field": "lang", "limit": 3,
        "facet": {"avg_len": "avg(n_chars)", "max_len": "max(n_chars)"},
    })
    want = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("count"), F.avg("n_chars").alias("avg_len"),
             F.max("n_chars").alias("max_len"))
        .orderBy(F.desc("count"), F.asc("lang")).limit(3).collect()
    )
    assert [b["val"] for b in res["buckets"]] == [r["lang"] for r in want]
    assert [b["count"] for b in res["buckets"]] == [r["count"] for r in want]
    assert [b["avg_len"] for b in res["buckets"]] == [r["avg_len"] for r in want]


def test_nested_terms_and_query_facets(spark, docs):
    res = json_facets(docs, {
        "type": "terms", "field": "lang", "limit": 2,
        "facet": {
            "by_src": {"type": "terms", "field": "source", "limit": 2},
            "big": {"type": "query", "q": "n_chars > 500"},
        },
    })
    for b in res["buckets"]:
        sub = docs.where(F.col("lang") == b["val"])
        want_src = (
            sub.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("source")).limit(2).collect()
        )
        assert [x["val"] for x in b["by_src"]["buckets"]] == [r["source"] for r in want_src]
        assert b["big"]["count"] == sub.where("n_chars > 500").count()


def test_range_facet(spark, docs):
    res = json_facets(docs, {
        "type": "range", "field": "n_chars", "start": 0, "end": 4000,
        "gap": 1000, "limit": 10, "sort": "index",
    })
    want = (
        docs.groupBy((F.floor(F.col("n_chars") / 1000) * 1000).alias("v"))
        .count().orderBy("v").collect()
    )
    got = {b["val"]: b["count"] for b in res["buckets"]}
    for r in want[:10]:
        assert got[r["v"]] == r["count"]


def test_nested_facets_one_job_per_node(spark, docs, monkeypatch):
    """The nested planner must run ONE aggregation per facet NODE, not
    per parent bucket: a 2-level request with limit=3 parents is 2
    collect()s (parent agg + windowed child agg), not 1 + 3."""
    cls = type(docs)  # concrete DataFrame class (classic vs connect)
    calls = []
    orig = cls.collect

    def counting_collect(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting_collect)
    res = json_facets(docs, {
        "type": "terms", "field": "lang", "limit": 3,
        "facet": {"by_src": {"type": "terms", "field": "source", "limit": 2}},
    })
    assert len(calls) == 2
    assert len(res["buckets"]) == 3
    assert all(len(b["by_src"]["buckets"]) <= 2 for b in res["buckets"])


def test_three_level_nested_facets(spark, docs):
    """Depth-3 nesting stays one job per node and produces per-ancestor
    limited buckets."""
    res = json_facets(docs, {
        "type": "terms", "field": "lang", "limit": 2,
        "facet": {
            "by_src": {
                "type": "terms", "field": "source", "limit": 2,
                "facet": {
                    "sz": {"type": "range", "field": "n_chars",
                           "start": 0, "end": 4000, "gap": 2000,
                           "sort": "index"},
                    "avg_len": "avg(n_chars)",
                },
            },
        },
    })
    for b in res["buckets"]:
        sub = docs.where(F.col("lang") == b["val"])
        for sb in b["by_src"]["buckets"]:
            ss = sub.where(F.col("source") == sb["val"])
            assert sb["count"] == ss.count()
            assert sb["avg_len"] == pytest.approx(
                ss.agg(F.avg("n_chars")).collect()[0][0])
            want = {
                r["v"]: r["count"]
                for r in ss.groupBy(
                    (F.floor(F.col("n_chars") / 2000) * 2000).alias("v"))
                .count().collect()
            }
            got = {x["val"]: x["count"] for x in sb["sz"]["buckets"]}
            assert got == dict(list(sorted(want.items()))[:10])
