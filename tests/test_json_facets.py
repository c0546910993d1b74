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
