#!/usr/bin/env python
"""spark-submit entry point: build (or resume) an index over a corpus
table, then run the reference query set and print throughput/latency.

  spark-submit --master <cluster> --py-files dist/lucene_solr_spark.zip \
      scripts/submit_build.py --corpus <parquet-or-iceberg-path> \
      --index /shared/index [--sorted] [--queries import,def,"a AND b"]

On a cluster the SparkSession comes from spark-submit's conf (executors
set there); locally it falls back to local[SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--batch", default="submit0")
    ap.add_argument("--sorted", action="store_true",
                    help="corpus is globally sorted by (repo,path): zero-shuffle docids")
    ap.add_argument("--queries", default="import,def,import AND ident000")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lss-submit").getOrCreate()

    from lucene_solr_spark.analysis import standard_analyze
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import parse_query
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    corpus = spark.read.parquet(args.corpus)
    t0 = time.time()
    manifest = build_index(
        spark, args.index, [(args.batch, corpus)], assume_sorted=args.sorted
    )
    build_s = time.time() - t0

    searcher = Searcher(IndexReader(spark, args.index))

    def analyzer(s):
        return [t for t, _ in standard_analyze(s)]

    lat = {}
    for qs in args.queries.split(","):
        t0 = time.time()
        searcher.search(parse_query(qs, analyzer=analyzer), k=10)
        lat[qs] = round((time.time() - t0) * 1000, 1)

    print(json.dumps({
        "docs": manifest.total_docs,
        "build_s": round(build_s, 2),
        "docs_per_sec": round(manifest.total_docs / build_s, 1),
        "query_ms": lat,
    }))


if __name__ == "__main__":
    main()
