#!/usr/bin/env python
"""Profile the exact-phrase query's stage breakdown at bench scale.

Builds (or reuses) the 200k-doc bench index in /dev/shm and times:
  1. occurrence decode only (count of exploded rows)
  2. decode + gather shuffle + slot aggregation (count of doc groups)
  3. the full phrase query (median of 3)
plus term stats for the phrase terms, to decide where bm25_phrase's
wall goes before optimizing it.

Usage: python scripts/profile_phrase.py [--docs 200000]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--terms", nargs="+", default=["def", "class"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lucene_solr_spark.corpus import gen_corpus_spark
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import PhraseQuery
    from lucene_solr_spark.search.executor import IndexReader, Searcher, term_key
    from lucene_solr_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-Xms8g")
    spark = get_spark("lss-profile-phrase", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    docs = args.docs
    corpus_path = f"/tmp/lss_bench_corpus_{docs}_sorted"
    idx_dir = f"/dev/shm/lss_profile_index_{docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        shutil.rmtree(corpus_path, ignore_errors=True)
        (gen_corpus_spark(spark, docs, partitions=64)
         .repartitionByRange(64, "repo", "path")
         .sortWithinPartitions("repo", "path")
         .write.parquet(corpus_path))
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        max_file = max(
            os.path.getsize(os.path.join(corpus_path, f))
            for f in os.listdir(corpus_path) if f.endswith(".parquet"))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_file + (1 << 20)))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        corpus = spark.read.parquet(corpus_path)
        t0 = time.time()
        build_index(spark, idx_dir, [("bench", corpus)], analyzer="standard",
                    norms="byte", assume_sorted=True)
        print(f"build: {time.time()-t0:.2f}s")

    reader = IndexReader(spark, idx_dir, norms="byte")
    searcher = Searcher(reader, precision="float32")
    terms = args.terms
    keys = [term_key(None, t) for t in terms]
    n, sttf = reader.collection_stats(None)
    stats = reader.term_stats(keys)
    for k in keys:
        df, ttf = stats.get(k, (0, 0))
        print(f"term {k}: df={df} ({100.0*df/n:.1f}% of {n}), ttf={ttf}, "
              f"avg tf={ttf/max(df,1):.2f}")

    q = PhraseQuery(terms=tuple(terms))

    # stage 1: decode only
    occ = None
    for rep in range(2):
        t0 = time.time()
        sc = searcher._score_phrase(0, q, 1.0)
        # decode-only: count the occurrence relation feeding the shuffle
        from pyspark.sql import functions as F  # noqa
        t0 = time.time()
        cnt = None
        print(f"  (full plan count warm={rep}) ...", end="", flush=True)
        k = sc.count()
        print(f" rows={k} wall={time.time()-t0:.3f}s")

    # timed full query median-of-3
    reps = []
    for _ in range(3):
        t0 = time.time()
        searcher.search(q, k=10)
        reps.append(time.time() - t0)
    print(f"full search walls: {[round(r,3) for r in reps]} "
          f"median={sorted(reps)[1]:.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
