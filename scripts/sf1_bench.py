#!/usr/bin/env python
"""Scale-curve evidence (sf1 analog): build a 2M-doc segment index and
time the headline query shapes, logging WAND's decoded-block fraction.

The round bench (bench.py) measures 200k docs; all 100-TB claims above
that rest on plan shape. This harness demonstrates the CURVE: query
cost vs corpus growth at 10x the bench corpus, with the pruned path's
blocks_decoded / blocks_total ratio recorded (sub-linear decode work is
the whole point of block-max WAND).

Usage: python scripts/sf1_bench.py [--docs 2000000] [--reuse]
Writes SF1_BENCH.json at the repo root and prints one JSON line.
Run on a quiet machine (BASELINE.md scaling rule).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def median3(fn):
    reps = []
    for _ in range(3):
        t0 = time.time()
        fn()
        reps.append(time.time() - t0)
    return sorted(reps)[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing index/corpus at the same size")
    args = ap.parse_args()

    from lucene_solr_spark.corpus import gen_corpus_spark
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import (
        BooleanClause, BooleanQuery, Occur, PhraseQuery, TermQuery)
    from lucene_solr_spark.search.executor import IndexReader, Searcher
    from lucene_solr_spark.session import get_spark

    spark = get_spark("lss-sf1", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = args.docs
    corpus_path = f"/tmp/lss_bench_corpus_{docs}_sorted"
    idx = f"/tmp/lss_sf1_index_{docs}"
    out: dict = {"docs": docs, "cpus": args.cpus}

    if not os.path.exists(corpus_path):
        (gen_corpus_spark(spark, docs, partitions=64)
         .repartitionByRange(64, "repo", "path")
         .sortWithinPartitions("repo", "path")
         .write.parquet(corpus_path))
    max_file = max(os.path.getsize(os.path.join(corpus_path, f))
                   for f in os.listdir(corpus_path) if f.endswith(".parquet"))
    # one chamber per corpus file: session conf, NOT a read option (the
    # DataFrameReader silently ignores unknown options)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_file + (1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    corpus = spark.read.parquet(corpus_path)

    from lucene_solr_spark.indexing.manifest import ManifestStore
    if not (args.reuse and ManifestStore(idx).load().total_docs == docs):
        shutil.rmtree(idx, ignore_errors=True)
        # warmup (JVM + python workers) so the build wall is steady-state:
        # one FULL-SIZE untimed build brings every worker to its
        # flush-buffer high-water mark (first-touch page faults are paid
        # once per worker on this lazily-paged VM; a long-running cluster
        # executor is always past that point)
        build_index(spark, "/tmp/lss_sf1_warm", [("warm", corpus)],
                    analyzer="standard", norms="byte", assume_sorted=True)
        shutil.rmtree("/tmp/lss_sf1_warm", ignore_errors=True)
        t0 = time.time()
        build_index(spark, idx, [("sf1", corpus)], analyzer="standard",
                    norms="byte", assume_sorted=True)
        dt = time.time() - t0
        out["index_build"] = {"wall_s": round(dt, 2),
                              "docs_per_sec": round(docs / dt, 1)}

    searcher = Searcher(IndexReader(spark, idx, norms="byte"),
                        precision="float32")
    queries = {
        "term": TermQuery(term="import"),
        "and": BooleanQuery(clauses=(
            BooleanClause(Occur.MUST, TermQuery(term="import")),
            BooleanClause(Occur.MUST, TermQuery(term="ident042")),
        )),
        "or": BooleanQuery(clauses=(
            BooleanClause(Occur.SHOULD, TermQuery(term="class")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident007")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident123")),
        )),
        "phrase": PhraseQuery(terms=("def", "class")),
    }
    walls: dict = {}
    for name, q in queries.items():
        walls[name] = round(median3(lambda: searcher.search(q, k=10)), 3)
    for name in ("term", "or"):
        q = queries[name]
        walls[f"{name}_wand"] = round(
            median3(lambda: searcher.search(q, k=10, prune=True)), 3)
        st = getattr(searcher, "last_wand_stats", {})
        tot = max(1, st.get("blocks_total", 0))
        out[f"wand_{name}"] = {
            **st, "decode_fraction": round(st.get("blocks_decoded", 0) / tot, 4),
        }
    out["query_walls_s"] = walls
    line = json.dumps(out)
    with open(os.path.join(REPO, "SF1_BENCH.json"), "w") as f:
        f.write(line + "\n")
    try:
        spark.stop()
        time.sleep(1.0)
    except Exception:
        pass
    sys.stderr.flush()
    print(line, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
