"""Interleaved A/B: split pblob column vs inline-positions blob.

Builds one 200k-doc index in the current (split) format, derives an
inline-format twin by re-encoding every block (same postings, same
metadata), then times the bench's BM25 queries on both, interleaved in
ONE Spark session (host capacity swings make cross-run walls useless —
BASELINE.md). Prints one JSON line."""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))


def make_inline_twin(spark, src_dir: str, dst_dir: str) -> None:
    """Copy the index, rewriting postings to the old inline format."""
    from typing import Iterator

    import pandas as pd

    from lucene_solr_spark.codec import decode_block_positions, encode_block
    from lucene_solr_spark.indexing.builder import POSTINGS_SCHEMA
    from lucene_solr_spark.indexing.manifest import ManifestStore, postings_path

    shutil.rmtree(dst_dir, ignore_errors=True)
    shutil.copytree(src_dir, dst_dir)
    store = ManifestStore(dst_dir)
    inline_schema = POSTINGS_SCHEMA.replace(", pblob binary", "")
    for seg in store.load().segments:
        ppath = postings_path(store.segment_dir(seg.name))
        df = spark.read.parquet(ppath)

        def reenc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                blobs = []
                for blob, pblob in zip(pdf["blob"], pdf["pblob"]):
                    d, f, nb, pos = decode_block_positions(
                        bytes(blob), None if pblob is None else bytes(pblob))
                    blobs.append(encode_block(d, f, nb,
                                              pos if len(pos) else None))
                out = pdf.drop(columns=["pblob"]).copy()
                out["blob"] = blobs
                yield out

        tmp = ppath + "__inline"
        df.mapInPandas(reenc, schema=inline_schema) \
          .write.mode("overwrite").parquet(tmp)
        shutil.rmtree(ppath)
        os.rename(tmp, ppath)


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from lucene_solr_spark.corpus import gen_corpus_spark
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import (BooleanClause, BooleanQuery,
                                            Occur, PhraseQuery, TermQuery)
    from lucene_solr_spark.search.executor import IndexReader, Searcher
    from lucene_solr_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-Xms16g -XX:+AlwaysPreTouch")
    spark = get_spark("lss-ab-pos-split")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"/tmp/lss_bench_corpus_{N_DOCS}_sorted"
    if not os.path.exists(corpus_path):
        (gen_corpus_spark(spark, N_DOCS, partitions=CPUS)
         .repartitionByRange(64, "repo", "path")
         .sortWithinPartitions("repo", "path")
         .write.parquet(corpus_path))
    max_file = max(os.path.getsize(os.path.join(corpus_path, f))
                   for f in os.listdir(corpus_path) if f.endswith(".parquet"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_file + (1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    corpus = spark.read.parquet(corpus_path)

    split_dir = "/dev/shm/lss_ab_split"
    inline_dir = "/dev/shm/lss_ab_inline"
    shutil.rmtree(split_dir, ignore_errors=True)
    build_index(spark, split_dir, [("bench", corpus)], analyzer="standard",
                norms="byte", positions=True, assume_sorted=True)
    make_inline_twin(spark, split_dir, inline_dir)

    searchers = {
        "split": Searcher(IndexReader(spark, split_dir, norms="byte"),
                          precision="float32"),
        "inline": Searcher(IndexReader(spark, inline_dir, norms="byte"),
                           precision="float32"),
    }
    queries = {
        "bm25_term": (TermQuery(term="import"), {}),
        "bm25_and": (BooleanQuery(clauses=(
            BooleanClause(Occur.MUST, TermQuery(term="import")),
            BooleanClause(Occur.MUST, TermQuery(term="ident042")),
        )), {}),
        "bm25_or": (BooleanQuery(clauses=(
            BooleanClause(Occur.SHOULD, TermQuery(term="class")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident007")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident123")),
        )), {}),
        "bm25_phrase": (PhraseQuery(terms=("def", "class")), {}),
        "bm25_term_wand": (TermQuery(term="import"), {"prune": True}),
        "bm25_or_wand": (BooleanQuery(clauses=(
            BooleanClause(Occur.SHOULD, TermQuery(term="class")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident007")),
            BooleanClause(Occur.SHOULD, TermQuery(term="ident123")),
        )), {"prune": True}),
    }

    # warm both paths once, untimed
    for s in searchers.values():
        s.search(queries["bm25_term"][0], k=10)

    walls: dict = {v: {} for v in searchers}
    REPS = 5
    for qname, (q, kw) in queries.items():
        per = {v: [] for v in searchers}
        for rep in range(REPS):
            order = ["split", "inline"] if rep % 2 == 0 else ["inline", "split"]
            for v in order:
                t0 = time.time()
                r = searchers[v].search(q, k=10, **kw)
                per[v].append(time.time() - t0)
                assert len(r) >= 0
        for v in searchers:
            walls[v][qname] = round(sorted(per[v])[REPS // 2], 4)

    out = {
        "docs": N_DOCS,
        "cpus": CPUS,
        "reps": REPS,
        "median_wall_s": walls,
        "ratio_split_over_inline": {
            q: round(walls["split"][q] / walls["inline"][q], 3)
            for q in queries
        },
        "index_bytes": {"split": du(split_dir), "inline": du(inline_dir)},
    }
    shutil.rmtree(split_dir, ignore_errors=True)
    shutil.rmtree(inline_dir, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
