"""Diagnostic: how loose is the (max_tf, min_norm) block bound vs the
ideal per-block impact bound (max realized score)?  Builds a 200k-doc
bench index, then for each bench query term reports what fraction of
blocks COULD be pruned against the true k-th score under each bound."""
import os, shutil, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from lucene_solr_spark.corpus import gen_corpus_spark
from lucene_solr_spark.indexing.builder import build_index
from lucene_solr_spark.search.executor import IndexReader, Searcher, _wand_clause_scores
from lucene_solr_spark.codec import decode_block
from lucene_solr_spark.queryast import TermQuery
from lucene_solr_spark.session import get_spark
from pyspark.sql import functions as F

N = int(os.environ.get("DIAG_DOCS", "200000"))
spark = get_spark("diag-wand")
spark.sparkContext.setLogLevel("ERROR")
idx = "/dev/shm/lss_diag_index"
corpus_path = f"/tmp/lss_bench_corpus_{N}_sorted"
if not os.path.exists(corpus_path):
    (gen_corpus_spark(spark, N, partitions=32)
     .repartitionByRange(64, "repo", "path")
     .sortWithinPartitions("repo", "path").write.parquet(corpus_path))
corpus = spark.read.parquet(corpus_path)
if not os.path.exists(idx):
    build_index(spark, idx, [("bench", corpus)], analyzer="standard",
                norms="byte", assume_sorted=True)
reader = IndexReader(spark, idx, norms="byte")
searcher = Searcher(reader, precision="float32")
K = 10
for term in ["import", "class", "ident007", "ident123", "ident042"]:
    clause_terms = [(0, term, 1.0)]
    winfo, ub_wv, _ = searcher._per_clause_params(clause_terms)
    info = {"by_term": {term: [(0, 1.0)]}, "winfo": winfo}
    w = winfo[f"{term}\x001.0"]
    cache = np.asarray(w["cache"], dtype=np.float32)
    rows = (reader.blocks.where(F.col("term") == term)
            .select("max_tf", "min_norm", "blob").collect())
    cur_ub = np.empty(len(rows)); ideal_ub = np.empty(len(rows))
    all_scores = []
    for i, r in enumerate(rows):
        nv = cache[r["min_norm"] & 0xFF]
        mt = np.float32(r["max_tf"])
        cur_ub[i] = float((np.float32(w["wv"]) * mt) / (mt + nv))
        doc_ids, tfs, norms = decode_block(bytes(r["blob"]))
        (_cid, sc), = _wand_clause_scores(term, tfs, norms, info, "float32", "byte")
        ideal_ub[i] = sc.max()
        all_scores.append(sc)
    sc_all = np.concatenate(all_scores)
    theta = float(np.partition(sc_all, -K)[-K]) if len(sc_all) >= K else -np.inf
    print(f"{term}: df={len(sc_all)} blocks={len(rows)} theta*={theta:.4f} "
          f"cur_ub[med={np.median(cur_ub):.4f} max={cur_ub.max():.4f}] "
          f"ideal_ub[med={np.median(ideal_ub):.4f}] "
          f"prunable_cur={(cur_ub < theta).mean():.3f} "
          f"prunable_ideal={(ideal_ub < theta).mean():.3f}")
