"""End-to-end LLM training-data curation pipeline, Spark-first.

The sequence a production pretraining-data pipeline runs, composed
from this repo's operators — every stage map-only or one bounded
shuffle, so the same plan runs at 100 TB:

  1. quality gate      (textqa.quality_score + repetition_stats)
  2. PII scrub         (textqa.pii_scrub)
  3. exact dedup       (dedup.exact_dedup)
  4. near-dup dedup    (dedup.simhash pairs -> connected components)
  5. decontamination   (textqa.decontaminate vs an eval set)
  6. token accounting  (textqa.token_counts)

Run:  python examples/curation_pipeline.py
(uses /root/testdata/sf0.001; ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.appName("lss-curation")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.datapipe import dedup, textqa

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality gate: length/stopword heuristics + repetition signals
    q = textqa.quality_score(docs).select("doc_id", "quality")
    rep = textqa.repetition_stats(docs).select(
        "doc_id", "dup_line_frac", "bigram_dup_frac")
    keep = (q.join(rep, "doc_id")
            .where((F.col("quality") > 0.2)
                   & (F.col("dup_line_frac") < 0.3)
                   & (F.col("bigram_dup_frac") < 0.6))
            .select("doc_id"))
    docs = docs.join(keep, "doc_id")
    print(f"after quality gate: {docs.count()}")

    # 2. PII scrub (counts + redacted fingerprint; production would
    #    write the redacted text column itself)
    pii = textqa.pii_scrub(docs)
    n_pii = pii.where(
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0).count()
    print(f"docs with PII redacted: {n_pii}"
          " (0 expected: the synthetic corpus carries no addresses;"
          " the gate entry text_pii_scrub injects deterministic PII)")

    # 3. exact dedup: one doc per normalized-content hash
    canon = dedup.exact_dedup(docs).where(
        F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    docs = docs.join(canon, "doc_id")
    print(f"after exact dedup: {docs.count()}")

    # 4. near-dup dedup: simhash pairs -> components -> keep min doc_id
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3)
    comp = dedup.connected_components(pairs, docs.select("doc_id"))
    docs = (docs.join(comp, "doc_id")
            .where(F.col("doc_id") == F.col("component")).drop("component"))
    print(f"after near-dup dedup: {docs.count()}")

    # 5. decontamination vs the held-out eval slice
    eval_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") % 97 == 0)
    contaminated = textqa.decontaminate(docs, eval_docs, k=4).where(
        F.col("contamination") > 0.5).select("doc_id")
    docs = docs.join(contaminated, "doc_id", "left_anti")
    print(f"after decontamination: {docs.count()}")

    # 6. token accounting for the surviving corpus
    textqa.token_counts(docs, group_col="source").orderBy("grp").show()

    spark.stop()


if __name__ == "__main__":
    main()
