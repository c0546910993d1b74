"""End-to-end corpus curation: the composed decision a training-data
pipeline runs per document before a corpus ships — near-dup cluster
assignment + canonical-doc election + quality gating, as ONE DataFrame
job graph.

Pipeline (all stages are this package's own operators):
  1. Exact collapse: one md5 window elects a representative per
     byte-identical group, so the quadratic-in-cluster LSH pair join
     never sees a mega-cluster of identical docs (output-preserving —
     see curate's docstring).
  2. SimHash near-dup pairs over the representatives (pigeonhole band
     join, dedup.py) — the at-scale discovery path, no cross join.
  3. Connected components over the pair graph (hash-min label
     propagation) — transitive duplicate CLUSTERS, so A~B~C collapses
     to one survivor even when A and C were never paired directly.
  4. Canonical election: min doc_id per cluster (== the component
     label), the deterministic survivor rule.
  5. Quality gate (textqa.quality_score): length/stopword heuristics.

keep = (doc is its cluster's canonical) AND (quality >= threshold):
exactly the row filter a 100 TB pretraining corpus build applies. The
whole decision is oracle-checked in SQL (recursive CTE for the
transitive closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import connected_components, simhash_near_pairs
from .textqa import quality_score


def curate(docs: DataFrame, quality_threshold: float = 0.3,
           max_hamming: int = 3, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, component, quality, keep int): per-doc curation
    decision. Shuffles: one md5 hash-agg (exact collapse), one band
    join (pairs over representatives), one groupBy+join per component
    round (diameter-bounded), one quality map-only stage, one final
    join on doc_id.

    Exact dups are collapsed BEFORE the SimHash stage: a web-scale
    corpus has mega-clusters of byte-identical docs, and LSH banding
    puts all of them in one bucket — the pair join would be quadratic
    in the cluster size. Running near-dup discovery over one
    representative per exact group caps that blowup while provably
    preserving the output: exact-dup edges form cliques, every exact
    group's canonical (min id) is a member of the same near-dup
    cluster, so the cluster-min label each doc receives is unchanged."""
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.min(id_col).over(
            Window.partitionBy(F.md5(F.col(text_col)))
        ).alias("canonical_id"),
    )
    rep_ids = (
        ex.where(F.col("doc_id") == F.col("canonical_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    reps = docs.join(rep_ids, id_col, "left_semi")
    pairs = simhash_near_pairs(reps, max_hamming=max_hamming,
                               text_col=text_col, id_col=id_col)
    comp_rep = connected_components(
        pairs, reps.select(F.col(id_col).alias("doc_id")))
    # map every doc through its exact-group canonical's component
    comp = (
        ex.join(comp_rep.withColumnRenamed("doc_id", "canonical_id"),
                "canonical_id")
        .select("doc_id", "component")
    )
    q = quality_score(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "quality")
    keep = (
        (F.col("doc_id") == F.col("component"))
        & (F.col("quality") >= F.lit(quality_threshold))
    )
    return (
        comp.join(q, "doc_id")
        .select("doc_id", "component", "quality",
                keep.cast("int").alias("keep"))
    )
