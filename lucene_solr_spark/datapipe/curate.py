"""End-to-end corpus curation: the composed decision a training-data
pipeline runs per document before a corpus ships — near-dup cluster
assignment + canonical-doc election + quality gating, as ONE DataFrame
job graph.

Pipeline (all stages are this package's own operators):
  1. SimHash near-dup pairs (pigeonhole band join, dedup.py) — the
     at-scale discovery path, no cross join.
  2. Connected components over the pair graph (hash-min label
     propagation) — transitive duplicate CLUSTERS, so A~B~C collapses
     to one survivor even when A and C were never paired directly.
  3. Canonical election: min doc_id per cluster (== the component
     label), the deterministic survivor rule.
  4. Quality gate (textqa.quality_score): length/stopword heuristics.

keep = (doc is its cluster's canonical) AND (quality >= threshold):
exactly the row filter a 100 TB pretraining corpus build applies. The
whole decision is oracle-checked in SQL (recursive CTE for the
transitive closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import connected_components, simhash_near_pairs
from .textqa import quality_score


def curate(docs: DataFrame, quality_threshold: float = 0.3,
           max_hamming: int = 3, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, component, quality, keep int): per-doc curation
    decision. Shuffles: one band join (pairs), one groupBy+join per
    component round (diameter-bounded), one quality map-only stage,
    one final join on doc_id."""
    pairs = simhash_near_pairs(docs, max_hamming=max_hamming,
                               text_col=text_col, id_col=id_col)
    comp = connected_components(pairs, docs.select(F.col(id_col).alias("doc_id")))
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
