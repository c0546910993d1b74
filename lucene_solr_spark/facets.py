"""Solr JSON Facet API mini-planner (solr/core/.../search/facet/
FacetModule.java, FacetRequest JSON surface): a nested facet request
dict compiles to DataFrame aggregation plans.

Supported request shape (the core of Solr's API):

  {"type": "terms", "field": "lang", "limit": 5,
   "sort": "count",                       # or "index"
   "facet": {
      "avg_len": "avg(n_chars)",          # stat facets (strings)
      "max_len": "max(n_chars)",
      "by_src": {"type": "terms", "field": "source", "limit": 3},
      "big":    {"type": "query", "q": "n_chars > 500"},
      "buckets":{"type": "range", "field": "n_chars",
                 "start": 0, "end": 2000, "gap": 500},
   }}

Execution model: each nested level is ONE groupBy over the parent's
bucket keys (partial+final hash agg) — Solr's two-phase distributed
refinement is unnecessary because Spark's aggregation is exact by
construction (SURVEY §2.8). Results come back as the same nested
bucket JSON Solr returns. Bucket counts are exact; stat expressions
are any Spark SQL aggregate expression string.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

STAT_KEYS = {"type", "field", "limit", "sort", "q", "start", "end", "gap"}


def _bucket_col(req: dict):
    kind = req.get("type", "terms")
    if kind == "terms":
        return F.col(req["field"])
    if kind == "range":
        start, gap = req["start"], req["gap"]
        return (F.floor((F.col(req["field"]) - start) / gap) * gap + start)
    raise ValueError(f"unsupported bucket type: {kind}")


def _stats_aggs(facet: dict) -> List:
    aggs = []
    for name, sub in facet.items():
        if isinstance(sub, str):
            aggs.append(F.expr(sub).alias(name))
    return aggs


def json_facets(df: DataFrame, req: dict, _parent_keys: Optional[List[str]] = None) -> dict:
    """Evaluate one facet request against df; returns Solr-style
    {"buckets": [{"val": ..., "count": ..., <stats>, <subfacets>}]}."""
    kind = req.get("type", "terms")
    facet = req.get("facet", {}) or {}

    if kind == "query":
        matched = df.where(req["q"])
        row = matched.agg(F.count(F.lit(1)).alias("count"), *_stats_aggs(facet)).collect()[0]
        out = {"count": int(row["count"])}
        for name in facet:
            if isinstance(facet[name], str):
                out[name] = row[name]
            else:
                out[name] = json_facets(matched, facet[name])
        return out

    bucket = _bucket_col(req).alias("__val")
    base = df.where(F.col(req["field"]).isNotNull())
    agg = base.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("count"), *_stats_aggs(facet)
    )
    if req.get("sort", "count") == "index":
        agg = agg.orderBy(F.asc("__val"))
    else:
        agg = agg.orderBy(F.desc("count"), F.asc("__val"))
    rows = agg.limit(int(req.get("limit", 10))).collect()

    buckets = []
    for r in rows:
        b: Dict = {"val": r["__val"], "count": int(r["count"])}
        for name, sub in facet.items():
            if isinstance(sub, str):
                b[name] = r[name]
            else:
                # sub-facet: re-aggregate within this bucket (Solr's
                # nested facet; one plan per parent bucket value —
                # small because parent buckets are limited)
                child_df = base.where(_bucket_col(req) == r["__val"])
                b[name] = json_facets(child_df, sub)
        buckets.append(b)
    return {"buckets": buckets}
