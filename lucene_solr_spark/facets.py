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

Execution model — ONE aggregation job per facet NODE, never per parent
bucket: a nested facet at depth d runs a single groupBy over (ancestor
bucket keys..., own bucket key) with a window top-N per ancestor tuple
for the limit, then the driver reshapes the (small, limit-bounded)
result into Solr's nested bucket JSON. With limit=10 and two levels
that is 2 jobs total (the per-parent-bucket re-scan this replaces ran
~100). Solr's two-phase distributed refinement is unnecessary because
Spark's hash aggregation is exact by construction (SURVEY §2.8).
Bucket counts are exact; stat expressions are any Spark SQL aggregate
expression string.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, Window, functions as F

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


def _scope_to_kept(df, ancestors, kept):
    """Push the kept-ancestor filter INTO the plan (per-level isin — a
    superset of the kept tuples, bounded by the product of parent
    limits) so nested aggregations and their driver collects stay
    bounded regardless of parent-field cardinality."""
    if not kept:
        return df
    for i, (_, expr) in enumerate(ancestors):
        df = df.where(expr.isin(list({k[i] for k in kept})))
    return df


def _split_facets(facet: dict):
    stats = [n for n, s in facet.items() if isinstance(s, str)]
    subs = [(n, s) for n, s in facet.items() if not isinstance(s, str)]
    return stats, subs


def json_facets(df: DataFrame, req: dict) -> dict:
    """Evaluate one facet request against df; returns Solr-style
    {"buckets": [{"val": ..., "count": ..., <stats>, <subfacets>}]}
    (or {"count": ..., ...} for a query facet)."""
    return _eval(df, [], None, req)[()]


# ancestors: [(alias, bucket_col_expr)] of enclosing terms/range facets;
# kept: ancestor value tuples whose buckets survived their limits
# (None = root). Returns {ancestor_tuple: result_node}.

def _eval(df: DataFrame, ancestors: List[Tuple[str, object]],
          kept: Optional[List[tuple]], req: dict) -> Dict[tuple, dict]:
    kind = req.get("type", "terms")
    facet = req.get("facet", {}) or {}
    stats, subs = _split_facets(facet)
    anc_aliases = [a for a, _ in ancestors]
    anc_cols = [e.alias(a) for a, e in ancestors]

    if kind == "query":
        matched = df.where(req["q"])
        if not ancestors:
            row = matched.agg(F.count(F.lit(1)).alias("count"),
                              *_stats_aggs(facet)).collect()[0]
            node = {"count": int(row["count"])}
            for name in stats:
                node[name] = row[name]
            for name, sub in subs:
                node[name] = _eval(matched, [], None, sub)[()]
            return {(): node}
        # one conditional aggregation, scoped to the kept ancestors
        g = _scope_to_kept(matched, ancestors, kept).groupBy(*anc_cols).agg(
            F.count(F.lit(1)).alias("count"), *_stats_aggs(facet)
        )
        res: Dict[tuple, dict] = {}
        for r in g.collect():
            key = tuple(r[a] for a in anc_aliases)
            if kept is not None and key not in kept:
                continue
            node = {"count": int(r["count"])}
            for name in stats:
                node[name] = r[name]
            res[key] = node
        for k in kept or []:
            res.setdefault(k, {"count": 0, **{n: None for n in stats}})
        for name, sub in subs:
            sub_res = _eval(matched, ancestors, list(res), sub)
            for k, node in res.items():
                node[name] = sub_res.get(k, _empty_node(sub))
        return res

    # terms / range facet: ONE groupBy over (ancestors..., own bucket),
    # limits applied per ancestor tuple via a window row_number
    bexpr = _bucket_col(req)
    base = df.where(F.col(req["field"]).isNotNull())
    scoped = _scope_to_kept(base, ancestors, kept)
    limit = int(req.get("limit", 10))
    by_index = req.get("sort", "count") == "index"
    g = scoped.groupBy(*anc_cols, bexpr.alias("__val")).agg(
        F.count(F.lit(1)).alias("count"), *_stats_aggs(facet)
    )
    if ancestors:
        order = [F.asc("__val")] if by_index else [F.desc("count"), F.asc("__val")]
        w = Window.partitionBy(*[F.col(a) for a in anc_aliases]).orderBy(*order)
        rows = (
            g.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= limit)
            .collect()
        )
        rows.sort(key=lambda r: r["__rn"])  # in-ancestor rank order
    else:
        order = [F.asc("__val")] if by_index else [F.desc("count"), F.asc("__val")]
        rows = g.orderBy(*order).limit(limit).collect()

    res = {}
    kept_child: List[tuple] = []
    row_nodes: Dict[tuple, dict] = {}
    for r in rows:
        key = tuple(r[a] for a in anc_aliases)
        if kept is not None and key not in kept:
            continue
        node = {"val": r["__val"], "count": int(r["count"])}
        for name in stats:
            node[name] = r[name]
        res.setdefault(key, {"buckets": []})["buckets"].append(node)
        child_key = key + (r["__val"],)
        kept_child.append(child_key)
        row_nodes[child_key] = node
    for k in kept or []:
        res.setdefault(k, {"buckets": []})

    depth = len(ancestors)
    child_ancestors = ancestors + [(f"__a{depth}", bexpr)]
    for name, sub in subs:
        sub_res = _eval(base, child_ancestors, kept_child, sub)
        for child_key, node in row_nodes.items():
            node[name] = sub_res.get(child_key, _empty_node(sub))
    return res


def _empty_node(req: dict) -> dict:
    stats = [n for n, sub in (req.get("facet") or {}).items()
             if isinstance(sub, str)]
    if req.get("type", "terms") == "query":
        return {"count": 0, **{n: None for n in stats}}
    return {"buckets": []}
