"""Graph traversal streams (solrj/io/graph, SURVEY §2.9 family).

Reference:
  - GatherNodesStream.java:66-118 — `nodes(...)`: breadth-first node
    gathering from a root set, one `walk` edge relation per level,
    with a Traversal visited-set so a node is emitted at the FIRST
    level it is reached (Traversal.java:30-52 visited check).
  - ShortestPathStream.java:60-135 — `shortestPath(...)`: iterative
    BFS frontier expansion (one join per level) from `from` to `to`,
    bounded by maxDepth, stopping at the first level that reaches the
    target and emitting every shortest path as a tuple of node hops.

Spark-first restatement: a frontier DataFrame expanded by one join per
level — the same shape the reference's per-level /export joins take,
but distributed: each level is ONE hash join on the edge key + an
anti-join against the visited set (gather) or an array-containment
cycle filter (paths). Lineage is truncated per level with
localCheckpoint, like datapipe.dedup.connected_components. At 100 TB
the frontier and visited sets shuffle on node id only (never the edge
payload), edges persist once, and each level is one scheduler wave —
BFS depth is bounded by maxDepth exactly as in the reference.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F


def gather_nodes(edges: DataFrame, roots: Sequence[str],
                 levels: int) -> DataFrame:
    """nodes(...) analog: (node, level) for every node reachable from
    `roots`, labeled with the FIRST level it is reached (roots are
    level 0; GatherNodesStream's Traversal dedups across levels).

    edges: (src, dst) string columns, one row per directed edge (feed
    both directions for an undirected walk).
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst").persist()
    try:
        visited = (
            spark.createDataFrame([(r,) for r in roots], "node string")
            .select("node", F.lit(0).alias("level"))
            .localCheckpoint(eager=True)
        )
        frontier = visited.select("node")
        for lvl in range(1, levels + 1):
            nxt = (
                edges.join(frontier, edges["src"] == frontier["node"])
                .select(F.col("dst").alias("node")).distinct()
                .join(visited.select("node"), "node", "left_anti")
            )
            nxt = nxt.select("node", F.lit(lvl).alias("level"))
            visited = visited.union(nxt).localCheckpoint(eager=True)
            frontier = visited.where(F.col("level") == lvl).select("node")
            if not frontier.take(1):
                break
        return visited
    finally:
        edges.unpersist()


def shortest_paths(edges: DataFrame, src: str, dst: str,
                   max_depth: int) -> DataFrame:
    """shortestPath(...) analog: every shortest path from `src` to
    `dst` within `max_depth` hops, one row per path with columns
    (path: array<string>, depth). Empty result if unreachable within
    the bound (ShortestPathStream emits nothing then too).

    BFS over the shortest-path DAG: a node first reached at level L
    only extends paths AT level L — frontier rows landing on a node
    already in the visited set (reached at an earlier level) are
    pruned (anti-join), exactly ShortestPathStream's Traversal prune,
    so enumeration is over shortest-path prefixes only, never all
    simple paths. Multiple shortest paths to the same node are all
    kept (dedup on full path, not node); stops at the FIRST level that
    reaches the target.
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst").persist()
    try:
        frontier = (
            spark.createDataFrame([(src,)], "node string")
            .select("node", F.array(F.col("node")).alias("path"))
            .localCheckpoint(eager=True)
        )
        visited = frontier.select("node").localCheckpoint(eager=True)
        for depth in range(1, max_depth + 1):
            frontier = (
                edges.join(frontier, edges["src"] == frontier["node"])
                .select(F.col("dst").alias("node"),
                        F.concat("path", F.array(F.col("dst"))).alias("path"))
                .join(visited, "node", "left_anti")
                .dropDuplicates(["path"])
                .localCheckpoint(eager=True)
            )
            hits = frontier.where(F.col("node") == dst)
            if hits.take(1):
                return hits.select("path", F.lit(depth).alias("depth"))
            if not frontier.take(1):
                break
            visited = (
                visited.union(frontier.select("node").distinct())
                .localCheckpoint(eager=True)
            )
        return (
            frontier.select("path", F.lit(0).alias("depth")).limit(0)
        )
    finally:
        edges.unpersist()
