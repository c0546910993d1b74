"""Graph traversal streams (solrj/io/graph analogs in graph.py)."""

from pyspark.sql import functions as F  # noqa: F401

from lucene_solr_spark.graph import gather_nodes, shortest_paths


def _edges(spark, pairs):
    und = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src string, dst string")


class TestGatherNodes:
    def test_first_level_wins(self, spark):
        # diamond: a-b, a-c, b-d, c-d — d is reachable at level 2 via
        # two routes but emitted ONCE, at its first-reached level
        e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
        got = {(r["node"], r["level"])
               for r in gather_nodes(e, ["a"], 3).collect()}
        assert got == {("a", 0), ("b", 1), ("c", 1), ("d", 2)}

    def test_root_not_reemitted(self, spark):
        # a-b: the walk back to the root must not re-emit it at level 2
        e = _edges(spark, [("a", "b")])
        got = {(r["node"], r["level"])
               for r in gather_nodes(e, ["a"], 2).collect()}
        assert got == {("a", 0), ("b", 1)}


class TestShortestPaths:
    def test_all_shortest_paths(self, spark):
        # two length-2 routes a->b->d and a->c->d, plus a length-3
        # detour a->x->y->d that must NOT be emitted
        e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                           ("a", "x"), ("x", "y"), ("y", "d")])
        rows = shortest_paths(e, "a", "d", 5).collect()
        assert {tuple(r["path"]) for r in rows} == {
            ("a", "b", "d"), ("a", "c", "d")}
        assert all(r["depth"] == 2 for r in rows)

    def test_unreachable_is_empty(self, spark):
        e = _edges(spark, [("a", "b"), ("c", "d")])
        assert shortest_paths(e, "a", "d", 4).count() == 0

    def test_max_depth_bound(self, spark):
        # chain a-b-c-d: shortest is 3 hops, maxDepth 2 finds nothing
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert shortest_paths(e, "a", "d", 2).count() == 0
        rows = shortest_paths(e, "a", "d", 3).collect()
        assert [tuple(r["path"]) for r in rows] == [("a", "b", "c", "d")]
