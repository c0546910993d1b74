"""Solr JDBC / SQL-over-JDBC source (streaming-expression `jdbc(...)`).

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
JDBCStream.java:60-118 — a streaming expression that opens a JDBC
connection, executes a SELECT, and emits tuples into the stream graph,
e.g. ``jdbc(connection="jdbc:...", sql="SELECT ...", sort="id asc")``.

Spark-first restatement: the JVM's JDBC DataSource IS this operator —
``spark.read.jdbc`` with predicate-based partitioning gives the same
tuple stream as a distributed scan (JDBCStream is single-connection;
Spark parallelizes over ``numPartitions`` ranges of
``partition_column``, which is strictly more capable at 100 TB). The
sort option maps to ``orderBy`` (Catalyst pushes it down when the
dialect supports it).

This container ships no JDBC driver jar and has no network, so the
function validates inputs and raises a clear error if the driver is
absent; the call surface is the one a real cluster uses unchanged.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def jdbc_stream(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    sort: Optional[str] = None,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: int = 1,
    driver: Optional[str] = None,
    properties: Optional[dict] = None,
) -> DataFrame:
    """JDBCStream analog: run ``query`` against ``url``, emit tuples.

    sort: "col asc[, col2 desc]" — JDBCStream's required sort param
    (stream-graph merge order); applied as orderBy.
    partition_column/lower_bound/upper_bound/num_partitions: Spark's
    range-partitioned parallel read (JDBCStream reads on one
    connection; at scale you want N).
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    reader = spark.read.format("jdbc").option("url", url)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound")
        # Spark's JDBC source forbids 'query' together with
        # 'partitionColumn' — the partitioned form requires the query
        # as a dbtable subquery alias instead.
        reader = (reader.option("dbtable", f"({query}) lss_jdbc_q")
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    else:
        reader = reader.option("query", query)
    for k, v in props.items():
        reader = reader.option(k, v)
    df = reader.load()
    if sort:
        from pyspark.sql import functions as F

        exprs = []
        for part in sort.split(","):
            toks = part.split()
            col = toks[0]
            desc = len(toks) > 1 and toks[1].lower().startswith("desc")
            exprs.append(F.col(col).desc() if desc else F.col(col).asc())
        df = df.orderBy(*exprs)
    return df
