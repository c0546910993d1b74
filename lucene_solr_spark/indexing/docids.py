"""Scalable dense docID assignment.

Canonical docID order is ORDER BY (repo, path) — load-bearing for
score tie-breaks (HitQueue.java:76-81; SURVEY §1.2: Lucene docIDs are
dense ints in insertion order). A single-partition window would
serialize the whole corpus through one task; instead:

  repartitionByRange(order) -> sortWithinPartitions(order)
  -> count rows per partition (one cheap job over the cached frame)
  -> broadcast prefix-sum offsets -> mapInPandas adds offset + arange.

Global ids are deterministic regardless of where the range partitioner
draws its boundaries, because the frame is globally sorted.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd


def assign_doc_ids(df, order_cols: List[str], base: int = 0, num_partitions: int | None = None):
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = df.repartitionByRange(parts, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    ).persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        sorted_df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    n_parts = max(by_pid.keys(), default=-1) + 1
    offsets = []
    acc = base
    for pid in range(n_parts):
        offsets.append(acc)
        acc += by_pid.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = f"doc_id long, {', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        off = b_offsets.value[ctx.partitionId()] if ctx else base
        for pdf in batches:
            ids = range(off, off + len(pdf))
            off += len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", list(ids))
            yield out

    return sorted_df.mapInPandas(add_ids, schema=schema), sorted_df
