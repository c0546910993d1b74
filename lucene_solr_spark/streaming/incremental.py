"""Incremental (streaming) index maintenance + windowed aggregation.

IncrementalIndexer — the TopicStream analog: consume corpus rows from a
streaming source, index each micro-batch as a new segment, commit the
manifest per batch. Resume = Spark checkpoint (source offsets) + the
engine manifest (segment lineage); both are idempotent on batch_id, so
a crash between the two replays the batch into the same segment name
(overwrite-by-name, SURVEY §7 risk 5).

Scale: each micro-batch runs the same no-shuffle chamber build as the
batch path (indexing/builder.py); steady-state cost per batch is
O(batch docs), and the tiered merge policy consolidates the resulting
small segments in the background, exactly like Lucene's
ConcurrentMergeScheduler behind a live IndexWriter.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str,
                 analyzer: str = "standard", norms: str = "byte",
                 background_merge: bool = False):
        """background_merge=True: a ConcurrentMergeScheduler
        (indexing/scheduler.py) runs the tiered policy after every
        micro-batch on pool threads, consolidating the stream's small
        segments WHILE later batches index — exactly Lucene's CMS
        behind a live IndexWriter. The per-index commit lock keeps the
        foreachBatch commits and the merge swaps serializable."""
        self.spark = spark
        self.index_dir = index_dir
        self.analyzer = analyzer
        self.norms = norms
        self.scheduler = None
        if background_merge:
            from ..indexing.scheduler import ConcurrentMergeScheduler

            self.scheduler = ConcurrentMergeScheduler(spark, index_dir)

    def _index_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..indexing.builder import build_index

        if batch_df.isEmpty():
            return
        build_index(
            self.spark, self.index_dir,
            [(f"stream_{batch_id:08d}", batch_df)],
            analyzer=self.analyzer, norms=self.norms,
        )
        if self.scheduler is not None:
            self.scheduler.maybe_merge()

    def close(self):
        """Drain in-flight background merges (call after stopping the
        stream); returns the final manifest, or None without merges."""
        if self.scheduler is not None:
            return self.scheduler.close()
        return None

    def start(self, source_dir: str, checkpoint_dir: str,
              trigger_interval: Optional[str] = None,
              available_now: bool = False):
        """Stream corpus parquet files from source_dir into the index.

        trigger_interval: DaemonStream-style periodic run (e.g. "30 seconds");
        available_now=True: drain everything currently available, then
        stop (the one-shot topic drain used by tests/benchmarks).
        """
        src = (
            self.spark.readStream.schema(CORPUS_SCHEMA)
            .parquet(source_dir)
        )
        writer = (
            src.writeStream.foreachBatch(self._index_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()


def streaming_first_seen(df: DataFrame, key_col: str,
                         order_col: str) -> DataFrame:
    """Cross-batch exact dedup with keyed state — a custom stateful
    operator via applyInPandasWithState (the Spark primitive for
    operators Structured Streaming lacks):

    emit each key's FIRST row (min order_col within the first batch the
    key appears in); every later duplicate — same batch or any later
    micro-batch — is dropped. State per key is one boolean. This is the
    streaming analog of dedup_exact and of Solr's uniqueKey
    overwrite=false update semantics (update stream dedup;
    solr/core/.../update/processor/
    SignatureUpdateProcessorFactory.java dedup-by-signature).

    At 100 TB-of-stream scale the state store holds one tiny entry per
    distinct key, partitioned by the shuffle on key_col; RocksDB state
    backend + watermark-based TTL are the knobs on a real cluster."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = df.schema

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:  # drain (contract), emit nothing
                pass
            return
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values(order_col).iloc[[0]]
            if first is None or cand[order_col].iloc[0] < first[order_col].iloc[0]:
                first = cand
        state.update((True,))
        if first is not None:
            yield first

    return df.groupBy(key_col).applyInPandasWithState(
        fn, schema, "seen boolean", "append", GroupStateTimeout.NoTimeout
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """TimeSeriesStream as a streaming windowed agg with late-data
    handling: tumbling window on ts, watermark bounds state. Works on
    both batch and streaming frames (same plan; the batch run is the
    oracle for the streaming run in tests)."""
    # watermarks require TIMESTAMP (not NTZ); cast is a no-op instant-wise
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.floor(F.col("value") * 10000.0 + 0.5).cast("bigint")).alias("sum_value_e4"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "cnt", "sum_value_e4",
        )
    )
