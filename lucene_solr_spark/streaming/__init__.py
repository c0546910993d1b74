"""Structured Streaming operators: the Solr streaming/continuous
surface re-expressed on Spark (SURVEY §2.9).

  TopicStream  (solrj/io/stream/TopicStream.java:71-85 — "new docs
      since checkpoint", checkpointEvery batches)   -> incremental
      index build: file/parquet streaming source + foreachBatch into
      the segment builder; offsets live in the Spark checkpoint, the
      manifest records per-batch lineage.
  DaemonStream (DaemonStream.java:47-72 — rerun a plan at an interval)
      -> trigger(processingTime=...) / availableNow one-shot drains.
  TimeSeriesStream (TimeSeriesStream.java:57-101) -> watermarked
      tumbling-window aggregation (a SUPERSET: the reference has no
      late-data semantics at all).

The reference has no watermark concept; Spark's watermark + state
store give exactly-once windowed aggs for free. Everything here uses
the DataFrame streaming API — no custom receivers.
"""

from .incremental import (  # noqa: F401
    IncrementalIndexer,
    streaming_first_seen,
    windowed_event_counts,
)
