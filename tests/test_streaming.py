"""Streaming surface: incremental index equivalence + windowed aggs.

Mirrors the reference's topic-stream semantics test: indexing a corpus
through N streamed micro-batches must answer queries identically to one
batch build (TopicStream checkpoint/incremental contract +
SegmentInfos commit points).
"""

from __future__ import annotations

import os
import time

import pytest


@pytest.fixture(scope="module")
def stream_corpus(tmp_path_factory, tiny_corpus_pdf):
    """Corpus split into 3 parquet files dropped into a source dir."""
    d = tmp_path_factory.mktemp("stream_src")
    n = len(tiny_corpus_pdf)
    cut1, cut2 = n // 3, 2 * n // 3
    parts = [
        tiny_corpus_pdf.iloc[:cut1],
        tiny_corpus_pdf.iloc[cut1:cut2],
        tiny_corpus_pdf.iloc[cut2:],
    ]
    for i, p in enumerate(parts):
        p.to_parquet(d / f"part{i}.parquet", index=False)
    return str(d)


def test_incremental_index_matches_batch(spark, stream_corpus, tiny_corpus_pdf,
                                         tmp_path_factory):
    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import TermQuery
    from lucene_solr_spark.search.executor import IndexReader, Searcher
    from lucene_solr_spark.streaming import IncrementalIndexer

    base = tmp_path_factory.mktemp("stream_idx")
    inc_dir = str(base / "incremental")
    batch_dir = str(base / "batch")
    ckpt = str(base / "ckpt")

    q = IncrementalIndexer(spark, inc_dir).start(
        stream_corpus, ckpt, available_now=True
    )
    q.awaitTermination(300)

    sdf = spark.createDataFrame(tiny_corpus_pdf)
    build_index(spark, batch_dir, [("all", sdf)])

    r_inc = Searcher(IndexReader(spark, inc_dir))
    r_bat = Searcher(IndexReader(spark, batch_dir))
    assert r_inc.reader.doc_count == r_bat.reader.doc_count == len(tiny_corpus_pdf)
    assert r_inc.reader.sum_dl == r_bat.reader.sum_dl

    for term in ["import", "ident007", "class"]:
        a = r_inc.search(TermQuery(term=term), k=10)
        b = r_bat.search(TermQuery(term=term), k=10)
        # docIDs may differ between the two (batch split points change
        # assignment bases) — but both assign canonical (repo,path)
        # order per batch; with 3 ordered batches over the ordered
        # corpus, global ids coincide
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert list(a["score"]) == list(b["score"])


def test_incremental_restart_resumes(spark, stream_corpus, tmp_path_factory):
    """Second availableNow run over the same checkpoint indexes nothing
    new (offsets persisted) — the topic checkpoint contract."""
    from lucene_solr_spark.indexing.manifest import ManifestStore
    from lucene_solr_spark.streaming import IncrementalIndexer

    base = tmp_path_factory.mktemp("stream_idx2")
    inc_dir = str(base / "idx")
    ckpt = str(base / "ckpt")

    idxr = IncrementalIndexer(spark, inc_dir)
    q = idxr.start(stream_corpus, ckpt, available_now=True)
    q.awaitTermination(300)
    n_seg_1 = len(ManifestStore(inc_dir).load().segments)

    q = idxr.start(stream_corpus, ckpt, available_now=True)
    q.awaitTermination(300)
    n_seg_2 = len(ManifestStore(inc_dir).load().segments)
    assert n_seg_1 == n_seg_2


def test_windowed_event_counts_batch_oracle(spark):
    """The streaming windowed agg plan, run on a batch frame, matches a
    plain groupBy oracle (and is the DuckDB-checked shape in
    entry_queries.timeseries_events)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.streaming import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(events).orderBy("window_start", "event_type").collect()
    want = (
        events.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [(r["window_start"], r["event_type"], r["cnt"]) for r in got] == [
        (r["window_start"], r["event_type"], r["cnt"]) for r in want
    ]


def test_windowed_event_counts_streaming(spark, tmp_path_factory):
    """Same agg as a real stream (availableNow over a file source) —
    results equal the batch run."""
    base = tmp_path_factory.mktemp("stream_ev")
    src = str(base / "src")
    os.makedirs(src)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    from lucene_solr_spark.streaming import windowed_event_counts

    sdf = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    out = windowed_event_counts(sdf)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("win_counts").orderBy("window_start", "event_type").collect()
    want = windowed_event_counts(events).orderBy("window_start", "event_type").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_first_seen_dedup(spark, tmp_path_factory):
    """applyInPandasWithState cross-batch dedup: keys repeated across
    micro-batches surface exactly once, with the first batch's row
    winning (maxFilesPerTrigger=1 -> one micro-batch per file)."""
    import pandas as pd

    from lucene_solr_spark.streaming import streaming_first_seen

    base = tmp_path_factory.mktemp("stateful")
    src = str(base / "src")
    os.makedirs(src)
    b0 = pd.DataFrame({"k": ["a", "b", "a"], "seq": [1, 2, 3], "v": ["a1", "b2", "a3"]})
    b1 = pd.DataFrame({"k": ["b", "c"], "seq": [4, 5], "v": ["b4", "c5"]})
    b0.to_parquet(f"{src}/b0.parquet", index=False)
    time.sleep(1.1)  # file-source ordering is by modification time
    b1.to_parquet(f"{src}/b1.parquet", index=False)

    stream = (
        spark.readStream.schema("k string, seq long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_first_seen(stream, key_col="k", order_col="seq")
    q = (
        out.writeStream.format("memory").queryName("first_seen_t")
        .option("checkpointLocation", str(base / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    assert finished, "stream did not finish within the timeout"
    rows = {
        r["k"]: (r["seq"], r["v"])
        for r in spark.sql("SELECT * FROM first_seen_t").collect()
    }
    # a: min seq within batch 0; b: batch-0 row wins over batch-1 dup;
    # c: arrives in batch 1
    assert rows == {"a": (1, "a1"), "b": (2, "b2"), "c": (5, "c5")}


def test_sessionize_streaming_matches_batch(spark, tmp_path_factory):
    """session_window sessions computed through a real stream
    (availableNow file source + watermark) equal the batch run — the
    streaming form of the events_sessionize entry."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("stream_sess")
    src = str(base / "src")
    os.makedirs(src)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    def sessions(df):
        return (
            df.groupBy("user_id",
                       F.session_window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select("user_id",
                    F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("session_start_s"),
                    "n_events", "sum_value")
        )

    # parquet reads the column as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    sdf = (spark.readStream.schema(events.schema).parquet(src)
           .withColumn("ts", F.col("ts").cast("timestamp"))
           .withWatermark("ts", "1 hour"))
    q = (
        sessions(sdf).writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish within 300s"
    got = (spark.table("sessions_stream")
           .orderBy("user_id", "session_start_s").collect())
    # batch leg sessionizes the IDENTICAL type as the stream leg
    # (TIMESTAMP, not the parquet TIMESTAMP_NTZ) so the comparison
    # holds under any session timezone
    want = (sessions(events.withColumn("ts", F.col("ts").cast("timestamp")))
            .orderBy("user_id", "session_start_s").collect())
    assert len(got) == len(want) > 0
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
