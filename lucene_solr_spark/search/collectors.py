"""Collector analogs that bound WORK, not just results:
EarlyTerminatingSortingCollector and TimeLimitingCollector.

Reference:
- EarlyTerminatingSortingCollector (lucene/core/src/java/org/apache/
  lucene/search/EarlyTerminatingSortingCollector.java:55): when the
  index sort (IndexWriterConfig.setIndexSort:495) matches the query
  sort, stop collecting after k hits per segment — the scan terminates
  without visiting the tail.
- TimeLimitingCollector (search/TimeLimitingCollector.java): abort
  collection when a deadline passes, surfacing TimeExceededException.

Spark restatement:
- early termination == LIMIT pushdown on a physically-sorted source.
  `df.limit(k)` plans CollectLimit/LocalLimit: each task stops pulling
  rows from the parquet reader after k rows and the job reads
  partitions incrementally — the tail of a 100 TB table is never
  scanned. This is rank-correct exactly under the reference's own
  precondition (data order == sort order); we assert it from the
  caller-supplied contract the way Lucene trusts setIndexSort.
- time limiting == job-group cancellation: run the collect in a job
  group, arm a timer that cancels the group at the deadline
  (interruptOnCancel), translate the cancellation into TimeExceeded.
"""

from __future__ import annotations

import threading
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame


class TimeExceeded(Exception):
    """TimeLimitingCollector.TimeExceededException analog."""

    def __init__(self, timeout_s: float):
        super().__init__(f"query exceeded time limit of {timeout_s}s")
        self.timeout_s = timeout_s


def early_terminating_topk(df: DataFrame, sort_cols: Sequence[str], k: int,
                           presorted: bool = False) -> DataFrame:
    """Top-k by sort_cols. With presorted=True (caller asserts the
    source's physical order IS sort_cols, e.g. a time-ordered event
    log) the plan is a bare LIMIT — scan stops after k rows, no Sort,
    no TakeOrdered heap, no full-table read. Otherwise falls back to
    the always-correct TakeOrderedAndProject.

    presorted contract, precisely: row order as SCANNED must equal
    sort_cols order. Spark schedules parquet splits largest-first, so
    this holds for a single ordered file (or any source whose split
    order is the sort order) — NOT for a multi-file sorted table. For
    the engine's own multi-file segment indexes use
    IndexReader.sorted_head, which gets early termination from a
    pushed-down doc_id range predicate instead of scan order.

    The single-split precondition is cheaply checkable, so it is
    ENFORCED rather than trusted: a presorted source that plans more
    than one partition falls back to the always-correct TakeOrdered
    path (silently-wrong rank order is worse than a Sort)."""
    if presorted and df.rdd.getNumPartitions() <= 1:
        return df.limit(k)
    return df.orderBy(*sort_cols).limit(k)


def collect_with_timeout(df: DataFrame, timeout_s: float) -> List:
    """collect() bounded by a wall-clock deadline. Cancels the Spark
    job group at the deadline (tasks get interrupted, not just
    orphaned) and raises TimeExceeded. Mirrors the non-greedy
    TimeLimitingCollector: no partial results on timeout."""
    sc = df.sparkSession.sparkContext
    group = f"time-limited-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "TimeLimitingCollector analog",
                   interruptOnCancel=True)
    fired = threading.Event()
    done = threading.Event()

    def cancel():
        # a single cancelJobGroup races job SUBMISSION: a deadline that
        # fires during query planning (before the first job registers)
        # would cancel nothing and the job would then run to completion
        # ("Cannot find active jobs for it"). Keep re-cancelling until
        # the collect returns, so late-starting jobs die too.
        fired.set()
        while not done.is_set():
            try:
                sc.cancelJobGroup(group)
            except Exception:
                pass
            done.wait(0.25)

    timer = threading.Timer(timeout_s, cancel)
    timer.start()
    try:
        rows = df.collect()
        if fired.is_set():
            # cancellation raced a finished job: honor the deadline
            raise TimeExceeded(timeout_s)
        return rows
    except TimeExceeded:
        raise
    except Exception as exc:
        if fired.is_set():
            raise TimeExceeded(timeout_s) from exc
        raise
    finally:
        done.set()
        timer.cancel()
        sc.setLocalProperty("spark.jobGroup.id", None)
