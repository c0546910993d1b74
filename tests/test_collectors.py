"""EarlyTerminating + TimeLimiting collector analogs."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_early_terminating_matches_full_sort(spark, events):
    from lucene_solr_spark.search.collectors import early_terminating_topk

    fast = early_terminating_topk(events, ["ts"], 50, presorted=True)
    slow = early_terminating_topk(events, ["ts"], 50, presorted=False)
    assert {r["event_id"] for r in fast.collect()} == {
        r["event_id"] for r in slow.collect()}


def test_early_terminating_plan_has_no_sort(spark, events):
    from lucene_solr_spark.search.collectors import early_terminating_topk

    plan = early_terminating_topk(events, ["ts"], 50, presorted=True)._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    assert "Sort" not in plan and "TakeOrdered" not in plan
    full = early_terminating_topk(events, ["ts"], 50, presorted=False)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in full


def test_time_limit_cancels_slow_job(spark):
    from lucene_solr_spark.search.collectors import TimeExceeded, collect_with_timeout

    sleep_udf = F.udf(lambda x: (time.sleep(0.05), x)[1], "long")
    slow = (
        spark.range(0, 10000, 1, 1)
        .select(sleep_udf(F.col("id")).alias("v"))
        .agg(F.sum("v"))
    )
    t0 = time.monotonic()
    with pytest.raises(TimeExceeded):
        collect_with_timeout(slow, 0.5)
    # must abort near the deadline, not after the ~500 s the job needs
    assert time.monotonic() - t0 < 30


def test_time_limit_passthrough_when_fast(spark, events):
    from lucene_solr_spark.search.collectors import collect_with_timeout

    rows = collect_with_timeout(events.limit(5), 60.0)
    assert len(rows) == 5
