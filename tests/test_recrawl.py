"""Adaptive recrawl scheduling from 304/200 revalidation history."""

import pytest

from fetcho_spark.operators.recrawl import due_urls, recrawl_schedule

HIST = [
    # hot page: changed on every revisit -> gap 1
    *[("hot", r, True) for r in range(5)],
    # slow page: changed once in 6 -> gap 6
    *[("slow", r, r == 2) for r in range(6)],
    # frozen page: never changed -> gap = max_gap
    *[("frozen", r, False) for r in range(4)],
    # half: 2 changes in 5 -> gap 2 (floor 5/2)
    ("half", 0, True), ("half", 1, False), ("half", 2, True),
    ("half", 3, False), ("half", 7, False),
]


@pytest.mark.spark
def test_schedule_gaps_and_next_due(spark):
    df = spark.createDataFrame(HIST, "url string, round int, changed boolean")
    got = {r["url"]: r for r in recrawl_schedule(df, max_gap=16).collect()}
    assert (got["hot"]["gap"], got["hot"]["next_due"]) == (1, 5)
    assert (got["slow"]["gap"], got["slow"]["next_due"]) == (6, 11)
    assert (got["frozen"]["gap"], got["frozen"]["next_due"]) == (16, 19)
    assert (got["half"]["gap"], got["half"]["next_due"]) == (2, 9)
    assert got["half"]["n_obs"] == 5 and got["half"]["n_changed"] == 2
    # partition invariance
    got7 = {r["url"]: tuple(r) for r in
            recrawl_schedule(df.repartition(7), max_gap=16).collect()}
    assert got7 == {k: tuple(v) for k, v in got.items()}


@pytest.mark.spark
def test_due_urls_filter(spark):
    df = spark.createDataFrame(HIST, "url string, round int, changed boolean")
    sched = recrawl_schedule(df, max_gap=16)
    due = {r["url"] for r in due_urls(sched, 11).collect()}
    assert due == {"hot", "slow", "half"}       # frozen waits until 19
    assert {r["url"] for r in due_urls(sched, 4).collect()} == set()
