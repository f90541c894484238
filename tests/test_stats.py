"""Exact quantiles + deterministic histogram."""

import math

import pytest

from fetcho_spark.operators.stats import exact_quantiles, histogram

VALS = [7.5, -2.0, 3.25, 3.25, 11.0, 0.5, 99.0, 3.25, -8.75, 42.0]
ROWS = [(i, v) for i, v in enumerate(VALS)]


def _ref_quantile(vals, pct):
    s = sorted(vals)
    return s[(pct * (len(s) - 1)) // 100]     # 1-based rank -> 0-based idx


@pytest.mark.spark
def test_exact_quantiles_matches_reference(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    got = {r["pct"]: r["value"]
           for r in exact_quantiles(df, "value", "event_id").collect()}
    for pct in (25, 50, 75, 90, 99):
        assert got[pct] == _ref_quantile(VALS, pct), pct
    # duplicates: the median falls inside the 3.25 run
    assert got[50] == 3.25


@pytest.mark.spark
def test_exact_quantiles_partition_invariant(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    base = sorted(map(tuple,
                      exact_quantiles(df, "value", "event_id").collect()))
    rep = sorted(map(tuple,
                     exact_quantiles(df.repartition(7), "value",
                                     "event_id").collect()))
    assert base == rep


@pytest.mark.spark
def test_histogram_bins_and_overflow(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    got = {r["bin"]: r["n"]
           for r in histogram(df, "value", 0.0, 10.0, 5).collect()}
    ref = {}
    for v in VALS:
        b = min(max(math.floor((v - 0.0) / 2.0), -1), 5)
        ref[b] = ref.get(b, 0) + 1
    assert got == ref
    assert got[-1] == 2 and got[5] == 3       # under/overflow populated
    assert sum(got.values()) == len(VALS)
