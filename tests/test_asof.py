"""As-of join (operators/asof.py): cross-checked against pandas
merge_asof (an independent implementation), strict/forward/tolerance
semantics, tie determinism, group isolation, partition invariance,
single-shuffle plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators.asof import asof_join

pytestmark = [pytest.mark.spark]

LEFT = [(k, t, f"L{k}-{t}") for k in (1, 2) for t in (5, 10, 20, 35)]
RIGHT = [(1, 3, 100.0), (1, 10, 110.0), (1, 22, 120.0),
         (2, 7, 200.0), (2, 30, 210.0), (3, 1, 300.0)]


def _frames(spark, parts=3):
    l = spark.createDataFrame(LEFT, "user_id long, ts long, tag string") \
        .repartition(parts)
    r = spark.createDataFrame(RIGHT, "user_id long, ts long, value double") \
        .repartition(parts)
    return l, r


def _pandas_asof(direction="backward", strict=False, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["user_id", "ts", "tag"]) \
        .sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["user_id", "ts", "value"]) \
        .sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="user_id",
                      direction=direction, suffixes=("", "_r"),
                      allow_exact_matches=not strict,
                      tolerance=tolerance)
    return {(r.user_id, r.ts): (None if pd.isna(r.value) else r.value)
            for r in m.itertuples()}


def _spark_asof(spark, **kw):
    l, r = _frames(spark)
    got = asof_join(l, r, on="ts", by="user_id",
                    right_cols=["value"], **kw).collect()
    return {(r["user_id"], r["ts"]): r["value_r"] for r in got}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_matches_pandas_merge_asof(spark, direction, strict):
    assert _spark_asof(spark, direction=direction, strict=strict) == \
        _pandas_asof(direction=direction, strict=strict)


def test_tolerance(spark):
    assert _spark_asof(spark, tolerance=5) == _pandas_asof(tolerance=5)
    # matched `on` is nulled together with the payload
    l, r = _frames(spark)
    row = {(x["user_id"], x["ts"]): x["ts_r"]
           for x in asof_join(l, r, right_cols=["value"],
                              tolerance=5).collect()}
    assert row[(1, 35)] is None   # nearest error at 22, gap 13 > 5
    assert row[(1, 10)] == 10


def test_right_ties_break_on_tiebreak(spark):
    l = spark.createDataFrame([(1, 10)], "user_id long, ts long")
    r = spark.createDataFrame([(1, 10, 7, 1.0), (1, 10, 9, 2.0),
                               (1, 10, 8, 3.0)],
                              "user_id long, ts long, eid long, v double")
    got = asof_join(l, r, right_cols=["v"], right_tiebreak="eid").head()
    assert got["v_r"] == 2.0  # largest tiebreak (eid 9) wins


def test_group_isolation_and_unmatched(spark):
    got = _spark_asof(spark)
    assert got[(2, 5)] is None          # user 2 has no error <= 5
    assert got[(2, 10)] == 200.0        # never user 1's rows
    assert got[(1, 5)] == 100.0


def test_partition_invariance(spark):
    l, r = _frames(spark, parts=1)
    a = sorted(tuple(x) for x in asof_join(
        l, r, right_cols=["value"]).collect())
    l2, r2 = _frames(spark, parts=11)
    b = sorted(tuple(x) for x in asof_join(
        l2, r2, right_cols=["value"]).collect())
    assert a == b


def _brute_interval(lower, upper):
    out = set()
    for (lk, lt, tag) in LEFT:
        for (rk, rt, v) in RIGHT:
            if lk == rk and lt + lower <= rt <= lt + upper:
                out.add((lk, lt, rt, v))
    return out


@pytest.mark.parametrize("lower,upper", [(-5, 5), (0, 10), (-100, 0)])
@pytest.mark.parametrize("bucket", [None, 3, 1000])
def test_interval_join_equals_brute_force(spark, lower, upper, bucket):
    from fetcho_spark.operators.asof import interval_join
    l, r = _frames(spark)
    got = {(x["user_id"], x["ts"], x["ts_r"], x["value_r"])
           for x in interval_join(l, r, lower=lower, upper=upper,
                                  right_cols=["value"],
                                  bucket=bucket).collect()}
    assert got == _brute_interval(lower, upper)


def test_interval_join_pairs_unique_and_bounds_inclusive(spark):
    from fetcho_spark.operators.asof import interval_join
    l = spark.createDataFrame([(1, 10)], "user_id long, ts long")
    r = spark.createDataFrame([(1, 5, 1.0), (1, 15, 2.0), (1, 16, 3.0),
                               (1, 4, 4.0)],
                              "user_id long, ts long, v double")
    rows = interval_join(l, r, lower=-5, upper=5, right_cols=["v"],
                         bucket=2).collect()
    assert sorted(x["v_r"] for x in rows) == [1.0, 2.0]  # 4 and 16 excluded
    assert len(rows) == len({(x["ts"], x["ts_r"]) for x in rows})


def test_interval_join_plan_no_cartesian(spark):
    from fetcho_spark.operators.asof import interval_join
    l, r = _frames(spark)
    plan = interval_join(l, r, right_cols=["value"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_single_shuffle_plan(spark):
    l, r = _frames(spark)
    plan = asof_join(l, r, right_cols=["value"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_null_right_payload_rides_through(spark):
    """Whole-row semantics (ADVICE r5): a matched right row whose payload
    value is genuinely NULL must surface as NULL — never back-filled from
    an OLDER right row. Cross-checked against pandas merge_asof."""
    l = spark.createDataFrame([(1, 20), (1, 12)], "user_id long, ts long")
    r = spark.createDataFrame(
        [(1, 10, 9, 1.0), (1, 15, 11, None)],
        "user_id long, ts long, eid long, value double")
    got = {x["ts"]: (x["eid_r"], x["value_r"])
           for x in asof_join(l, r, right_cols=["eid", "value"]).collect()}
    # ts=20 matches the ts=15 row WHOLE: eid 11 with its NULL value
    assert got[20] == (11, None)
    assert got[12] == (9, 1.0)
    lp = pd.DataFrame({"user_id": [1, 1], "ts": [12, 20]})
    rp = pd.DataFrame({"user_id": [1, 1], "ts": [10, 15],
                       "eid": [9, 11], "value": [1.0, None]})
    m = pd.merge_asof(lp.sort_values("ts"), rp.sort_values("ts"),
                      on="ts", by="user_id", suffixes=("", "_r"))
    want = {int(r.ts): (int(r.eid), None if pd.isna(r.value) else r.value)
            for r in m.itertuples()}
    assert got == want


def test_null_payload_tolerance_nulls_whole_row(spark):
    """The tolerance cut keys off the matched row's own ts: a stale
    older value must not survive through a NULL-payload nearer match."""
    l = spark.createDataFrame([(1, 100)], "user_id long, ts long")
    r = spark.createDataFrame([(1, 10, 1.0), (1, 99, None)],
                              "user_id long, ts long, value double")
    row = asof_join(l, r, right_cols=["value"], tolerance=5).head()
    assert row["ts_r"] == 99 and row["value_r"] is None


def test_guards(spark):
    from fetcho_spark.operators.asof import interval_join
    l, r = _frames(spark)
    with pytest.raises(AssertionError):
        interval_join(l, r, right_cols=["value"], bucket=0)
    with pytest.raises(AssertionError):
        asof_join(l.withColumn("_side", F.lit(1)), r,
                  right_cols=["value"])
