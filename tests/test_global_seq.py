"""with_global_seq: scale-safe global fetch ordering (crawl.py O-order).

The round-1 plan ranked the selected set through ONE task
(Window.orderBy with no partitionBy). The replacement range-partitions on
the total sort key and adds partition offsets; these tests pin (a) exact
equivalence to the global row_number, (b) invariance to shuffle-partition
count, (c) that the plan really range-partitions the data (no
single-partition sort of the dataset).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from fetcho_spark.operators.priority import with_global_seq


def _df(spark, n=5000):
    # skewed priorities (many ties) + unique urls → total key
    return (spark.range(n)
            .select(F.pmod(F.xxhash64("id"), F.lit(7)).alias("priority"),
                    F.xxhash64("id", F.lit("u")).alias("url_hash64"),
                    F.concat(F.lit("http://h.ex/p"),
                             F.col("id")).alias("url")))


@pytest.mark.spark
def test_matches_global_row_number(spark):
    df = _df(spark)
    got = {r["url"]: r["fetch_seq"] for r in with_global_seq(df).collect()}
    w = Window.orderBy("priority", "url_hash64", "url")
    want = {r["url"]: r["seq"] for r in
            df.withColumn("seq", F.row_number().over(w) - 1).collect()}
    assert got == want


@pytest.mark.spark
def test_invariant_to_shuffle_partitions(spark):
    df = _df(spark, 3000)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {r["url"]: r["fetch_seq"] for r in with_global_seq(df).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {r["url"]: r["fetch_seq"] for r in with_global_seq(df).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


@pytest.mark.spark
def test_plan_range_partitions_the_data(spark):
    # un-pinned plan exposes the shuffle shape for assertion
    plan = with_global_seq(_df(spark), pin_partitioning=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(priority" in plan
    # the data-bearing window partitions by _pid, not SinglePartition; the
    # only single-partition exchange feeds the ≤#partitions-row offsets agg
    assert "Window [row_number()" in plan
    assert "[_pid" in plan
    # the production default PINS the ranged frame (LogicalRDD scan): both
    # _pid consumers are guaranteed one physical partitioning under AQE
    pinned = with_global_seq(_df(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ExistingRDD" in pinned
    assert "Window [row_number()" in pinned
