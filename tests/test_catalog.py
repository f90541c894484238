"""Snapshot-versioned catalog semantics (Iceberg shim, SURVEY.md §7.0)."""

import pytest


@pytest.mark.spark
def test_append_overwrite_snapshots(spark, tmp_catalog):
    c = tmp_catalog
    df1 = spark.range(5).withColumnRenamed("id", "k")
    df2 = spark.range(5, 8).withColumnRenamed("id", "k")
    s0 = c.append("t", df1)
    s1 = c.append("t", df2)
    assert (s0, s1) == (0, 1)
    assert c.read("t").count() == 8
    assert c.read("t", snapshot_id=0).count() == 5      # snapshot isolation
    s2 = c.overwrite("t", df2)
    assert c.read("t").count() == 3
    assert c.read("t", snapshot_id=s1).count() == 8     # history preserved
    assert c.current_snapshot_id("t") == s2


@pytest.mark.spark
def test_incremental_read(spark, tmp_catalog):
    c = tmp_catalog
    c.append("t", spark.range(3))
    c.append("t", spark.range(10, 14))
    inc = c.read_incremental("t", after_snapshot_id=0)
    assert sorted(r["id"] for r in inc.collect()) == [10, 11, 12, 13]
    assert c.read_incremental("t", after_snapshot_id=1) is None


@pytest.mark.spark
def test_merge_upsert(spark, tmp_catalog):
    c = tmp_catalog
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    c.overwrite("t", base)
    c.merge_upsert("t", upd, key="k")
    got = {r["k"]: r["v"] for r in c.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


@pytest.mark.spark
def test_bucketed_snapshot_roundtrip_and_no_exchange(spark, tmp_catalog):
    """Bucketed snapshot: values round-trip; an equi-join on the bucket
    column reads the bucketed side WITHOUT an Exchange (the fetch-join
    scale property); re-registration works after the metastore forgets."""
    from pyspark.sql import functions as F
    c = tmp_catalog
    df = spark.range(1000).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("v"))
    c.overwrite_bucketed("wg", df, "url", n_buckets=4)
    got = c.read("wg")
    assert got.count() == 1000
    assert {r["v"] for r in got.filter("url = 'http://h/3'").collect()} == {3 % 7}
    # join on url: bucketed side must not exchange (broadcast disabled so
    # the join is SMJ/SHJ and the property is visible in the plan)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = spark.range(50).select(
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"))
        plan = (probe.join(c.read("wg"), "url")
                ._jdf.queryExecution().executedPlan().toString())
        # exactly one Exchange: the probe side; the bucketed scan has none
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # metastore amnesia (fresh session analog): drop the temp table entry,
    # read() must re-register from the manifest
    tbl = c.snapshots("wg")[-1].meta["bucket"]["table"]
    spark.sql(f"DROP TABLE `{tbl}`")
    again = c.read("wg")
    assert again.count() == 1000


@pytest.mark.spark
def test_append_rows_mixes_with_spark_written_files(spark, tmp_catalog):
    """Driver-local pyarrow appends (catalog.append_rows) must read back
    bit-compatibly alongside Spark-written files of the SAME table — the
    crawl engine appends metrics/checkpoints locally while resume-era
    snapshots may hold Spark-written files (no mergeSchema: types must
    match exactly)."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    c = tmp_catalog
    # Spark-written snapshot with the engine's metric types
    # (int64 agg columns + int32 round)
    df = (spark.range(3).groupBy((F.col("id") % 2).alias("bucket"))
          .agg(F.count("*").alias("n_fetched"),
               F.sum(F.lit(1)).alias("n_ok"))
          .withColumn("round", F.lit(0)))
    c.append("m", df)
    arrow_schema = pa.schema([("bucket", pa.int64()),
                              ("n_fetched", pa.int64()),
                              ("n_ok", pa.int64()),
                              ("round", pa.int32())])
    sid = c.append_rows("m", [(7, 10, 9, 1), (8, 4, 4, 1)], arrow_schema,
                        meta={"round": 1})
    back = c.read("m")
    assert [f.dataType.simpleString() for f in back.schema.fields] == \
        ["bigint", "bigint", "bigint", "int"]
    assert back.count() == 4
    got = {r["bucket"]: (r["n_fetched"], r["n_ok"], r["round"])
           for r in back.filter(F.col("round") == 1).collect()}
    assert got == {7: (10, 9, 1), 8: (4, 4, 1)}
    # snapshot semantics intact: isolation + incremental read + meta
    assert c.read("m", snapshot_id=0).count() == 2
    inc = c.read_incremental("m", after_snapshot_id=0)
    assert inc.count() == 2
    assert c.snapshots("m")[-1].meta == {"round": 1}
    assert sid == 1
