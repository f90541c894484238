"""Stateful streaming seen-filter (applyInPandasWithState) — state must
carry across micro-batches, TTL must re-admit expired URLs, and output must
be deterministic."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from fetcho_spark.streaming.stateful import streaming_seen_filter

MENTION_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
])


def _run_stream(spark, batches, ttl_ms=1_000_000):
    """Feed each batch as one file (maxFilesPerTrigger=1 → one micro-batch
    per file), collect the memory-sink output after availableNow drains."""
    src = tempfile.mkdtemp(prefix="seenstream-src-")
    ckpt = tempfile.mkdtemp(prefix="seenstream-ckpt-")
    name = f"seen_out_{abs(hash(tuple(map(tuple, batches)))) % 10**8}"
    try:
        for i, rows in enumerate(batches):
            (spark.createDataFrame(rows, MENTION_SCHEMA)
             .coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(src, f"b{i}")))
        stream = (spark.readStream.schema(MENTION_SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/b*"))
        out = streaming_seen_filter(stream, n_buckets=4, ttl_ms=ttl_ms)
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.spark
@pytest.mark.slow
def test_seen_state_carries_across_batches(spark):
    b0 = [("http://a.example/1", 1000), ("http://a.example/2", 1000),
          ("http://a.example/1", 1001)]          # dup inside the batch
    b1 = [("http://a.example/1", 2000),          # dup across batches
          ("http://a.example/3", 2000)]
    rows = _run_stream(spark, [b0, b1])
    urls = sorted(r["url"] for r in rows)
    assert urls == ["http://a.example/1", "http://a.example/2",
                    "http://a.example/3"]
    # first occurrence won: /1 was emitted at ts 1000, not 1001/2000
    one = [r for r in rows if r["url"].endswith("/1")]
    assert len(one) == 1 and one[0]["ts_ms"] == 1000


@pytest.mark.spark
@pytest.mark.slow
def test_seen_ttl_readmits(spark):
    ttl = 500
    b0 = [("http://a.example/x", 1000)]
    b1 = [("http://a.example/x", 1200)]          # within TTL → suppressed
    b2 = [("http://a.example/x", 1600)]          # expired → re-admitted
    rows = _run_stream(spark, [b0, b1, b2], ttl_ms=ttl)
    ts = sorted(r["ts_ms"] for r in rows)
    assert ts == [1000, 1600]


TS_MENTION_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


@pytest.mark.spark
@pytest.mark.slow
def test_streaming_url_dedup_builtin(spark):
    """dropDuplicatesWithinWatermark variant of P1: in-batch and
    cross-batch dups collapse to the first arrival within the horizon."""
    import datetime as dt
    from fetcho_spark.streaming.loop import streaming_url_dedup

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    b0 = [("http://a.example/1", t(1)), ("http://a.example/2", t(2)),
          ("http://a.example/1", t(3))]
    b1 = [("http://a.example/1", t(10)), ("http://a.example/3", t(11))]
    src = tempfile.mkdtemp(prefix="dedupstream-src-")
    ckpt = tempfile.mkdtemp(prefix="dedupstream-ckpt-")
    try:
        for i, rows in enumerate([b0, b1]):
            (spark.createDataFrame(rows, TS_MENTION_SCHEMA)
             .coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(src, f"b{i}")))
        stream = (spark.readStream.schema(TS_MENTION_SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/b*"))
        out = streaming_url_dedup(stream, watermark="10 minutes")
        q = (out.writeStream.format("memory").queryName("urldedup_out")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM urldedup_out").collect()
        urls = sorted(r["url"] for r in rows)
        assert urls == ["http://a.example/1", "http://a.example/2",
                        "http://a.example/3"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
