"""Partitioned-bloom seen set: exactness + TTL + bloom routing."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators.seen import (
    SeenSet, _positions, _set_bits, _test_bits)

NOW = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
LATER = NOW + dt.timedelta(days=1)
TTL = NOW + dt.timedelta(days=28)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    n_bits = 1 << 16
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    _set_bits(bits, _positions(keys, 7, n_bits))
    assert _test_bits(bits, _positions(keys, 7, n_bits)).all()


def test_bloom_fpp_reasonable():
    rng = np.random.default_rng(1)
    n_bits = 1 << 17  # 10 bits/key for 10k keys, k=7 → FPP ≈ 1%
    keys = rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64)
    other = rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64)
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    _set_bits(bits, _positions(keys, 7, n_bits))
    fp = _test_bits(bits, _positions(np.setdiff1d(other, keys), 7, n_bits)).mean()
    assert fp < 0.05


def _frontier(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return df.withColumn("url_hash64", F.xxhash64("url")) \
             .withColumn("url_hash", F.unhex(F.md5("url")))


@pytest.mark.spark
def test_seen_roundtrip_and_ttl(spark, tmp_catalog):
    ss = SeenSet(tmp_catalog, n_buckets=8, bits_per_bucket=1 << 14)
    urls = [f"http://h{i}.example/p" for i in range(100)]
    # empty seen: everything passes
    f = _frontier(spark, urls)
    assert ss.filter_unseen(f, NOW).count() == 100
    # record the first 40 with a 28d TTL
    ss.record(_frontier(spark, urls[:40]), TTL)
    survived = {r["url"] for r in ss.filter_unseen(f, LATER).collect()}
    assert survived == set(urls[40:])
    # after TTL expiry everything is re-fetchable
    assert ss.filter_unseen(f, TTL + dt.timedelta(seconds=1)).count() == 100


@pytest.mark.spark
def test_seen_incremental_updates(spark, tmp_catalog):
    ss = SeenSet(tmp_catalog, n_buckets=4, bits_per_bucket=1 << 14)
    a = [f"http://a.example/{i}" for i in range(30)]
    b = [f"http://b.example/{i}" for i in range(30)]
    ss.record(_frontier(spark, a), TTL)
    ss.record(_frontier(spark, b), TTL)   # second round ORs into the blobs
    f = _frontier(spark, a + b + ["http://c.example/x"])
    out = {r["url"] for r in ss.filter_unseen(f, LATER).collect()}
    assert out == {"http://c.example/x"}
