"""Hash parity: the pure-Python oracle must equal Spark's builtins exactly."""

import hashlib

import numpy as np
import pytest

from fetcho_spark.functions.hashing import (
    md5_hex, splitmix64, xxh64_long, xxh64_str)


def test_xxh64_known_spark_values():
    # values probed from Spark 4.1.2 F.xxhash64 (seed 42)
    assert xxh64_str("hello") == -4367754540140381902
    assert xxh64_str("http://a.example/x") == -69903476490692751
    assert xxh64_long(12345) == 8791244235932249694


def test_xxh64_long_input_paths():
    # exercise the >=32-byte block path and the 4-byte/1-byte tails
    for n in (0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100):
        s = "x" * n
        v = xxh64_str(s)
        assert isinstance(v, int)
        assert -(1 << 63) <= v < (1 << 63)


def test_md5_matches_hashlib():
    assert md5_hex("hello") == hashlib.md5(b"hello").hexdigest()


def test_splitmix64_vectorized_deterministic():
    a = np.array([1, 2, 3, 2**63], dtype=np.uint64)
    out1, out2 = splitmix64(a), splitmix64(a)
    assert (out1 == out2).all()
    assert len(set(out1.tolist())) == 4


@pytest.mark.spark
def test_xxh64_parity_random_strings(spark):
    from pyspark.sql import functions as F
    urls = [f"http://h{i}.example/p{i*7}?q={i}" for i in range(200)]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = {r["u"]: r["h"] for r in
           df.select("u", F.xxhash64("u").alias("h")).collect()}
    for u in urls:
        assert got[u] == xxh64_str(u)


@pytest.mark.spark
def test_xxh64_two_column_chain_parity(spark):
    from pyspark.sql import functions as F
    from fetcho_spark.simulator import spark_xxhash64_2
    rows = [(f"http://h{i}.example/", f"salt{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    for r in got:
        assert r["h"] == spark_xxhash64_2(r["a"], r["b"])
