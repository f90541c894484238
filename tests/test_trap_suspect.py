"""Spider-trap marking (frontier.trap_suspect): deep paths, segment
loops, query-parameter explosions — marked, never removed."""

import pytest

from fetcho_spark.operators.frontier import trap_suspect

CASES = [
    # (path, query, deep, loop, params)
    ("/a/b/c", "x=1&y=2", False, False, False),
    ("/" + "/".join(f"s{i}" for i in range(17)), None, True, False, False),
    ("/a/b/a/b/a/c", "", False, True, False),          # 'a' and 'b' x3
    ("/p", "&".join(f"k{i}={i}" for i in range(13)), False, False, True),
    ("/a/a", None, False, False, False),               # 2 repeats: below bar
    ("", None, False, False, False),                   # root: depth 0
    ("/x//y///x//x", "", False, True, False),          # empty segs dropped
]


@pytest.mark.spark
def test_trap_rules_fire_independently(spark):
    df = spark.createDataFrame(
        [(i, p, q) for i, (p, q, *_rest) in enumerate(CASES)],
        "id int, path string, query string")
    got = {r["id"]: r for r in trap_suspect(df).collect()}
    for i, (p, q, deep, loop, params) in enumerate(CASES):
        r = got[i]
        assert r["trap_deep"] == deep, (i, "deep")
        assert r["trap_loop"] == loop, (i, "loop")
        assert r["trap_params"] == params, (i, "params")
        assert r["trap"] == (deep or loop or params), i
    # marked, never removed
    assert len(got) == len(CASES)
    # arithmetic columns
    assert got[0]["depth"] == 3 and got[0]["n_params"] == 2
    assert got[2]["max_seg_repeat"] == 3
    assert got[4]["max_seg_repeat"] == 2
    assert got[5]["depth"] == 0 and got[5]["max_seg_repeat"] == 0
    assert got[6]["depth"] == 4 and got[6]["max_seg_repeat"] == 3


@pytest.mark.spark
def test_trap_thresholds_configurable(spark):
    df = spark.createDataFrame([("/a/b/a",)], "path string") \
        .withColumn("query", __import__("pyspark.sql.functions",
                                        fromlist=["lit"]).lit(None)
                    .cast("string"))
    assert not trap_suspect(df).collect()[0]["trap"]
    assert trap_suspect(df, max_seg_repeat=2).collect()[0]["trap"]
    assert trap_suspect(df, max_depth=2).collect()[0]["trap"]


# ------------------------------------------------ tracking-param stripping

TRACK_CASES = [
    ("https://h/p?id=3&utm_source=x&keep=1", "https://h/p?id=3&keep=1"),
    ("https://h/p?utm_source=x&UTM_Medium=y", "https://h/p"),  # ? dropped
    ("https://h/p?fbclid=abc&GCLID=z&a=1", "https://h/p?a=1"),
    ("https://h/p", "https://h/p"),                            # no query
    ("https://h/p?a=1&b=2", "https://h/p?a=1&b=2"),            # untouched
    ("https://h/p?a=utm_source", "https://h/p?a=utm_source"),  # value, not key
    ("https://h/p?utm=1", "https://h/p?utm=1"),                # not utm_*
    ("https://h/p?", "https://h/p"),                           # bare ?
]


@pytest.mark.spark
def test_strip_tracking_params(spark):
    from pyspark.sql import functions as F
    from fetcho_spark.functions.urls import strip_tracking_params
    df = spark.createDataFrame([(u,) for u, _ in TRACK_CASES],
                               "url string")
    got = [r["c"] for r in
           df.select(strip_tracking_params(F.col("url")).alias("c"))
           .collect()]
    assert got == [want for _, want in TRACK_CASES]
    # idempotent: cleaned output is a fixed point
    df2 = spark.createDataFrame([(c,) for c in got], "url string")
    again = [r["c"] for r in
             df2.select(strip_tracking_params(F.col("url")).alias("c"))
             .collect()]
    assert again == got
