"""Whole-stage codegen health: the hot link-canonicalization pipeline must
COMPILE, not silently fall back to interpreted mode.

Round-2 regression this guards: Catalyst pushed `url IS NOT NULL` through
the fast branch's projections, substituting the full canonicalizer tree into
the Filter condition — 1.77 MB of generated Java, past janino's hard 64 KB
method limit. Spark only logs a WARN and runs the stage interpreted, so
nothing else catches it. With ``spark.sql.codegen.fallback=false`` the
fallback becomes a hard error instead.
"""

import pytest
from pyspark.sql import functions as F

from fetcho_spark.functions.urls import canonicalize_udf, with_fast_canonical


@pytest.mark.spark
def test_link_pipeline_stays_in_codegen(spark):
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        rows = [(f"http://h{i}.example/p?a=1&amp;b=2#frag",
                 f"http://h{i}.example/") for i in range(64)]
        rows += [("../relative", "http://base.example/dir/"),
                 ("/root path", "http://base.example/")]
        df = spark.createDataFrame(rows, "href string, base string")
        canon = with_fast_canonical(df)
        fast = (canon.filter(F.col("_appl"))
                .withColumn("url", F.col("_fast_url"))
                .drop("_appl", "_fast_url"))
        slow = (canon.filter(~F.col("_appl"))
                .withColumn("url", canonicalize_udf(F.col("href"),
                                                    F.col("base")))
                .drop("_appl", "_fast_url"))
        links = (fast.unionByName(slow)
                 .filter(F.col("url").isNotNull())
                 .withColumn("host", F.lower(F.regexp_extract(
                     "url", r"^https?://([^/:?#]+)", 1))))
        # with fallback disabled, a codegen blowup raises here
        assert links.count() == 66
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)
