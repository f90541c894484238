"""Unicode NFC normalization (functions/text.nfc_normalize): parity with
CPython unicodedata through the Spark operator, idempotence, null/empty
survival, form options, Arrow (not row-wise) plan."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from fetcho_spark.functions.text import nfc_normalize

pytestmark = [pytest.mark.spark]

CASES = [
    "e" + chr(0x301),                    # composes
    chr(0xE9),                           # already composed
    chr(0x1100) + chr(0x1161),           # Hangul LV
    chr(0x212B),                         # angstrom -> A-ring
    chr(0x0915) + chr(0x093C),           # composition exclusion
    "a" + chr(0x300) + chr(0x316),       # combining reorder (ccc)
    chr(0xFB01),                         # fi ligature (NFKC-only)
    chr(0xFF21),                         # fullwidth A (NFKC-only)
    "plain ascii text",
    "",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)] + [(len(CASES), None)],
        "i long, s string")


@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_matches_unicodedata(spark, form):
    got = {r["i"]: r["n"]
           for r in _df(spark).select(
               "i", nfc_normalize(F.col("s"), form).alias("n")).collect()}
    for i, s in enumerate(CASES):
        assert got[i] == unicodedata.normalize(form, s)
    assert got[len(CASES)] is None
    if form == "NFKC":  # compatibility points actually changed
        assert got[6] == "fi" and got[7] == "A"


def test_idempotent_fixed_point(spark):
    df = _df(spark).select("i", nfc_normalize(F.col("s")).alias("n"))
    twice = df.select("i", nfc_normalize(F.col("n")).alias("n2"), "n")
    for r in twice.collect():
        assert r["n2"] == r["n"]


def test_bad_form_raises(spark):
    with pytest.raises(AssertionError):
        nfc_normalize(F.col("s"), "NFX")


def test_plan_is_arrow_batched(spark):
    plan = _df(spark).select(nfc_normalize(F.col("s"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # never the row-wise path
