"""Line-granular cleaning: cross-doc line dedup + C4 filters."""

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators.lines import c4_filter, line_dedup

FOOTER = "All rights reserved."
DOCS = [
    (0, "Unique opening line one.\n" + FOOTER + "\nAnother unique line."),
    (1, "Second document first line.\n" + FOOTER),
    (2, "  all rights reserved.  \nOnly survivor here."),   # case/trim fold
    (3, "\n\n\n"),                                          # all blank
    (4, "Repeated inside only.\nRepeated inside only.\nTail."),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.spark
def test_line_dedup_removes_cross_doc_boilerplate(docs):
    out = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    assert out[0]["text"] == "Unique opening line one.\nAnother unique line."
    assert out[0]["n_removed"] == 1 and out[0]["n_lines"] == 3
    assert out[1]["text"] == "Second document first line."
    # normalization: trim + case-fold joins doc 2's variant to the footer
    assert out[2]["text"] == "Only survivor here."
    # all-blank doc survives as an empty row, not a missing row
    assert out[3]["text"] == "" and out[3]["n_lines"] == 0
    # document frequency, not occurrence count: in-doc repetition alone
    # never makes a line boilerplate
    assert out[4]["n_removed"] == 0
    assert out[4]["text"].count("Repeated inside only.") == 2


@pytest.mark.spark
def test_line_dedup_threshold_and_partition_invariance(docs):
    assert all(r["n_removed"] == 0
               for r in line_dedup(docs, min_df=4).collect())
    base = sorted(map(tuple, line_dedup(docs, min_df=2).collect()))
    rep = sorted(map(tuple, line_dedup(docs.repartition(7),
                                       min_df=2).collect()))
    assert base == rep


C4_DOCS = [
    (0, "This sentence properly ends.\nShort one.\nAnd here is another "
        "full sentence!\nIs this a question?\nno terminal punctuation"),
    (1, "Please enable JavaScript to view this page.\nReal sentence "
        "number one.\nReal sentence number two.\nReal sentence three."),
    (2, "Contains lorem ipsum dolor sit amet.\nA fine sentence here.\n"
        "Another fine sentence here.\nThird fine sentence here."),
    (3, "var x = { a: 1 };\nGood sentence one stays.\nGood sentence two "
        "stays.\nGood sentence three stays."),
    (4, "Only two good sentences here.\nSo the document is dropped."),
]


@pytest.mark.spark
def test_c4_filter_line_rules(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_filter(df).collect()}
    # doc 0: "Short one." has < 3 words; bare line lacks punctuation
    assert out[0]["text"].splitlines() == [
        "This sentence properly ends.",
        "And here is another full sentence!",
        "Is this a question?"]
    assert out[0]["n_kept"] == 3 and out[0]["n_dropped"] == 2
    assert out[0]["keep_doc"]
    # javascript line dropped, doc survives on its three real sentences
    assert "JavaScript" not in out[1]["text"] and out[1]["keep_doc"]
    # lorem ipsum / brace kill the whole document regardless of lines
    assert not out[2]["keep_doc"]
    assert not out[3]["keep_doc"]
    # fewer than 3 kept sentences -> dropped
    assert out[4]["n_kept"] == 2 and not out[4]["keep_doc"]


@pytest.mark.spark
def test_c4_then_line_dedup_compose(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    kept = c4_filter(df).filter(F.col("keep_doc")).select("doc_id", "text")
    out = line_dedup(kept, min_df=2).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
