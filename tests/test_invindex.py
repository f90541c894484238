"""Blocked inverted index vs a dict-arithmetic reference."""

import re
from collections import Counter, defaultdict

import pytest

from fetcho_spark.operators.invindex import inverted_index, postings_str

DOCS = [
    (0, "spark index spark QUERY"),
    (1, "index of the spark engine"),
    (5, "query engine query engine query"),
    (1030, "spark far away block"),       # lands in block 1 at size 1024
    (2060, "spark block two"),
]


def _ref(docs, min_len=3, block=1024):
    inv = defaultdict(Counter)
    for d, t in docs:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if len(w) >= min_len:
                inv[w][d] += 1
    rows = {}
    for term, c in inv.items():
        for d, tf in c.items():
            rows.setdefault((term, d // block), []).append((d, tf))
    out = {}
    for (term, b), ps in rows.items():
        out[(term, b)] = (sorted(ps), len(ps), len(inv[term]))
    return out


@pytest.mark.spark
def test_inverted_index_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {(r["term"], r["block_id"]):
           ([(p["doc_id"], p["tf"]) for p in r["postings"]],
            r["block_df"], r["df"])
           for r in inverted_index(df).collect()}
    assert got == _ref(DOCS)
    # blocking: 'spark' spans three blocks, df counts across all of them
    assert got[("spark", 0)][2] == 4
    assert {b for t, b in got if t == "spark"} == {0, 1, 2}
    # tf inside postings; min_len drops 'of'
    assert got[("query", 0)][0] == [(0, 1), (5, 3)]
    assert not any(t == "of" for t, _ in got)


@pytest.mark.spark
def test_postings_str_and_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = (inverted_index(df).withColumn("p", postings_str())
           .select("term", "block_id", "p", "block_df", "df"))
    base = sorted(map(tuple, out.collect()))
    s = {(r[0], r[1]): r[2] for r in base}
    assert s[("query", 0)] == "0:1 5:3"
    df2 = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(7)
    rep = sorted(map(tuple,
                     inverted_index(df2).withColumn("p", postings_str())
                     .select("term", "block_id", "p", "block_df", "df")
                     .collect()))
    assert base == rep
