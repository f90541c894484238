"""TF-IDF ranked retrieval vs a dict reference."""

import re
from collections import Counter

import pytest

from fetcho_spark.operators.invindex import rank_docs

DOCS = [
    (0, "spark spark spark engine"),          # high tf on the rare term
    (1, "spark engine engine engine"),
    (2, "engine engine engine engine"),
    (3, "unrelated words entirely here"),
    (4, "spark engine mixed content here"),
]
QUERY = ["spark", "engine"]


def _ref(docs, terms, q=10**6):
    n = len(docs)
    tf = {}
    for d, t in docs:
        c = Counter(w for w in re.split(r"[^a-z0-9]+", t.lower())
                    if len(w) >= 3 and w in terms)
        for w, k in c.items():
            tf[(w, d)] = k
    df = Counter(w for w, _ in tf)
    scores = Counter()
    for (w, d), k in tf.items():
        scores[d] += k * ((q * n) // df[w])
    return scores


@pytest.mark.spark
def test_rank_docs_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = [(r["doc_id"], r["score_q"])
           for r in rank_docs(df, QUERY, top_k=10).collect()]
    ref = _ref(DOCS, set(QUERY))
    assert dict(got) == dict(ref)
    # descending score, key tiebreak; doc 3 (no query terms) absent
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))
    assert 3 not in dict(got)
    # rarer term dominates: doc 0 (3x spark) outranks doc 2 (4x engine)
    assert dict(got)[0] > dict(got)[2]


@pytest.mark.spark
def test_rank_docs_top_k_cut(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert len(rank_docs(df, QUERY, top_k=2).collect()) == 2
