"""Hashed TF-IDF (operators/vectorize.py): dict-arithmetic reference
parity, shared-tokenizer/bucket idioms, empty docs, normalization
bounds, partition invariance, downstream embedding-op compatibility."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators.vectorize import SCALE, hashed_tfidf

pytestmark = [pytest.mark.spark]

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog ate the cat food"),
    (2, "spark shuffles the big table"),
    (3, ""),                      # tokenless
    (4, "cat cat cat"),           # heavy tf
    (5, "MAT! mat? m-a-t"),       # tokenizer: lowercase, [a-z0-9]+ split
]
DIM = 32


def _bucket(word):
    return int(hashlib.md5(word.encode()).hexdigest()[:12], 16) % DIM


def _ref():
    toks = {i: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for i, t in DOCS}
    n = len(DOCS)
    tf = {}
    for i, ws in toks.items():
        for w in ws:
            b = _bucket(w)
            tf[(i, b)] = tf.get((i, b), 0) + 1
    dfb = {}
    for (_i, b) in tf:
        dfb[b] = dfb.get(b, 0) + 1
    out = {}
    for i, _t in DOCS:
        raw = [0] * DIM
        for b in range(DIM):
            if (i, b) in tf:
                raw[b] = tf[(i, b)] * ((SCALE * n) // dfb[b])
        m = max(raw)
        out[i] = (raw, [x / m if m else 0.0 for x in raw])
    return out


def _df(spark, parts=3):
    return spark.createDataFrame(DOCS, "doc_id long, text string") \
        .repartition(parts)


def test_matches_reference(spark):
    got = {r["doc_id"]: (list(r["vec_raw"]), list(r["vec"]))
           for r in hashed_tfidf(_df(spark), dim=DIM).collect()}
    ref = _ref()
    assert got == ref
    assert len(got) == len(DOCS)          # tokenless doc kept
    assert got[3] == ([0] * DIM, [0.0] * DIM)
    # normalized components live in [0, 1] with max exactly 1
    for i in (0, 1, 2, 4, 5):
        assert max(got[i][1]) == 1.0
        assert all(0.0 <= x <= 1.0 for x in got[i][1])


def test_partition_invariance(spark):
    a = sorted((r["doc_id"], tuple(r["vec_raw"]))
               for r in hashed_tfidf(_df(spark, 1), dim=DIM).collect())
    b = sorted((r["doc_id"], tuple(r["vec_raw"]))
               for r in hashed_tfidf(_df(spark, 9), dim=DIM).collect())
    assert a == b


def test_feeds_embedding_operators(spark):
    """The bridge claim: the normalized vectors run through the
    embedding-side toolchain (quantized k-means + PQ) unchanged."""
    from fetcho_spark.operators.pq import pq_topk, pq_train
    from fetcho_spark.operators.semdedup import kmeans_fit
    vecs = hashed_tfidf(_df(spark), dim=DIM) \
        .select(F.col("doc_id").alias("vec_id"),
                F.col("vec").alias("embedding"))
    cents = kmeans_fit(vecs, k=2, iters=1)
    assert len(cents) == 2 and len(cents[0]) == DIM
    books = pq_train(vecs, DIM, m=4, ksub=2, iters=1)
    top = pq_topk(vecs, books, [0.5] * DIM, k=3).collect()
    assert len(top) == 3


def test_plan_is_jvm_only(spark):
    plan = hashed_tfidf(_df(spark), dim=DIM) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
