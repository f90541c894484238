"""DSIR-style hashed n-gram importance selection (Xie et al. 2023 shape,
quantized ratio weights — see operators/dsir.py docstring for the
engine-exactness substitution)."""

import hashlib
import math
import re

import pytest

from fetcho_spark.operators.dsir import (dsir_score, dsir_select,
                                         dsir_weights, hashed_ngram_counts)

B = 64
SCALE = 1_000_000

TARGET = ["clean prose about science and method",
          "careful measured prose about evidence"]
RAW = TARGET + ["buy now click here casino bonus",
                "casino casino bonus click",
                "prose about science method and evidence studies",
                "zz9"]


def _grams(t):
    w = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
    return w + [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]


def _bucket(g, n=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % n


def _counts(texts, n=B):
    c = {}
    for t in texts:
        for g in _grams(t):
            b = _bucket(g, n)
            c[b] = c.get(b, 0) + 1
    return c


def _ref_weights(target, raw, n=B):
    ct, cr = _counts(target, n), _counts(raw, n)
    zt, zr = sum(ct.values()), sum(cr.values())
    return {b: math.floor(float((ct.get(b, 0) + 1) * (zr + n)) * SCALE
                          / float((cr.get(b, 0) + 1) * (zt + n)))
            for b in set(ct) | set(cr)}


def _ref_scores(raw, w, n=B):
    return {i: sum(w.get(_bucket(g, n), 0) for g in _grams(t))
            for i, t in enumerate(raw)}


@pytest.mark.spark
def test_weights_match_reference(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    raw = spark.createDataFrame([(t,) for t in RAW], ["text"])
    got = {r["bucket"]: r["weight_q"]
           for r in dsir_weights(tgt, raw, n_buckets=B).collect()}
    assert got == _ref_weights(TARGET, RAW)
    # bucket count tables are bounded and exact
    cnt = {r["bucket"]: r["n"]
           for r in hashed_ngram_counts(raw, n_buckets=B).collect()}
    assert cnt == _counts(RAW)


@pytest.mark.spark
def test_scores_match_reference_and_rank_target_like_first(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    raw = spark.createDataFrame(list(enumerate(RAW)), ["doc_id", "text"])
    w = dsir_weights(tgt, raw, n_buckets=B)
    got = {r["doc_id"]: r["score_q"]
           for r in dsir_score(raw, w, n_buckets=B).collect()}
    ref = _ref_scores(RAW, _ref_weights(TARGET, RAW))
    assert got == ref
    # per-gram normalization: target members and the near-target doc (4)
    # out-rank the spam docs per gram instance
    per_gram = {i: got[i] / max(len(_grams(t)), 1)
                for i, t in enumerate(RAW)}
    assert min(per_gram[0], per_gram[1], per_gram[4]) \
        > max(per_gram[2], per_gram[3])


@pytest.mark.spark
def test_select_keep_frac_and_partition_invariance(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    raw = spark.createDataFrame(list(enumerate(RAW)), ["doc_id", "text"])
    marked = dsir_select(raw, tgt, keep_frac=0.5, n_buckets=B)
    rows = {r["doc_id"]: (r["score_q"], r["keep"])
            for r in marked.collect()}
    assert len(rows) == len(RAW)
    assert sum(1 for _, k in rows.values() if k) == len(RAW) // 2
    # kept set = top half by (score desc, id)
    order = sorted(rows, key=lambda i: (-rows[i][0], i))
    assert {i for i in order[:len(RAW) // 2]} == \
        {i for i, (_, k) in rows.items() if k}
    rows7 = {r["doc_id"]: (r["score_q"], r["keep"])
             for r in dsir_select(raw.repartition(7), tgt, keep_frac=0.5,
                                  n_buckets=B).collect()}
    assert rows7 == rows


@pytest.mark.spark
def test_gramless_doc_scores_zero_and_survives(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    raw = spark.createDataFrame([(0, "real words here"), (1, "!!! ???")],
                                ["doc_id", "text"])
    w = dsir_weights(tgt, raw, n_buckets=B)
    got = {r["doc_id"]: r["score_q"]
           for r in dsir_score(raw, w, n_buckets=B).collect()}
    assert got[1] == 0 and got[0] > 0
