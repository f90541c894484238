"""Bigram LM coherence scoring vs an independent dict-arithmetic
reference, plus model-transfer scoring and bucket semantics."""

import re
from collections import Counter

import pytest

from fetcho_spark.operators.ngram_lm import (DEFAULT_Q, bigram_coherence,
                                             quality_buckets,
                                             train_bigram_lm)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "the dog sat on the mat"),
    (3, "colorless green ideas sleep furiously"),
    (4, "mat"),                       # single word: no pairs
    (5, "The CAT sat, on the mat!"),  # tokenizer folds to doc-0 shape
]


def _words(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _ref_scores(corpus, q=DEFAULT_Q):
    b, u = Counter(), Counter()
    for _, t in corpus:
        ws = _words(t)
        for x, y in zip(ws, ws[1:]):
            b[(x, y)] += 1
            u[x] += 1
    out = {}
    for doc_id, t in corpus:
        ws = _words(t)
        pqs = [(q * b[(x, y)]) // u[x] for x, y in zip(ws, ws[1:])]
        out[doc_id] = (len(pqs), sum(pqs) // len(pqs) if pqs else 0)
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.mark.spark
def test_coherence_matches_reference(docs):
    bg, hist = train_bigram_lm(docs)
    got = {r["doc_id"]: (r["n_pairs"], r["coherence_q"])
           for r in bigram_coherence(docs, bg, hist).collect()}
    assert got == _ref_scores(CORPUS)
    # self-trained: globally unique bigrams are deterministic histories
    # (p(w2|w1) = 1), so doc 3 maxes the scale while the shared-history
    # docs sit strictly below it; pairless doc scores 0
    assert got[3][1] == DEFAULT_Q
    assert 0 < got[0][1] < DEFAULT_Q
    assert got[4] == (0, 0)
    assert got[5] == got[0]           # tokenizer normalization


@pytest.mark.spark
def test_model_transfer_unseen_pairs_contribute_zero(spark, docs):
    bg, hist = train_bigram_lm(docs)
    new = spark.createDataFrame(
        [(9, "the cat sat"), (10, "quantum flux capacitor")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["coherence_q"]
           for r in bigram_coherence(new, bg, hist).collect()}
    assert got[9] > 0 and got[10] == 0


@pytest.mark.spark
def test_quality_buckets_mean_split(docs):
    bg, hist = train_bigram_lm(docs)
    scored = bigram_coherence(docs, bg, hist)
    rows = quality_buckets(scored).collect()
    scores = {r["doc_id"]: r["coherence_q"] for r in rows}
    mean_num = sum(scores.values())
    for r in rows:
        want = "head" if r["coherence_q"] * len(rows) >= mean_num else "tail"
        assert r["bucket"] == want, r
    assert {r["bucket"] for r in rows} == {"head", "tail"}


@pytest.mark.spark
def test_partition_invariance(docs):
    bg, hist = train_bigram_lm(docs.repartition(7))
    base = sorted(map(tuple,
                      bigram_coherence(docs, bg, hist).collect()))
    bg2, hist2 = train_bigram_lm(docs)
    rep = sorted(map(tuple,
                     bigram_coherence(docs.repartition(3), bg2,
                                      hist2).collect()))
    assert base == rep
