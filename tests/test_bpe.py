"""Distributed BPE trainer vs an independent pure-Python reference, plus
the round-trip invariant (encoding a training word with the learned merges
reproduces the trainer's final symbol sequence) and partition invariance."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators import bpe as B

CORPUS = [
    (0, "low low low low low lower lower"),
    (1, "newest newest newest newest newest newest"),
    (2, "widest widest widest lowest"),
    (3, "Low, LOWER! (newest) -- widest?"),   # tokenizer noise
]


def _ref_words(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    return c


def _ref_train(word_freq, n_merges, min_count=2):
    """Independent reference learn_bpe (dict/Counter arithmetic only)."""
    vocab = {tuple(w) + (B.END,): f for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((rank, a, b, c))
        out = {}
        for seq, f in vocab.items():
            ns, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + f
        vocab = out
    return merges, vocab


@pytest.mark.spark
def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = B.train_bpe(df, n_merges=12)
    want, _ = _ref_train(_ref_words([t for _, t in CORPUS]), 12)
    assert got == want
    assert len(got) > 3                      # non-vacuous
    # the classic example learns (e,s) early: 'es' dominates newest/widest
    assert ("e", "s") in {(a, b) for _, a, b, _ in got[:3]}


@pytest.mark.spark
def test_train_bpe_partition_invariant(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    base = B.train_bpe(df, n_merges=8)
    assert B.train_bpe(df.repartition(7), n_merges=8) == base


@pytest.mark.spark
def test_apply_bpe_roundtrips_training_words(spark):
    """Encoder ≡ trainer: every training word encodes to exactly the symbol
    sequence the trainer's final table holds for it."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = B.train_bpe(df, n_merges=12)
    _, final_vocab = _ref_train(_ref_words([t for _, t in CORPUS]), 12)
    seq_of = {"".join(s).replace(B.END, ""): list(s) for s in final_vocab}
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in B.apply_bpe(df, merges).collect()}
    for doc_id, text in CORPUS:
        want = []
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                want.extend(seq_of[w])
        assert got[doc_id] == want, doc_id
    # n_bpe column is the token count
    row = B.apply_bpe(df, merges).filter(F.col("doc_id") == 0).collect()[0]
    assert row["n_bpe"] == len(row["bpe_tokens"])


@pytest.mark.spark
def test_apply_bpe_unseen_word_falls_back_to_chars(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = B.train_bpe(df, n_merges=12)
    unseen = spark.createDataFrame([(9, "zq")], ["doc_id", "text"])
    toks = B.apply_bpe(unseen, merges).collect()[0]["bpe_tokens"]
    assert toks == ["z", "q", B.END]
