"""Distributed bigram language model + quality bucketing (CCNet-style).

CCNet (Wenzek et al. 2020) buckets web documents into head/middle/tail
by language-model perplexity and keeps the head for training corpora.
This module re-expresses the idea Spark-first, trained from the corpus
itself: bigram/history counts via one groupBy shuffle each, then a
per-document coherence score = mean quantized conditional probability
of its adjacent word pairs, and a corpus-mean bucket split.

Integer-exact by construction: the score is
``floor(Q * c(w1,w2) / c(w1·))`` summed and integer-averaged, where
``c(w1·)`` is the pair-left (history) count, so every value is a pure
function of the corpus — bit-identical across engines and partition
layouts, which is what lets the correctness gate hash-check the full
pipeline (true log-perplexity would hinge on libm ``log`` bit-parity
across engines; the monotone rational transform sidesteps that while
ranking documents the same way for a fixed history).

Scale shape (100 TB): counts are vocabulary²-bounded aggregates (one
partial-agg shuffle each, corpus never re-scanned); scoring is an
explode + two equi-joins against those count tables (broadcastable
when the vocab is small — AQE decides; never forced) + one per-doc
aggregation. Nothing driver-side, no windows over the corpus.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import words_arr

DEFAULT_Q = 10**6


def _pairs(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    # adjacent pairs as slice+arrays_zip, NOT a transform() lambda over
    # indices: higher-order functions evaluate interpreted per element
    # (and re-evaluate un-staged child expressions), measured 10x slower
    # on the sf0.1 corpus; slice/zip are single native calls per row.
    # The word array is staged as a column first (textops discipline).
    staged = df.select(F.col(key_col),
                       words_arr(F.col(text_col)).alias("_wa"))
    a, n = F.col("_wa"), F.size("_wa")
    m = F.greatest(n - 1, F.lit(0))       # slice len >= 0 even when empty
    ps = F.arrays_zip(F.slice(a, 1, m), F.slice(a, 2, m))
    return (staged.select(F.col(key_col), F.explode(ps).alias("p"))
            .select(key_col, F.col("p.0").alias("w1"),
                    F.col("p.1").alias("w2")))


def train_bigram_lm(df: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text"):
    """Fit ``(bigrams, histories)`` count tables from a corpus:
    ``(w1, w2, c12)`` and ``(w1, c1)`` where c1 is the pair-left count
    (so c12 sums to c1 per history, and conditionals are proper)."""
    pe = _pairs(df, key_col, text_col)
    # a fitted model is a materialized artifact: localCheckpoint pins the
    # (vocab-sized) tables so downstream scoring plans treat them as
    # leaves instead of re-exploding the corpus per reference (the same
    # lineage-vs-fault-tolerance trade documented at priority.py:95)
    bigrams = (pe.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
               .localCheckpoint(eager=False))
    # history counts roll up from the bigram table — the corpus is
    # exploded exactly once for training
    histories = (bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
                 .localCheckpoint(eager=False))
    return bigrams, histories


def bigram_coherence(df: DataFrame, bigrams: DataFrame,
                     histories: DataFrame, key_col: str = "doc_id",
                     text_col: str = "text",
                     q: int = DEFAULT_Q) -> DataFrame:
    """Score documents with a fitted bigram LM.

    Returns ``(key, n_pairs, coherence_q)`` — coherence_q is the
    integer mean of ``floor(q * c12 / c1)`` over the document's
    adjacent pairs; pairs unseen by the model contribute 0 (instead of
    the unbounded penalty true perplexity assigns), and documents with
    fewer than two words score 0 with n_pairs = 0.
    """
    pe = _pairs(df, key_col, text_col)
    scored = (pe.join(bigrams, ["w1", "w2"], "left")
              .join(histories, ["w1"], "left")
              .select(F.col(key_col),
                      F.coalesce(
                          F.expr(f"({q} * c12) div c1"),
                          F.lit(0)).alias("pq"))
              .groupBy(key_col)
              .agg(F.sum("pq").alias("sq"), F.count("*").alias("np")))
    return (df.select(key_col).join(scored, key_col, "left")
            .select(key_col,
                    F.coalesce("np", F.lit(0)).alias("n_pairs"),
                    F.coalesce(F.expr("sq div np"), F.lit(0))
                    .alias("coherence_q")))


def quality_buckets(scored: DataFrame,
                    score_col: str = "coherence_q") -> DataFrame:
    """Corpus-mean bucket split: 'head' iff score >= corpus mean —
    compared as ``score * n_docs >= sum(scores)`` so the cut stays
    integer-exact (one broadcast single-row aggregate, no quantiles)."""
    # pin the scored frame: the mean aggregate and the row output must
    # read ONE computation, not re-derive the scoring subtree twice
    scored = scored.localCheckpoint(eager=False)
    m = scored.agg(F.sum(score_col).alias("_tot"),
                   F.count("*").alias("_nd"))
    return (scored.crossJoin(F.broadcast(m))
            .withColumn("bucket",
                        F.when(F.col(score_col) * F.col("_nd")
                               >= F.col("_tot"), F.lit("head"))
                        .otherwise(F.lit("tail")))
            .drop("_tot", "_nd"))
