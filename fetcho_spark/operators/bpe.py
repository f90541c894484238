"""Distributed BPE subword-vocabulary training + application.

The real byte-pair-encoding trainer (Sennrich et al. 2016,
``learn_bpe``) as iterative DataFrame aggregations — the subword-vocab
step of an LLM data pipeline, and the corpus-scale counterpart of the
reference's trainer direction (learno/MultiClassifierModelTrainer.cs
fits models FROM workspace data; here the corpus fits a tokenizer).
``textops.bpe_token_estimate`` stays the cheap regex estimator; this
module learns an actual merge table.

Scale shape:
- the corpus collapses to the word-frequency table first (one shuffle,
  vocabulary-sized — the classic BPE reduction: training never touches
  documents again);
- each merge step is ONE partial-aggregated pair-count shuffle over that
  word table plus a driver-side top-1 (``orderBy().limit(1)`` =
  TakeOrderedAndProject — one row crosses to the driver, never the
  counts);
- the pair merge itself is a JVM-side ``aggregate`` fold over each
  word's symbol array (greedy left-to-right, exactly the reference
  algorithm) — zero Python in the loop;
- lineage is truncated per iteration (``localCheckpoint``; same
  fault-tolerance trade as operators/priority.py — a lost executor
  fails the action and the round restarts from the durable word table).

Determinism: ties in pair counts break lexicographically on the pair,
so the learned merge list is a pure function of the corpus — partition-
and parallelism-invariant (tested).
"""

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textops import words_arr

END = "</w>"  # end-of-word sentinel, as in the reference algorithm


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (seq: array<string> of symbols + </w>, freq) — the only
    pass over the documents."""
    w = (df.select(F.explode(words_arr(F.col(text_col))).alias("w"))
           .groupBy("w").agg(F.count("*").alias("freq")))
    seq = F.concat(F.split(F.col("w"), ""), F.array(F.lit(END)))
    return w.select(seq.alias("seq"), "freq")


def _pair_counts(wt: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol pairs (every position counts,
    overlaps included — reference semantics)."""
    n = F.size("seq")
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at("seq", i).alias("a"),
                           F.element_at("seq", i + 1).alias("b")))) \
        .otherwise(F.expr("array()")
                   .cast("array<struct<a:string,b:string>>"))
    return (wt.select("freq", F.explode(pairs).alias("p"))
              .groupBy("p.a", "p.b").agg(F.sum("freq").alias("c")))


def merge_pair_col(seq: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b inside a symbol
    array, as a JVM-side ``aggregate`` fold: the accumulator carries the
    rebuilt array plus one pending symbol; consuming a merge clears the
    pending slot so overlapping triples ("aaa" under (a,a)) merge once,
    exactly like the reference's scan."""
    merged = a + b
    init = F.struct(F.expr("array()").cast("array<string>").alias("out"),
                    F.lit(None).cast("string").alias("pend"))

    def step(acc, x):
        out, pend = acc["out"], acc["pend"]
        hit = pend.isNotNull() & (pend == F.lit(a)) & (x == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(out, F.array(F.lit(merged))))
             .when(pend.isNull(), out)
             .otherwise(F.concat(out, F.array(pend))).alias("out"),
            F.when(hit, F.lit(None).cast("string"))
             .otherwise(x).alias("pend"))

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]) \
                .otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(seq, init, step, fin)


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 50, min_count: int = 2) -> list[tuple]:
    """Learn up to ``n_merges`` BPE merges from a corpus.

    Returns ``[(rank, left, right, pair_count), …]`` in merge order.
    Stops early when the best pair's corpus count drops below
    ``min_count`` (merging hapax pairs only memorizes the corpus).
    """
    wt = _word_table(df, text_col).localCheckpoint()
    merges: list[tuple] = []
    try:
        for rank in range(n_merges):
            top = (_pair_counts(wt)
                   .orderBy(F.desc("c"), F.col("a"), F.col("b"))
                   .limit(1).collect())
            if not top or int(top[0]["c"]) < min_count:
                break
            a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
            merges.append((rank, a, b, c))
            nxt = (wt.select(merge_pair_col(F.col("seq"), a, b).alias("seq"),
                             "freq")
                     .localCheckpoint())   # truncate the per-iter lineage
            wt.unpersist()
            wt = nxt
    finally:
        wt.unpersist()
    return merges


def merges_df(spark, merges: list[tuple]) -> DataFrame:
    # lhs/rhs, not left/right: the merge table must be expressible in ANSI
    # SQL twins and LEFT/RIGHT are reserved words
    return spark.createDataFrame(
        merges, "merge_rank: int, lhs: string, rhs: string, "
                "pair_count: long")


def train_bpe_local(word_freq: dict, n_merges: int,
                    min_count: int = 2) -> list[tuple]:
    """In-memory reference trainer (dict arithmetic only) — the oracle side
    of the gate's distributed-vs-local parity check, mirroring
    mlmodel.train_nb vs train_nb_df. Same greedy semantics and
    lexicographic tie-break as :func:`train_bpe`."""
    vocab = {tuple(w) + (END,): f for w, f in word_freq.items()}
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs: dict = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, a, b, c))
        nxt: dict = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + f
        vocab = nxt
    return merges


def fixture_corpus() -> list[str]:
    """Deterministic training corpus for the gate's fixture-trained entry
    (sf-independent, like mlmodel.topics_fixture_corpus): repetitive
    morphology so merges are non-trivial (shared stems, suffix families)."""
    stems = ["low", "high", "wide", "deep", "new", "old", "fast", "slow"]
    sufs = ["", "er", "est", "ly", "ness"]
    out = []
    for i, s in enumerate(stems):
        words = [s + suf for j, suf in enumerate(sufs) for _ in range(
            1 + (i * 5 + j) % 7)]
        out.append(" ".join(words))
    return out


def encode_word(word: str, ranks: dict) -> list:
    """Rank-greedy BPE encoding of one word (the standard encoder:
    repeatedly merge the lowest-rank adjacent pair present). Shared by
    the Spark UDF and the oracle-side reference so encoder parity is a
    single definition."""
    seq = list(word) + [END]
    while len(seq) >= 2:
        best = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, seq[i], seq[i + 1])
        if best is None:
            break
        _, a, b = best
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def apply_bpe(df: DataFrame, merges: list[tuple], key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table → ``(key, bpe_tokens, n_bpe)``.

    Rank-based greedy (the standard encoder: repeatedly merge the
    lowest-rank pair present) — inherently sequential per word, so this
    is an Arrow-batched pandas UDF, the sanctioned slow path; the merge
    table rides the closure (it is ≤ n_merges rows by construction).
    """
    ranks = {(m[1], m[2]): m[0] for m in merges}

    def encode(word: str) -> list:
        return encode_word(word, ranks)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_udf(words: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_doc(ws):
            toks: list = []
            for w in ws:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode(w)
                toks.extend(got)
            return toks

        return words.map(enc_doc)

    staged = df.select(F.col(key_col), words_arr(F.col(text_col)).alias("_wa"))
    return (staged.select(F.col(key_col),
                          bpe_udf(F.col("_wa")).alias("bpe_tokens"))
            .withColumn("n_bpe", F.size("bpe_tokens")))
