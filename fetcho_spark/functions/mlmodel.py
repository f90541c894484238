"""Deterministic multinomial Naive Bayes text classifier for the
``ml-model(name[,conf]):class`` filter (SURVEY.md §2.3 F14).

The reference trains ML.NET multiclass text models offline (whole
``learno/`` project, learno/MultiClassifierModelTrainer.cs) and filters with
``MachineLearningModelFilter.cs:12-186``: predict (label, scores) for the
page text, match when the predicted label contains the search class AND
max(Score) exceeds the confidence threshold (default 0.98; ``any`` → 0.01),
memoized by DataHash. This module re-expresses that as public-knowledge
multinomial NB in numpy — small, deterministic, trained on an in-repo
labeled fixture corpus, broadcast to executors by closure, scored in an
Arrow-batched pandas UDF (never per-row Python).

R5 memoization: the reference caches the last prediction by DataHash; in a
set-oriented engine the equivalent is ``dropDuplicates(fingerprint)`` before
scoring + join back — callers scoring corpora with heavy duplication should
dedup first (operators/dedup.exact_dedup_groups); the score itself is a pure
function of text either way.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z0-9]+")

DEFAULT_CONFIDENCE = 0.98          # MachineLearningModelFilter.cs:20
ANY_CONFIDENCE = 0.01              # DefaultConfidenceThresholdWhenAny (:21)


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


class NBModel:
    """Multinomial NB with add-alpha smoothing; predict returns the argmax
    label and the softmax-normalized posterior of that label (the
    ML.NET-maxScore analog the confidence threshold gates on)."""

    __slots__ = ("labels", "vocab", "log_prior", "log_lik", "log_unk")

    def __init__(self, labels, vocab, log_prior, log_lik, log_unk):
        self.labels = labels          # list[str]
        self.vocab = vocab            # dict[token, column]
        self.log_prior = log_prior    # (L,)
        self.log_lik = log_lik        # (L, V)
        self.log_unk = log_unk        # (L,) unseen-token likelihood

    def predict_one(self, text: str) -> tuple[str | None, float]:
        toks = tokenize(text)
        if not toks:
            return None, 0.0
        lp = self.log_prior.copy()
        for t in toks:
            j = self.vocab.get(t)
            lp += self.log_lik[:, j] if j is not None else self.log_unk
        lp -= lp.max()
        p = np.exp(lp)
        p /= p.sum()
        k = int(p.argmax())
        return self.labels[k], float(p[k])


def train_nb_df(df, text_col: str = "text", label_col: str = "label",
                alpha: float = 1.0, min_df: int = 1,
                max_vocab: int | None = None) -> NBModel:
    """Cluster-scale NB trainer — the ``learno`` analog
    (learno/MultiClassifierModelTrainer.cs trains multiclass text models
    from workspace result data; this is the same fit expressed as DataFrame
    aggregation). The corpus never reaches the driver: tokens explode
    JVM-side (``regexp_extract_all``, whole-stage codegen), ONE
    partial-aggregated ``groupBy(label, token)`` shuffle produces the count
    matrix, and only the O(labels × vocab) aggregate — the model itself —
    is collected. At 100 TB the corpus scan/shuffle distributes like any
    word-count; the collected model is vocab-sized, not corpus-sized.

    Exact parity with :func:`train_nb` on the same rows (identical
    quantized params) is pinned by tests/test_training_ops.py and the
    ``ml_train_classify`` correctness-gate entry: integer token counts are
    exact in float64 regardless of summation order, so the numpy log-space
    fit downstream is bit-identical. Tokenization runs through the JVM
    ``lower`` + ``[a-z0-9]+`` regex, which agrees with the Python tokenizer
    on everything but exotic case-folding codepoints (both fold ASCII
    identically; the token alphabet is ASCII-only by construction).

    "Model-sized" must be BOUNDED at 100 TB — the raw token vocabulary of
    a web corpus is 10^8-10^9 rows (hapax/typo/URL-fragment tail), a
    driver OOM if collected raw. ``min_df`` drops tokens with total count
    below it and ``max_vocab`` keeps only the top-V by total count (ties
    → lexicographic, so the cut is deterministic in any partitioning);
    both run INSIDE the aggregation — a second agg over the already
    model-shaped (label, token) counts plus a bounded TakeOrdered, never
    a corpus re-scan — so the collect is ≤ labels×V rows. Dropped tokens
    fall to the model's unknown-token likelihood at classify time.
    Defaults (1, None) are exact no-ops, preserving bit-parity with
    :func:`train_nb`.
    """
    toks = df.select(
        F.col(label_col).alias("_lbl"),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)))
        .alias("_tok"))
    pairs = toks.groupBy("_lbl", "_tok").count()
    if min_df > 1 or max_vocab is not None:
        totals = pairs.groupBy("_tok").agg(F.sum("count").alias("_tc"))
        if min_df > 1:
            totals = totals.filter(F.col("_tc") >= min_df)
        if max_vocab is not None:
            totals = (totals.orderBy(F.col("_tc").desc(),
                                     F.col("_tok").asc())
                      .limit(int(max_vocab)))
        pairs = pairs.join(totals.select("_tok"), "_tok")
    pair_rows = pairs.collect()
    prior_rows = (df.groupBy(F.col(label_col).alias("_lbl")).count()
                  .collect())
    label_names = sorted(r["_lbl"] for r in prior_rows)
    lidx = {l: i for i, l in enumerate(label_names)}
    vocab = {t: j for j, t in
             enumerate(sorted({r["_tok"] for r in pair_rows}))}
    counts = np.zeros((len(label_names), len(vocab)))
    for r in pair_rows:
        counts[lidx[r["_lbl"]], vocab[r["_tok"]]] = r["count"]
    prior = np.zeros(len(label_names))
    for r in prior_rows:
        prior[lidx[r["_lbl"]]] = r["count"]
    v = len(vocab)
    denom = counts.sum(axis=1, keepdims=True) + alpha * (v + 1)
    log_lik = np.log((counts + alpha) / denom)
    log_unk = np.log(alpha / denom[:, 0])
    log_prior = np.log(prior / prior.sum())
    return NBModel(label_names, vocab, log_prior, log_lik, log_unk)


def train_nb(texts: list[str], labels: list[str], alpha: float = 1.0) -> NBModel:
    label_names = sorted(set(labels))
    lidx = {l: i for i, l in enumerate(label_names)}
    vocab: dict[str, int] = {}
    for t in texts:
        for tok in tokenize(t):
            vocab.setdefault(tok, len(vocab))
    counts = np.zeros((len(label_names), len(vocab)))
    prior = np.zeros(len(label_names))
    for t, l in zip(texts, labels):
        i = lidx[l]
        prior[i] += 1
        for tok in tokenize(t):
            counts[i, vocab[tok]] += 1
    v = len(vocab)
    denom = counts.sum(axis=1, keepdims=True) + alpha * (v + 1)
    log_lik = np.log((counts + alpha) / denom)
    log_unk = np.log(alpha / denom[:, 0])
    log_prior = np.log(prior / prior.sum())
    return NBModel(label_names, vocab, log_prior, log_lik, log_unk)


# ----------------------------------------------------------- model registry
# name → NBModel (the reference's MLModelPath directory of .mlmodel files).
_MODELS: dict[str, NBModel] = {}


def register_model(name: str, model: NBModel) -> None:
    _MODELS[name] = model


def get_model(name: str) -> NBModel:
    if name not in _MODELS and name == "topics":
        register_model("topics", _train_topics_fixture())
    if name not in _MODELS:
        # ThrowIfModelDoesntExist (MachineLearningModelFilter.cs:80-84)
        raise KeyError(f"ml-model {name!r} doesn't exist")
    return _MODELS[name]


def topics_fixture_corpus() -> tuple[list[str], list[str]]:
    """The deterministic 'topics' fixture corpus (texts, labels) — shared
    by the in-memory trainer (model registry) and the distributed-trainer
    parity tests/oracle so both fit from identical rows."""
    cores = {
        "Science": ["experiment", "theory", "physics", "research", "data",
                    "quantum", "laboratory", "hypothesis"],
        "Health": ["doctor", "patient", "medicine", "disease", "clinic",
                   "therapy", "diet", "vaccine"],
        "Sports": ["team", "match", "score", "league", "coach", "player",
                   "season", "tournament"],
        "Finance": ["market", "stock", "price", "investor", "bank",
                    "profit", "trading", "economy"],
    }
    filler = ["the", "a", "of", "and", "it", "was", "report", "today",
              "new", "about"]
    rng = np.random.default_rng(42)
    texts, labels = [], []
    for label, kws in cores.items():
        for i in range(40):
            words = [kws[int(rng.integers(0, len(kws)))]
                     for _ in range(6)]
            words += [filler[int(rng.integers(0, len(filler)))]
                      for _ in range(6)]
            rng.shuffle(words)
            texts.append(" ".join(words))
            labels.append(label)
    return texts, labels


def _train_topics_fixture() -> NBModel:
    """The in-repo 'topics' model: 4 classes, deterministic synthetic
    corpus (keyword cores + shared filler) — the learno trainer's shape at
    fixture scale."""
    return train_nb(*topics_fixture_corpus())


# ------------------------------------------- quantized distributed scorer

SCORE_QUANT = 1_000_000
"""Log-weights are quantized to round(w * 1e6) integers for the distributed
scorer: integer sums are order-independent, so Spark's partial-agg shuffle
and any ANSI engine summing in a different order agree bit-for-bit (float
log-prob sums are not associative). 1e-6 log-space resolution flips an
argmax only on near-exact ties."""


def quantized_params(name: str):
    """(labels, vocab_rows, priors_q, unks_q) with every log-weight as a
    ``round(w * SCORE_QUANT)`` int. The same integers feed the Spark plan and
    the generated SQL oracle twin, so cross-engine parity is exact."""
    m = get_model(name)
    L = len(m.labels)
    rows = [(tok, *[int(round(m.log_lik[i, j] * SCORE_QUANT))
                    for i in range(L)])
            for tok, j in sorted(m.vocab.items())]
    priors = [int(round(m.log_prior[i] * SCORE_QUANT)) for i in range(L)]
    unks = [int(round(m.log_unk[i] * SCORE_QUANT)) for i in range(L)]
    return list(m.labels), rows, priors, unks


def nb_classify(df, key_col: str, text_col: str, name: str):
    """Distributed NB argmax over integer-quantized log scores → columns
    ``(key_col, label, score_q)``.

    Plan shape (scales to any corpus): tokens explode → broadcast left-join
    to the (token → per-label weight) table, unknown tokens coalescing to the
    unk weight → ONE partial-aggregated groupBy(key) shuffle summing per-label
    scores → argmax with first-label tie-break (numpy ``argmax`` keeps the
    lowest index; ``labels`` is sorted, and the nested ``>=`` chain below
    reproduces that exactly). The model broadcast is O(vocab × labels); no
    Python runs on the executors at all — unlike ``make_ml_udf`` this path is
    whole-stage-codegen JVM.

    Zero-token docs mirror ``predict_one``'s ``(None, 0.0)`` as
    ``(NULL, 0)``.
    """
    labels, rows, priors, unks = quantized_params(name)
    L = len(labels)
    wcols = [f"_w{i}" for i in range(L)]
    vocab_df = df.sparkSession.createDataFrame(rows, ["_tok"] + wcols)
    toks = df.select(
        F.col(key_col),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)))
        .alias("_tok"))
    sums = (toks.join(F.broadcast(vocab_df), "_tok", "left")
            .groupBy(key_col)
            .agg(*[F.sum(F.coalesce(F.col(w), F.lit(unks[i]))).alias(w)
                   for i, w in enumerate(wcols)]))
    scores = [(F.col(w) + F.lit(priors[i])).cast("long")
              for i, w in enumerate(wcols)]
    label = None
    for i in range(L - 1):
        cond = None
        for j in range(i + 1, L):
            c = scores[i] >= scores[j]
            cond = c if cond is None else cond & c
        label = (F.when(cond, F.lit(labels[i])) if label is None
                 else label.when(cond, F.lit(labels[i])))
    label = label.otherwise(F.lit(labels[L - 1]))
    return (df.select(key_col)
            .join(sums, key_col, "left")
            .select(F.col(key_col),
                    F.when(F.col(wcols[0]).isNull(),
                           F.lit(None).cast("string"))
                     .otherwise(label).alias("label"),
                    F.coalesce(F.greatest(*scores), F.lit(0))
                     .cast("long").alias("score_q")))


def nb_classify_sql(name: str, table: str = "documents",
                    key_col: str = "doc_id", text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`nb_classify`, generated from the SAME
    quantized integers — the DuckDB oracle for the ``ml_classify`` entry."""
    labels, rows, priors, unks = quantized_params(name)
    L = len(labels)
    vals = ",\n                ".join(
        "('" + tok.replace("'", "''") + "', "
        + ", ".join(str(w) for w in ws) + ")"
        for tok, *ws in rows)
    scols = ",\n                   ".join(
        f"CAST(SUM(COALESCE(v.w{i}, {unks[i]})) + {priors[i]} AS BIGINT)"
        f" AS s{i}" for i in range(L))
    cases = []
    for i in range(L - 1):
        cond = " AND ".join(f"s{i} >= s{j}" for j in range(i + 1, L))
        cases.append(f"WHEN {cond} THEN '{labels[i]}'")
    case = ("CASE WHEN s0 IS NULL THEN NULL "
            + " ".join(cases) + f" ELSE '{labels[L-1]}' END")
    greatest = "greatest(" + ", ".join(f"s{i}" for i in range(L)) + ")"
    return f"""
            WITH toks AS (
              SELECT {key_col},
                     unnest(regexp_extract_all(lower({text_col}),
                                               '[a-z0-9]+')) AS tok
              FROM {table}
            ), v(tok, {", ".join(f"w{i}" for i in range(L))}) AS (
              VALUES {vals}
            ), sums AS (
              SELECT t.{key_col},
                   {scols}
              FROM toks t LEFT JOIN v ON t.tok = v.tok
              GROUP BY t.{key_col}
            )
            SELECT d.{key_col},
                   {case} AS label,
                   CAST(COALESCE({greatest}, 0) AS BIGINT) AS score_q
            FROM {table} d LEFT JOIN sums USING ({key_col})
            ORDER BY {key_col}"""


_PRED_SCHEMA = T.StructType([
    T.StructField("label", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def make_ml_udf(name: str):
    """Arrow-batched scorer for a registered model: text → (label, score).
    The model resolves at query-compile time (unknown name raises there,
    matching ThrowIfModelDoesntExist) and ships to executors by closure."""
    model = get_model(name)

    @F.pandas_udf(_PRED_SCHEMA)
    def _udf(text: pd.Series) -> pd.DataFrame:
        preds = [model.predict_one(t) for t in text]
        return pd.DataFrame(preds, columns=["label", "score"])

    return _udf
