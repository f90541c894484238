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


def _train_topics_fixture() -> NBModel:
    """The in-repo 'topics' model: 4 classes, deterministic synthetic
    corpus (keyword cores + shared filler) — the learno trainer's shape at
    fixture scale."""
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
    return train_nb(texts, labels)


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
