"""Text analysis for large-scale training-data pipelines.

Beyond the reference's operator set (it has a WordTokenizer + keyword counts,
/root/reference/common/ContentReader/WordTokenizer.cs:10-205 and
reado/ExtractKeywordsConsumer.cs): language-ID, quality scoring, token
counting, document fingerprinting — the ops a 100 TB text corpus pipeline
needs. Everything is built from JVM-side ``pyspark.sql.functions`` only
(whole-stage codegen; no Python in the hot path), and each op has an exact
ANSI-SQL twin in ``__spark_entry__.py`` so DuckDB oracle-checks the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language-ID heuristic: stopword-hit scoring (n-gram-ish; deterministic and
# SQL-expressible — a real model would ride the same column contract)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " is ", " of "],
    "fr": [" le ", " la ", " et ", " est "],
    "de": [" der ", " und ", " ist ", " das "],
    "es": [" el ", " los ", " y ", " es "],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _padded(col: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def _hits(col: Column, kw: str) -> Column:
    """Occurrence count of ``kw`` via length difference — portable to ANSI SQL."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(kw), F.lit(""))))
            / F.lit(len(kw))).cast("int")


def token_count(col: Column) -> Column:
    """Whitespace tokenization count (WordTokenizer analog). BPE-ish subword
    estimate: see ``bpe_token_estimate``."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


def bpe_token_estimate(col: Column) -> Column:
    """Deterministic BPE-ish token estimate: words + extra tokens for long
    words (≈1 per 4 chars beyond 4) + punctuation marks — a common
    chars/4-style heuristic, exactly reproducible in SQL."""
    words = token_count(col)
    chars = F.length(F.trim(col))
    punct = _hits(col, ".") + _hits(col, ",")
    return (words + F.floor(chars / F.lit(16)) + punct).cast("int")


def quality_score(col: Column) -> Column:
    """[0,1] quality: length band + stopword presence − punctuation excess.

    Mirrors classic crawl-corpus quality filters (length, punct ratio,
    stopword ratio); weights are fixed so the SQL oracle is exact.
    """
    chars = F.length(col).cast("double")
    words = token_count(col).cast("double")
    padded = _padded(col)
    stop_hits = None
    for w in STOPWORDS:
        h = _hits(padded, f" {w} ")
        stop_hits = h if stop_hits is None else stop_hits + h
    punct = (_hits(col, ".") + _hits(col, ",") + _hits(col, "!")
             + _hits(col, "?")).cast("double")
    len_score = F.least(chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stop_hits.cast("double")
                         / F.greatest(words, F.lit(1.0)) * F.lit(4.0),
                         F.lit(1.0))
    punct_pen = F.least(punct / F.greatest(words, F.lit(1.0)), F.lit(1.0))
    return F.round(F.lit(0.5) * len_score + F.lit(0.4) * stop_score
                   + F.lit(0.1) * (F.lit(1.0) - punct_pen), 6)


def lang_scores(col: Column) -> dict[str, Column]:
    padded = _padded(col)
    out = {}
    for lang, kws in LANG_MARKERS.items():
        s = None
        for kw in kws:
            h = _hits(padded, kw)
            s = h if s is None else s + h
        out[lang] = s
    return out


def lang_id(col: Column) -> Column:
    """argmax over marker scores; 'und' when all zero. Ties break by fixed
    priority order en > fr > de > es — built as the same nested ``>=`` chain
    the SQL oracle uses, so tied scores agree by construction (the round-1
    loop formulation inverted the tie-break: es kept ties)."""
    s = lang_scores(col)
    en, fr, de, es = s["en"], s["fr"], s["de"], s["es"]
    return (
        F.when((en >= fr) & (en >= de) & (en >= es) & (en > 0), F.lit("en"))
         .when((fr >= de) & (fr >= es) & (fr > 0), F.lit("fr"))
         .when((de >= es) & (de > 0), F.lit("de"))
         .when(es > 0, F.lit("es"))
         .otherwise(F.lit("und")))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercase text —
    the exact-dedup key (DataHash analog, common/Md5Hash.cs over body)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def keyword_counts(df: DataFrame, text_col: str = "text",
                   min_len: int = 3) -> DataFrame:
    """A5: term frequencies across the corpus (ExtractKeywordsConsumer)."""
    return (df.select(F.explode(F.split(F.lower(F.col(text_col)),
                                        r"[^a-z0-9]+")).alias("word"))
            .filter(F.length("word") >= min_len)
            .groupBy("word").agg(F.count("*").alias("n")))
