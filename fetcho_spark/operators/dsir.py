"""DSIR-style data selection via hashed n-gram importance weights.

The published method (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): featurize documents as hashed
n-gram counts, fit bucket unigram models on a small TARGET (quality)
sample and on the RAW corpus, weight each document by how target-like
its buckets are, and keep the top mass. It is the standard
domain-matching selection pass a 100 TB pretraining pipeline runs
after dedup/quality filters.

Engine-exactness trade (deliberate, same family as ``rank_docs``'
integer idf and ``ngram_lm``'s integer conditional probability): the
paper's per-bucket weight is ``log p̂_target(b) − log p̂_raw(b)``;
libm ``log`` is not guaranteed correctly-rounded identically across
engines, so the weight here is the QUANTIZED PROBABILITY RATIO

    weight_q(b) = floor( double((ct_b+1)·(Zr+B)) · SCALE
                         / double((cr_b+1)·(Zt+B)) )

— add-one-smoothed target/raw ratio per bucket, computed as exact
int64 products (≤2^53, exact as doubles) through one correctly-rounded
IEEE multiply + divide + floor, so the weight table is bit-identical
in any engine. A document's score sums ``weight_q`` over its gram
instances (multiplicity included). Summing ratio weights instead of
log weights is a different (documented) estimator with the same
monotone per-bucket behavior; the pipeline shape — hashed n-gram
featurization, target/raw contrast, importance-ranked top-fraction
selection — is DSIR's.

Scale shape: bucket count tables are ≤ ``n_buckets`` rows (two
partial-agg shuffles over gram instances, map-side combined); the
weight table is one ≤ n_buckets-row join plus two broadcast
single-row total aggs (the scalar-per-iteration pattern — no driver
collect); scoring is explode → BROADCAST weight join → one per-doc
partial agg, zero executor Python (the ``nb_classify`` shape); the
global top-fraction cut is the two-phase range-partitioned
``with_global_seq`` — the corpus never funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import word_ngrams_arr, words_arr

DEFAULT_BUCKETS = 4096
SCALE = 1_000_000


def _gram_buckets(df: DataFrame, text_col: str, n_buckets: int,
                  *keep_cols: str) -> DataFrame:
    """Per gram INSTANCE (unigram + bigram) → md5 bucket id."""
    staged = df.select(*[F.col(c) for c in keep_cols],
                       words_arr(F.col(text_col)).alias("_wa"))
    grams = staged.select(
        *keep_cols,
        F.explode(F.concat(F.col("_wa"),
                           word_ngrams_arr(F.col("_wa"), 2))).alias("_g"))
    b = (F.conv(F.substring(F.md5(F.col("_g")), 1, 12), 16, 10)
         .cast("long") % n_buckets).cast("int")
    return grams.select(*keep_cols, b.alias("bucket"))


def hashed_ngram_counts(df: DataFrame, text_col: str = "text",
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Hashed unigram+bigram bucket counts → ``(bucket, n)``,
    ≤ ``n_buckets`` rows (one partial-agg shuffle)."""
    return (_gram_buckets(df, text_col, n_buckets)
            .groupBy("bucket").agg(F.count("*").alias("n")))


def dsir_weights(target: DataFrame, raw: DataFrame,
                 text_col: str = "text",
                 n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Quantized importance-weight table → ``(bucket, weight_q)``.

    Smoothed target/raw bucket-probability ratio, floor-quantized at
    ``SCALE`` (see module docstring for the exact IEEE recipe). The
    output is ≤ ``n_buckets`` rows — broadcast territory by
    construction.
    """
    from pyspark.sql import Window

    ct = hashed_ngram_counts(target, text_col, n_buckets) \
        .withColumnRenamed("n", "_ct")
    cr = hashed_ngram_counts(raw, text_col, n_buckets) \
        .withColumnRenamed("n", "_cr")
    # totals as window sums over the ALREADY-JOINED ≤ n_buckets-row
    # bucket table, not two broadcast single-row aggs: the old shape
    # re-evaluated the ct/cr gram-explosion subtrees once more each for
    # the totals (plus two broadcast-exchange jobs); a sum over a frame
    # bounded at n_buckets rows is scale-safe by construction, and
    # sum() skips the full-outer NULLs exactly like the per-side aggs
    # did, so zt/zr are the same integers (r6 optimization; dsir_sample
    # 22 -> 12 jobs). The SQL twin already computes totals post-join.
    w_all = Window.partitionBy()
    joined = (ct.join(cr, "bucket", "full_outer")
              .withColumn("_zt", F.sum("_ct").over(w_all))
              .withColumn("_zr", F.sum("_cr").over(w_all)))
    num = ((F.coalesce(F.col("_ct"), F.lit(0)) + 1)
           * (F.col("_zr") + n_buckets)).cast("double") * F.lit(float(SCALE))
    den = ((F.coalesce(F.col("_cr"), F.lit(0)) + 1)
           * (F.col("_zt") + n_buckets)).cast("double")
    return joined.select(
        "bucket", F.floor(num / den).cast("long").alias("weight_q"))


def dsir_score(docs: DataFrame, weights: DataFrame,
               key_col: str = "doc_id", text_col: str = "text",
               n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Per-document importance score → ``(key, score_q)``: sum of
    ``weight_q`` over the doc's gram instances. Explode → broadcast
    weight join → one per-doc partial-agg shuffle; gramless docs score
    0."""
    scored = (_gram_buckets(docs, text_col, n_buckets, key_col)
              .join(F.broadcast(weights), "bucket")
              .groupBy(key_col)
              .agg(F.sum("weight_q").alias("_s")))
    return (docs.select(key_col).join(scored, key_col, "left")
            .select(key_col,
                    F.coalesce(F.col("_s"), F.lit(0)).cast("long")
                     .alias("score_q")))


def dsir_select(docs: DataFrame, target: DataFrame,
                keep_frac: float, key_col: str = "doc_id",
                text_col: str = "text",
                n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Mark the top ``keep_frac`` most target-like documents →
    ``(key, score_q, keep)``. Rows are marked, never removed
    (curation-funnel discipline). Deterministic: ties break on the key
    through the two-phase range-partitioned global rank; the keep
    count is one broadcast single-row agg."""
    from .priority import with_global_seq

    scored = dsir_score(docs, dsir_weights(target, docs, text_col,
                                           n_buckets),
                        key_col, text_col, n_buckets)
    ranked = with_global_seq(
        scored.withColumn("_neg", -F.col("score_q")),
        sort_cols=("_neg", key_col), out_col="_rank", out_type="long")
    # the keep-cut denominator is |docs| — count the cheap key
    # projection, not `scored`, whose count is identical by construction
    # (left join from docs.select(key)) but whose evaluation re-runs the
    # whole gram/score pipeline (r6 optimization)
    tot = F.broadcast(docs.select(key_col).agg(F.count("*").alias("_n")))
    return (ranked.crossJoin(tot)
            .withColumn("keep",
                        F.col("_rank") < F.floor(
                            F.lit(float(keep_frac)) * F.col("_n"))
                        .cast("long"))
            .drop("_neg", "_n", "_rank"))
