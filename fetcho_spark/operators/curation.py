"""Image–caption curation filters (DataComp/LAION-style) over the north-rule
input shape ``(image_id, bytes, w, h, fmt, caption, phash)``.

The reference *blocks* image fetches outright
(``common/ResourceFetchers/DefaultBlockProvider.cs:46-53``); this build's
north rule inverts that — the corpus IS image+caption pairs — so the
training-data curation step the reference never needed becomes first-class.
Filters follow the public recipes: DataComp "basic filters" (Gadre et al.
2023, arXiv:2304.14108 §4: caption length/language, image size/aspect) and
LAION-400M curation (Schuhmann et al. 2021, arXiv:2111.02114).

Scale shape (100 TB): everything is a single JVM projection over the scan —
no Python, no shuffle. The only join is the eval-set phash blocklist, which
is broadcast (an eval set is small by construction); rows are MARKED with
their drop reasons rather than silently removed, so the funnel is auditable
(``curation_stats``) and each stage's yield rides the lineage metrics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textops import lang_id, token_count

#: deterministic reason order — array position is fixed so the output (and
#: its SQL twin) never depends on evaluation order
REASONS = ("too_small", "aspect", "caption_short", "caption_long", "lang",
           "phash_blocked")


def caption_image_filters(df: DataFrame, *,
                          min_dim: int = 200,
                          max_aspect: float = 3.0,
                          min_caption_words: int = 2,
                          min_caption_chars: int = 5,
                          max_caption_words: int = 256,
                          langs: tuple[str, ...] | None = ("en",),
                          blocked_phashes: DataFrame | None = None,
                          w_col: str = "w", h_col: str = "h",
                          caption_col: str = "caption",
                          phash_col: str = "phash") -> DataFrame:
    """Mark every image–caption row with its curation drop reasons.

    Adds ``drop_reasons`` (array<string>, fixed order per :data:`REASONS`)
    and ``keep`` (true iff no reason fired). Rows are never removed — the
    caller filters on ``keep`` when materializing, and the marked frame
    feeds :func:`curation_stats` for the per-stage funnel.

    ``blocked_phashes`` is an exact eval-set blocklist (one ``phash``
    column), broadcast-joined; near-duplicate image decontamination is the
    banded-hamming job (``dedup.phash_near_pairs`` /
    ``dedup_against``), not this filter.
    """
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    cap = F.col(caption_col)
    nwords = token_count(cap)
    aspect = F.greatest(w, h) / F.greatest(F.least(w, h), F.lit(1.0))

    checks = [
        F.when((w < min_dim) | (h < min_dim), F.lit("too_small")),
        F.when(aspect > max_aspect, F.lit("aspect")),
        F.when((nwords < min_caption_words)
               | (F.length(F.trim(cap)) < min_caption_chars),
               F.lit("caption_short")),
        F.when(nwords > max_caption_words, F.lit("caption_long")),
    ]
    if langs is not None:
        checks.append(F.when(~lang_id(cap).isin(*langs), F.lit("lang")))

    out = df
    if blocked_phashes is not None:
        blk = F.broadcast(
            blocked_phashes.select(F.col(phash_col).alias("_blk_ph"))
            .distinct())
        out = out.join(blk, F.col(phash_col) == F.col("_blk_ph"), "left")
        checks.append(
            F.when(F.col("_blk_ph").isNotNull(), F.lit("phash_blocked")))
    out = out.withColumn("drop_reasons", F.array_compact(F.array(*checks)))
    if blocked_phashes is not None:
        out = out.drop("_blk_ph")
    return out.withColumn("keep", F.size("drop_reasons") == 0)


def alignment_score(df: DataFrame, *,
                    img_vec_col: str = "img_vec",
                    txt_vec_col: str = "txt_vec",
                    out_col: str = "score_q") -> DataFrame:
    """Cross-modal alignment (CLIP-score analog, DataComp §4 "CLIP score
    filtering"): cosine between each pair's image embedding and caption
    embedding, floor-quantized to the 1e-6 grid as BIGINT ``out_col``.

    Both vectors quantize ONCE to the exact integer grid
    (``semdedup.quantize_vec``); dot and norms are exact BIGINT folds, and
    the only float work is three correctly-rounded IEEE ops
    (``dot / (sqrt(n1) * sqrt(n2))``) plus the final floor — bit-stable
    across engines AND partitionings. Zero shuffle: one JVM projection
    over the scan (the embeddings ride the same row, so at 100 TB this is
    scan-bound, never a join). Zero/empty vectors score 0, never NaN.
    """
    from .semdedup import GRID, _dot_q, quantize_vec

    qi = quantize_vec(F.col(img_vec_col))
    qt = quantize_vec(F.col(txt_vec_col))
    out = (df.withColumn("_qi", qi).withColumn("_qt", qt)
             .withColumn("_dot", _dot_q(F.col("_qi"), F.col("_qt")))
             .withColumn("_n1", _dot_q(F.col("_qi"), F.col("_qi")))
             .withColumn("_n2", _dot_q(F.col("_qt"), F.col("_qt"))))
    score = (F.col("_dot").cast("double")
             / (F.sqrt(F.col("_n1").cast("double"))
                * F.sqrt(F.col("_n2").cast("double"))))
    return (out.withColumn(
                out_col,
                F.when((F.col("_n1") > 0) & (F.col("_n2") > 0),
                       F.floor(score * F.lit(float(GRID))).cast("long"))
                .otherwise(F.lit(0).cast("long")))
               .drop("_qi", "_qt", "_dot", "_n1", "_n2"))


def clip_score_filter(df: DataFrame, *,
                      tau: float | None = None,
                      keep_frac: float | None = None,
                      id_col: str = "image_id",
                      img_vec_col: str = "img_vec",
                      txt_vec_col: str = "txt_vec") -> DataFrame:
    """Mark image–caption pairs by alignment: ``score_q`` + ``keep``.

    Two published modes (exactly one must be given):

    - ``tau``: keep iff cosine ≥ tau (LAION-400M used 0.3 on real CLIP).
      The comparison is integer (``score_q ≥ floor(tau·1e6 + 0.5)``) so
      the cut is bit-stable cross-engine.
    - ``keep_frac``: keep the top fraction by score (DataComp keeps the
      top ~30%). The global cut never funnels the corpus through one
      task: rank = the two-phase range-partitioned
      ``priority.with_global_seq`` over the total key
      (−score_q, id), and the keep count comes from one broadcast
      single-row count agg — the same scalar-per-iteration pattern as
      ``ngram_lm.quality_buckets``. Ties broken by id ⇒ deterministic and
      partition-invariant.

    Rows are marked, never removed (curation-funnel discipline).
    """
    if (tau is None) == (keep_frac is None):
        raise ValueError("exactly one of tau / keep_frac required")
    from .semdedup import GRID

    scored = alignment_score(df, img_vec_col=img_vec_col,
                             txt_vec_col=txt_vec_col)
    if tau is not None:
        tau_q = int(math.floor(float(tau) * GRID + 0.5))
        return scored.withColumn("keep", F.col("score_q") >= F.lit(tau_q))
    from .priority import with_global_seq

    ranked = with_global_seq(
        scored.withColumn("_neg_score_q", -F.col("score_q")),
        sort_cols=("_neg_score_q", id_col),
        out_col="_rank", out_type="long")
    tot = F.broadcast(scored.agg(F.count("*").alias("_n")))
    return (ranked.crossJoin(tot)
            .withColumn("keep",
                        F.col("_rank") < F.floor(
                            F.lit(float(keep_frac)) * F.col("_n"))
                        .cast("long"))
            .drop("_neg_score_q", "_n"))


def curation_stats(marked: DataFrame) -> DataFrame:
    """Per-reason drop counts + the kept count — the curation funnel.

    One partial-agg shuffle over exploded reasons; ``kept`` rows count
    under the literal reason ``'kept'`` so the output partitions the
    corpus only when every row carries at most one reason — with multiple
    reasons a row contributes to each (standard funnel reading).
    """
    reason = F.explode(
        F.when(F.col("keep"), F.array(F.lit("kept")))
        .otherwise(F.col("drop_reasons"))).alias("reason")
    return (marked.select(reason)
            .groupBy("reason").agg(F.count("*").alias("n_rows"))
            .orderBy("reason"))
