"""DataComp/LAION-style image-caption curation filters.

The oracle gate (datacomp_filter / curation_stats) proves the md5-derived
fixture twin; these tests pin the operator semantics directly: reason
ordering, each threshold boundary, the broadcast blocklist, and the funnel
partition property when rows carry a single reason.
"""

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators.curation import (REASONS, caption_image_filters,
                                             curation_stats)

GOOD_CAP = "the cat sat on the mat and the dog is here"


def _img(spark, rows):
    return spark.createDataFrame(
        rows, "image_id bigint, w int, h int, fmt string, caption string, "
              "phash bigint")


def test_reasons_fire_and_order(spark):
    rows = [
        (1, 500, 500, "jpeg", GOOD_CAP, 11),            # clean
        (2, 100, 250, "jpeg", GOOD_CAP, 12),            # too_small (w)
        (3, 300, 120, "png", GOOD_CAP, 13),             # too_small (h)
        (4, 900, 200, "png", GOOD_CAP, 14),             # aspect 4.5
        (5, 500, 500, "gif", "the", 15),                # caption_short
        (6, 500, 500, "gif", "the and is of " * 70, 16),  # caption_long
        (7, 500, 500, "jpeg", "le chat est sur la table et la", 17),  # lang
        (8, 100, 900, "jpeg", "the", 18),               # several at once
    ]
    out = caption_image_filters(_img(spark, rows))
    got = {r.image_id: (r.keep, list(r.drop_reasons))
           for r in out.collect()}
    assert got[1] == (True, [])
    assert got[2] == (False, ["too_small"])
    assert got[3] == (False, ["too_small"])
    assert got[4] == (False, ["aspect"])
    assert got[5] == (False, ["caption_short"])
    assert got[6] == (False, ["caption_long"])
    assert got[7] == (False, ["lang"])
    # multi-reason rows list reasons in fixed REASONS order
    assert got[8][1] == ["too_small", "aspect", "caption_short"]
    assert [r for r in got[8][1]] == sorted(
        got[8][1], key=REASONS.index)


def test_boundaries_inclusive_exclusive(spark):
    rows = [
        (1, 200, 200, "jpeg", GOOD_CAP, 1),   # exactly min_dim -> keep
        (2, 199, 200, "jpeg", GOOD_CAP, 2),   # one below -> drop
        (3, 600, 200, "jpeg", GOOD_CAP, 3),   # aspect exactly 3.0 -> keep
        (4, 601, 200, "jpeg", GOOD_CAP, 4),   # just over -> drop
        (5, 500, 500, "jpeg", "is an", 5),    # 2 words / 5 chars -> keep
        (6, 500, 500, "jpeg", "a is", 6),     # 4 chars -> drop
    ]
    out = caption_image_filters(_img(spark, rows))
    got = {r.image_id: r.keep for r in out.collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True, 6: False}


def test_phash_blocklist_broadcast(spark):
    rows = [(i, 500, 500, "jpeg", GOOD_CAP, 100 + i) for i in range(6)]
    img = _img(spark, rows)
    blk = spark.createDataFrame([(102,), (104,), (999,)], "phash bigint")
    out = caption_image_filters(img, blocked_phashes=blk)
    got = {r.image_id: list(r.drop_reasons) for r in out.collect()}
    assert got[2] == ["phash_blocked"] and got[4] == ["phash_blocked"]
    assert all(got[i] == [] for i in (0, 1, 3, 5))
    # the blocklist join must be broadcast, never a shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lang_filter_optional_and_multi(spark):
    rows = [(1, 500, 500, "jpeg", "le chat est sur la table et la", 1)]
    img = _img(spark, rows)
    assert caption_image_filters(img, langs=None).first().keep
    assert caption_image_filters(img, langs=("en", "fr")).first().keep
    assert not caption_image_filters(img, langs=("en",)).first().keep


def test_curation_stats_partitions_single_reason_corpus(spark):
    rows = [
        (1, 500, 500, "jpeg", GOOD_CAP, 1),
        (2, 500, 500, "jpeg", GOOD_CAP, 2),
        (3, 100, 250, "jpeg", GOOD_CAP, 3),
        (4, 500, 500, "jpeg", "the", 4),
    ]
    marked = caption_image_filters(_img(spark, rows))
    stats = {r.reason: r.n_rows for r in curation_stats(marked).collect()}
    assert stats == {"kept": 2, "too_small": 1, "caption_short": 1}
    assert sum(stats.values()) == len(rows)  # single-reason corpus partitions


# ------------------------------------------- cross-modal alignment (CLIP)

def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "image_id bigint, img_vec array<double>, txt_vec array<double>")


def test_alignment_score_exact_orthogonal_zero(spark):
    from fetcho_spark.operators.curation import alignment_score
    rows = [
        (1, [0.5, 0.25, -0.125], [0.5, 0.25, -0.125]),   # identical → 1.0
        (2, [1.0, 0.0], [0.0, 1.0]),                     # orthogonal → 0
        (3, [1.0, 0.0], [-1.0, 0.0]),                    # opposite → -1.0
        (4, [0.0, 0.0], [1.0, 1.0]),                     # zero vec → 0, no NaN
        (5, [0.6, 0.8], [0.6, 0.8]),                     # identical → 1.0
    ]
    got = {r.image_id: r.score_q
           for r in alignment_score(_pairs(spark, rows)).collect()}
    assert got[1] == 1_000_000
    assert got[2] == 0
    assert got[3] == -1_000_000
    assert got[4] == 0
    assert got[5] == 1_000_000


def test_clip_filter_tau_integer_cut(spark):
    from fetcho_spark.operators.curation import clip_score_filter
    # cos([1,0],[c,s]) = c: pick c just above/below tau=0.8
    rows = [
        (1, [1.0, 0.0], [0.81, 0.5]),
        (2, [1.0, 0.0], [0.79, 0.5]),
        (3, [1.0, 0.0], [1.0, 0.0]),
    ]
    out = clip_score_filter(_pairs(spark, rows), tau=0.8)
    got = {r.image_id: r.keep for r in out.collect()}
    import math
    c1 = 0.81 / math.hypot(0.81, 0.5)      # ≈0.851 → keep
    c2 = 0.79 / math.hypot(0.79, 0.5)      # ≈0.845 → keep
    assert got[3] is True
    assert got[1] == (c1 >= 0.8) and got[2] == (c2 >= 0.8)
    with pytest.raises(ValueError):
        clip_score_filter(_pairs(spark, rows))
    with pytest.raises(ValueError):
        clip_score_filter(_pairs(spark, rows), tau=0.5, keep_frac=0.5)


def test_clip_filter_keep_frac_matches_brute_force(spark):
    from fetcho_spark.operators.curation import clip_score_filter
    import math
    # 20 pairs with distinct alignments cos(k*4.5deg)
    rows = []
    for k in range(20):
        a = math.radians(k * 4.5)
        rows.append((k, [1.0, 0.0], [math.cos(a), math.sin(a)]))
    df = _pairs(spark, rows)
    out = clip_score_filter(df, keep_frac=0.25, id_col="image_id")
    got = sorted(r.image_id for r in out.collect() if r.keep)
    # brute force: top floor(0.25*20)=5 by (score desc, id asc) = k=0..4
    assert got == [0, 1, 2, 3, 4]
    # partition invariance: same verdicts at a different parallelism
    out7 = clip_score_filter(df.repartition(7), keep_frac=0.25,
                             id_col="image_id")
    assert sorted(r.image_id for r in out7.collect() if r.keep) == got
