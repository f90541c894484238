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
