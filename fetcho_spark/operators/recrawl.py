"""Adaptive recrawl scheduling from revalidation history.

The engine already refetches after a fixed TTL with If-Modified-Since
revalidation (CrawlConfig.ttl_ms / revalidation; the reference's 28-day
Site TTL, common/Site.cs:18-20, is likewise fixed). A 10^10-URL crawl
cannot afford a uniform revisit period: news pages change hourly,
archives never — the classic freshness-scheduling result (Cho &
Garcia-Molina 2003, "Effective Page Refresh Policies for Web Crawlers")
is to space revisits inversely to each page's OBSERVED change rate.

This operator derives that schedule from data the crawl already has: the
log of refetch outcomes, where a 304 means "unchanged since last visit"
and a 200 on a revisit means "changed". Everything is integer arithmetic
(gap = floor(observations / changes), clamped), so the schedule is
bit-identical in any engine and across partitionings — crawl ordering
must stay a pure function of data.

Scale shape: ONE partial-aggregated groupBy(url) over the history (the
count/max aggregates combine map-side), then a zero-shuffle projection.
Output is one row per distinct URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_GAP = 1      # never revisit more than once per round
MAX_GAP = 64     # never wait longer than this many rounds


def recrawl_schedule(history: DataFrame, url_col: str = "url",
                     round_col: str = "round",
                     changed_col: str = "changed",
                     min_gap: int = MIN_GAP,
                     max_gap: int = MAX_GAP) -> DataFrame:
    """Per-URL revisit schedule → ``(url, n_obs, n_changed, gap,
    next_due)``.

    ``history`` holds one row per REVISIT outcome: ``changed`` true for
    a 200 (content changed since last fetch), false for a 304. The gap
    is ``floor(n_obs / n_changed)`` rounds — a page that changed on
    every revisit is re-queued next round, one that changed once in 32
    visits waits 32 — clamped to ``[min_gap, max_gap]``; a page never
    seen changed waits ``max_gap``. ``next_due`` = last observed round
    + gap. Integer-exact by construction.
    """
    agg = (history.groupBy(F.col(url_col).alias("url"))
           .agg(F.count("*").alias("n_obs"),
                F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
                F.max(F.col(round_col)).cast("long").alias("_last")))
    gap = F.when(F.col("n_changed") == 0, F.lit(max_gap)).otherwise(
        F.least(F.lit(max_gap),
                F.greatest(F.lit(min_gap),
                           F.floor(F.col("n_obs") / F.col("n_changed")))))
    return (agg.withColumn("gap", gap.cast("long"))
            .withColumn("next_due", (F.col("_last") + F.col("gap"))
                        .cast("long"))
            .drop("_last"))


def due_urls(schedule: DataFrame, current_round: int) -> DataFrame:
    """URLs whose revisit is due at ``current_round`` — the frontier
    feed: one zero-shuffle filter over the schedule table."""
    return schedule.filter(F.col("next_due") <= current_round) \
        .select("url")
