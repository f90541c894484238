"""Distributed as-of join — the temporal operator Spark lacks.

``asof_join(left, right)`` attaches to every left row the single right
row with the greatest ``on`` value at-or-before it (backward; or the
smallest at-or-after, forward) within the same ``by`` group — kdb's
``aj``, pandas' ``merge_asof``, Flink's temporal join. The crawl-native
uses: join each fetch to the robots snapshot in force at fetch time, a
frontier decision to the latest host-state row, an event to the most
recent error in its session (the gate query's shape).

Implementation is the classic single-shuffle union trick — NOT a
point-in-interval join (which Spark plans as a broadcast-nested-loop or
a cartesian at scale):

1. union the two sides with aligned schemas — the right payload packed
   into ONE struct column that is null on left rows (whole-row
   semantics: a matched row's genuinely-NULL payload field rides
   through, never back-filled from an older row) — tagged ``_side``
   (right = 0, left = 1);
2. one window per ``by`` group ordered by ``(on, _side, tiebreak)``,
   ``last(struct, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT
   — each left row sees exactly the latest right row at-or-before it
   (right sorts before left at equal ``on``, so the match is inclusive;
   ``strict=True`` flips the tie order to exclude equal timestamps);
3. keep the left rows, unpack the struct fields.

Scale shape: ONE shuffle of |left|+|right| rows on the ``by`` columns,
then a sequential pass per group (the unavoidable order dependence of
as-of semantics). A pathologically hot key serializes its own group —
the standard trade every engine's as-of makes; split such keys upstream
(session windows, time bucketing) if one group outgrows a task.

Determinism: the window order must be TOTAL per group or equal-``on``
right rows make the match partition-dependent — pass ``right_tiebreak``
(e.g. an event id; the LARGEST wins) when right keys can collide on
``on``. The gate twin is DuckDB's NATIVE ``ASOF JOIN`` — an independent
implementation, not a mirrored transcription — with both engines
pre-deduplicating right rows per (by, on) so the match is well-defined
in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def interval_join(left: DataFrame, right: DataFrame, on: str = "ts",
                  by: list[str] | str = "user_id",
                  lower: int = -60, upper: int = 60,
                  right_cols: list[str] | None = None,
                  suffix: str = "_r",
                  bucket: int | None = None) -> DataFrame:
    """Range join: every (left, right) pair in the same ``by`` group
    with ``l.on + lower <= r.on <= l.on + upper`` (seconds for
    timestamps — ``on`` is compared on its long cast; bounds inclusive).

    The scale shape Spark lacks natively (a bare inequality join plans
    as a broadcast-nested-loop / cartesian): right rows key by their
    time bucket (``floor(t / bucket)``), left rows EXPLODE to the
    ≤ ⌈(upper-lower)/bucket⌉+1 buckets their window spans, and the pair
    space shrinks to an equi-join on (by, bucket) + an exact range
    filter. A right row has ONE bucket and the left's exploded buckets
    are distinct, so each matching pair appears exactly once — no
    dedup pass. ``bucket`` defaults to the window width (one-ish extra
    candidate bucket per row); a hot (by, bucket) cell is the usual
    skew trade — narrow ``bucket`` to split it.
    """
    from pyspark.sql import types as T
    by = [by] if isinstance(by, str) else list(by)
    assert bucket is None or bucket > 0, "bucket must be positive"
    width = int(bucket if bucket is not None else max(upper - lower, 1))
    right_cols = list(right_cols or
                      [c for c in right.columns
                       if c not in by and c != on])

    def _secs(col, dtype):
        # TIMESTAMP_NTZ refuses a long cast in Spark 4; unix_timestamp
        # floors to epoch seconds for both timestamp flavors
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_timestamp(col)
        return col.cast("long")

    lt = _secs(F.col(on), left.schema[on].dataType)
    l_b = left.withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor((lt + F.lit(lower)) / F.lit(width)).cast("long"),
            F.floor((lt + F.lit(upper)) / F.lit(width)).cast("long"))))
    r_b = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]) \
        .withColumn("_bkt",
                    F.floor(_secs(F.col(f"{on}{suffix}"),
                                  right.schema[on].dataType)
                            / F.lit(width)).cast("long"))
    j = l_b.join(r_b, [*by, "_bkt"])
    rt = _secs(F.col(f"{on}{suffix}"), right.schema[on].dataType)
    return (j.filter((rt >= lt + F.lit(lower)) & (rt <= lt + F.lit(upper)))
            .drop("_bkt"))


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: list[str] | str = "user_id",
              right_cols: list[str] | None = None,
              direction: str = "backward", strict: bool = False,
              suffix: str = "_r",
              right_tiebreak: str | None = None,
              tolerance=None) -> DataFrame:
    """Left as-of join → every left row + the matched right row's
    ``right_cols`` (and ``on``) with ``suffix``; unmatched rows keep
    nulls. ``tolerance`` (same units as ``on`` casts to long — SECONDS
    for timestamps, the value itself for numerics) voids matches
    further than that from the left row."""
    from pyspark.sql import types as T
    assert direction in ("backward", "forward")
    by = [by] if isinstance(by, str) else list(by)
    reserved = {"_on", "_side", "_tb", "_r", "_rl"}
    clash = (reserved & set(left.columns)) | (reserved & set(right.columns))
    assert not clash, f"input columns collide with internals: {clash}"
    right_cols = list(right_cols or
                      [c for c in right.columns
                       if c not in by and c != on])
    lcols = [c for c in left.columns if c not in by and c != on]

    # All right payload columns ride in ONE struct: the struct itself is
    # non-null exactly for right rows, so last(_r, ignorenulls=True)
    # carries a matched row's genuinely-NULL payload fields through
    # intact instead of back-filling each column from an older row
    # (whole-row semantics, matching pandas merge_asof / DuckDB ASOF).
    r_struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField("_on", right.schema[on].dataType)])
    l_side = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType
                         if right_tiebreak else "long").alias("_tb"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_t).alias("_r"))
    r_side = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        (F.col(right_tiebreak) if right_tiebreak
         else F.lit(0).cast("long")).alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_cols],
                 F.col(on).alias("_on")).alias("_r"))
    u = l_side.unionByName(r_side)

    asc = direction == "backward"
    onk = F.col("_on").asc() if asc else F.col("_on").desc()
    # inclusive: right (side 0) sorts before left at equal `on`;
    # strict: left first, so an equal-`on` right row is not yet visible
    sidek = (F.col("_side").desc() if strict else F.col("_side").asc())
    w = (Window.partitionBy(*by)
         .orderBy(onk, sidek, F.col("_tb").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = u.select(
        *by, "_on", "_side", *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_rl"))
    out = (matched.filter(F.col("_side") == 1)
           .select(
               *by, "_on", *lcols,
               *[F.col("_rl")[c].alias(f"{c}{suffix}") for c in right_cols],
               F.col("_rl")["_on"].alias(f"{on}{suffix}"))
           .withColumnRenamed("_on", on))
    if tolerance is not None:
        from pyspark.sql import types as T
        dt = left.schema[on].dataType

        def _secs(col):
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                return F.unix_timestamp(col)
            return col.cast("long")

        lo = _secs(F.col(on))
        ro = _secs(F.col(f"{on}{suffix}"))
        gap = (lo - ro) if asc else (ro - lo)
        bad = F.col(f"{on}{suffix}").isNotNull() & (gap > F.lit(tolerance))
        for c in [*right_cols, on]:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(bad, F.lit(None)).otherwise(F.col(f"{c}{suffix}")))
    return out
