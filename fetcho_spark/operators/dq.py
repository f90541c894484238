"""Data-quality verification as MERGEABLE profile states (Deequ-shape,
and the differential idea of Schelter et al., "Differential Data Quality
Verification on Partitioned Data", ICDE 2019).

A perpetual 100 TB ingest can't re-scan the corpus to re-verify
constraints after every append. The fix is algebraic: per-column profile
METRICS are computed as associative/commutative states (counts, nulls,
empties, min/max, quantized sums), so

- ``profile(A union B) == merge_profiles(profile(A), profile(B))``
  exactly (the mergeability law, property-tested), and
- verifying an appended snapshot costs one scan of the NEW rows only:
  profile the increment (``Catalog.read_incremental`` — the same
  incremental read the crawl loop uses), merge with the stored state,
  check constraints against the merged state (tested end-to-end).

Cross-engine exactness: counts are BIGINTs; min/max pass values through
untouched (order-independent); sums of DOUBLE columns are NEVER float
sums — values quantize to semdedup's 1e-6 integer grid first, so the
sum is an exact BIGINT in any partitioning and any engine (the repo's
standing no-float-accumulation rule). Every constraint comparison is an
integer cross-multiplication (``100 * n_null <= pct * n_rows``).

Scale shape: ONE map-side-combined aggregation pass per profile (a
single 1-row partial agg regardless of column count), exploded to the
long (column, metric) form; merge is a groupBy over |columns|x|metrics|
rows; checks are a broadcast join against a literal rules table. No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .semdedup import GRID

__all__ = ["profile", "merge_profiles", "check", "RULE_OPS"]

# long-form profile schema: (column, metric, value)
# metrics: n_rows, n_null, n_empty (strings), min_q / max_q / sum_q
# (numerics, 1e-6-grid BIGINT), min_s / max_s (strings, lexicographic)


def _q(col):
    return F.floor(col.cast("double") * F.lit(float(GRID))
                   + F.lit(0.5)).cast("long")


def profile(df: DataFrame, num_cols: list[str],
            str_cols: list[str] | None = None) -> DataFrame:
    """One-pass mergeable profile → ``(column, metric, value)`` with
    BIGINT values (numeric min/max/sum on the 1e-6 grid; string min/max
    ride separately as ``(column, metric, value_s)`` rows with value
    null). All metrics over all columns compute in a SINGLE partial
    aggregation."""
    str_cols = str_cols or []
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in num_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"_null_{c}"),
            F.min(_q(F.col(c))).alias(f"_min_{c}"),
            F.max(_q(F.col(c))).alias(f"_max_{c}"),
            F.sum(_q(F.col(c))).alias(f"_sum_{c}"),
        ]
    for c in str_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"_null_{c}"),
            F.sum(F.when(F.col(c) == "", 1).otherwise(0))
            .alias(f"_empty_{c}"),
            F.min(F.col(c)).alias(f"_smin_{c}"),
            F.max(F.col(c)).alias(f"_smax_{c}"),
        ]
    one = df.agg(*aggs)

    rows = []
    for c in num_cols:
        for metric, expr in [("n_rows", F.col("_n")),
                             ("n_null", F.col(f"_null_{c}")),
                             ("min_q", F.col(f"_min_{c}")),
                             ("max_q", F.col(f"_max_{c}")),
                             ("sum_q", F.col(f"_sum_{c}"))]:
            rows.append(F.struct(F.lit(c).alias("column"),
                                 F.lit(metric).alias("metric"),
                                 expr.cast("long").alias("value"),
                                 F.lit(None).cast("string")
                                 .alias("value_s")))
    for c in str_cols:
        for metric, expr, sexpr in [
                ("n_rows", F.col("_n"), F.lit(None).cast("string")),
                ("n_null", F.col(f"_null_{c}"),
                 F.lit(None).cast("string")),
                ("n_empty", F.col(f"_empty_{c}"),
                 F.lit(None).cast("string")),
                ("min_s", F.lit(None).cast("long"), F.col(f"_smin_{c}")),
                ("max_s", F.lit(None).cast("long"), F.col(f"_smax_{c}"))]:
            rows.append(F.struct(F.lit(c).alias("column"),
                                 F.lit(metric).alias("metric"),
                                 expr.cast("long").alias("value"),
                                 sexpr.alias("value_s")))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.column", "r.metric", "r.value", "r.value_s"))


_MERGE = {"n_rows": "sum", "n_null": "sum", "n_empty": "sum",
          "sum_q": "sum", "min_q": "min", "max_q": "max",
          "min_s": "min", "max_s": "max"}


def merge_profiles(*profiles: DataFrame) -> DataFrame:
    """Associative merge of profile states: counts add, mins min, maxes
    max — ``merge(profile(A), profile(B)) == profile(A union B)``
    exactly (null-safe: a min_q over an all-null increment stays null
    until a real value merges in)."""
    allp = profiles[0]
    for p in profiles[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy("column", "metric")
            .agg(F.when(F.first("metric").isin("min_q"), F.min("value"))
                 .when(F.first("metric").isin("max_q"), F.max("value"))
                 .when(F.first("metric").isin("min_s", "max_s"),
                       F.lit(None).cast("long"))
                 .otherwise(F.sum("value")).alias("value"),
                 F.when(F.first("metric") == "min_s", F.min("value_s"))
                 .when(F.first("metric") == "max_s", F.max("value_s"))
                 .otherwise(F.lit(None).cast("string")).alias("value_s")))


# constraint ops over the long profile — every comparison integer-exact
RULE_OPS = ("completeness_pct_ge",  # 100*(n_rows-n_null) >= pct*n_rows
            "min_q_ge", "max_q_le", "n_empty_eq")


def check(profile_df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Verify constraints against a (possibly merged) profile state →
    one row per rule: ``(column, op, threshold, observed, ok)``.
    ``rules`` = [(column, op, threshold_int)] with op in RULE_OPS;
    thresholds for *_q ops are on the 1e-6 grid. The profile pivots to
    one row per column (|columns| rows) and the literal rules table
    broadcast-joins against it. Accepts a unioned-but-not-merged
    profile (duplicate (column, metric) rows — e.g. two profile()
    outputs unioned directly): rows merge with each metric's proper op
    first, so verdicts are deterministic either way."""
    for _c, op, _t in rules:
        if op not in RULE_OPS:
            raise ValueError(f"unknown rule op: {op}")
    spark = profile_df.sparkSession
    # merge_profiles is idempotent on merged input and applies the
    # per-metric op (sum/min/max) to duplicates, so the pivot's first()
    # below only ever sees one row per (column, metric) cell
    merged = merge_profiles(profile_df)
    # explicit pivot values: the metric vocabulary is closed (defined by
    # profile()), and naming it avoids the eager distinct-values job
    wide = (merged.groupBy("column")
            .pivot("metric", ["n_rows", "n_null", "n_empty",
                              "min_q", "max_q", "sum_q"])
            .agg(F.first("value")))
    rdf = spark.createDataFrame(
        [(c, op, int(t)) for c, op, t in rules],
        "column string, op string, threshold long")
    j = rdf.join(F.broadcast(wide), "column", "left")

    def _m(name):
        return (F.col(name) if name in wide.columns
                else F.lit(None).cast("long"))

    observed = (F.when(F.col("op") == "completeness_pct_ge",
                       F.lit(100) * (_m("n_rows") - _m("n_null")))
                .when(F.col("op") == "min_q_ge", _m("min_q"))
                .when(F.col("op") == "max_q_le", _m("max_q"))
                .when(F.col("op") == "n_empty_eq", _m("n_empty")))
    ok = (F.when(F.col("op") == "completeness_pct_ge",
                 F.lit(100) * (_m("n_rows") - _m("n_null"))
                 >= F.col("threshold") * _m("n_rows"))
          .when(F.col("op") == "min_q_ge", _m("min_q")
                >= F.col("threshold"))
          .when(F.col("op") == "max_q_le", _m("max_q")
                <= F.col("threshold"))
          .when(F.col("op") == "n_empty_eq", _m("n_empty")
                == F.col("threshold")))
    return j.select("column", "op", "threshold",
                    observed.cast("long").alias("observed"),
                    F.coalesce(ok, F.lit(False)).alias("ok"))
