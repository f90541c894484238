"""Exact distributed order statistics and histograms.

The reference surfaces result counts and random pages but no numeric
profiling; a 100 TB training-data pipeline needs corpus profiling
(token-length quantiles, score distributions) that is EXACT and
reproducible — ``approxQuantile`` answers differ run to run, which
poisons byte-identical pipeline goldens.

Scale shape: the k-th order statistic reuses
``priority.with_global_seq`` (range-partition + per-partition rank +
bounded offsets window) — the classic exact-quantile-without-
global-sort construction; no corpus ever funnels through one task and
only the requested ranks join out (broadcast of a ≤len(pcts)-row
table). The histogram is one zero-shuffle projection + one
partial-aggregated groupBy over ≤ nbins+2 groups.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .priority import with_global_seq

DEFAULT_PCTS = (25, 50, 75, 90, 99)


def exact_quantiles(df: DataFrame, value_col: str, key_col: str,
                    pcts: tuple = DEFAULT_PCTS) -> DataFrame:
    """Exact percentile values → ``(pct, value)``.

    ``pct`` are integer percents; the returned value is the element at
    1-based rank ``(pct * (n - 1)) // 100 + 1`` of the sorted multiset
    (lower-nearest-rank semantics, integer-exact in any engine).
    ``key_col`` breaks ties so the sort key is total — the selected
    VALUE is tiebreak-independent. Values pass through untouched, so
    even float columns compare bit-exactly across engines.
    """
    n = df.count()                       # one scalar to the driver
    spark = df.sparkSession
    ks = [(int(p), (int(p) * (n - 1)) // 100 + 1) for p in pcts]
    kdf = spark.createDataFrame(ks, "pct: int, _k: long")
    seqd = with_global_seq(df.select(value_col, key_col),
                           sort_cols=(value_col, key_col),
                           out_col="_seq", out_type="long")
    return (seqd.join(F.broadcast(kdf),
                      seqd["_seq"] + 1 == kdf["_k"])
            .select("pct", F.col(value_col).alias("value"))
            .orderBy("pct"))


def histogram(df: DataFrame, value_col: str, lo: float, hi: float,
              nbins: int) -> DataFrame:
    """Fixed-width histogram → ``(bin, n)`` with bin -1 = underflow and
    ``nbins`` = overflow. Bin width is ``(hi - lo) / nbins`` in IEEE
    double — the same two correctly-rounded operations in any engine,
    so bin edges (and therefore counts) are deterministic."""
    width = (hi - lo) / nbins
    v = F.col(value_col)
    raw = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
    b = F.least(F.greatest(raw, F.lit(-1)), F.lit(nbins))
    return (df.select(b.alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("n")))
