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


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """HyperLogLog register table → ``(register, max_rho)`` — the
    mergeable distinct-count sketch as DATA, not a binary blob.

    The hash is md5 (the repo's cross-engine hash): the top ``p`` bits
    of the first 48 hash bits pick the register, the next 32 bits feed
    rho (leading-zero count + 1, capped at 33 when those bits are 0).
    Registers are integer-exact in any engine, so sketches built by
    different systems MERGE correctly (max per register — associative,
    commutative, partition-invariant) and the gate can hash-check the
    sketch itself rather than the estimate.

    Scale shape: one projection + one partial-aggregated groupBy over
    ≤ 2^p groups; union-merge of two sketches is another ≤ 2^p-row agg.
    Use :func:`hll_estimate` driver-side on the collected registers.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12),
               16, 10).cast("long")                     # 48 hash bits
    reg = F.shiftright(h, 48 - p)
    tail = h.bitwiseAND(F.lit((1 << (48 - p)) - 1))
    # rho over the 32 bits below the register index; floor(log2) taken as
    # binary-digit count (exact string op — float log2 could round a
    # power-of-2 boundary differently across engines)
    w = F.shiftright(tail, 48 - p - 32).bitwiseAND(F.lit((1 << 32) - 1))
    rho = F.when(w == 0, F.lit(33)).otherwise(
        33 - F.length(F.conv(w, 10, 2))).cast("int")
    return (df.select(reg.alias("register"), rho.alias("rho"))
            .groupBy("register").agg(F.max("rho").alias("max_rho")))


def hll_estimate(registers: list[tuple], p: int = 10) -> float:
    """Standard HLL estimate from collected ``(register, max_rho)`` rows
    (driver-side; the register table is ≤ 2^p rows by construction)."""
    m = 1 << p
    rho = {int(r): int(x) for r, x in registers}
    s = sum(2.0 ** -rho.get(i, 0) for i in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    zeros = m - len(rho)
    if est <= 2.5 * m and zeros:
        import math
        est = m * math.log(m / zeros)
    return est


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
