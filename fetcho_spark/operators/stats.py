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

from pyspark.sql import DataFrame, Window
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


def hll_registers(df: DataFrame, key_col: str, p: int = 10,
                  by: list[str] | None = None) -> DataFrame:
    """HyperLogLog register table → ``(register, max_rho)`` — the
    mergeable distinct-count sketch as DATA, not a binary blob. With
    ``by``, one sketch per group → ``(*by, register, max_rho)`` (the
    distinct-URLs-per-host shape: ≤ |groups|·2^p rows, one partial-agg
    shuffle — a grouped exact distinct would shuffle the raw keys).

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
    grp = list(by or [])
    return (df.select(*[F.col(c) for c in grp],
                      reg.alias("register"), rho.alias("rho"))
            .groupBy(*grp, "register")
            .agg(F.max("rho").alias("max_rho")))


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


def cms_registers(df: DataFrame, key_col: str, depth: int = 4,
                  width: int = 1024, weight_col: str | None = None,
                  by: list[str] | None = None) -> DataFrame:
    """Count-min sketch as DATA → ``(row, col, cnt)`` register table.
    With ``by``, one sketch per group → ``(*by, row, col, cnt)`` (e.g.
    per-day URL-frequency sketches: ≤ |groups|·depth·width rows, one
    partial-agg shuffle, mergeable across groups by per-cell SUM).

    The bounded-memory heavy-hitter summary (Cormode & Muthukrishnan
    2005): ``depth`` independent hash rows of ``width`` counters; a
    key's estimate is the MIN of its ``depth`` counters and can only
    OVER-estimate. Row ``r``'s hash is ``md5("r:" || key)`` (first 48
    bits, mod ``width``) — the repo's cross-engine hash, so sketches
    built by different systems (Spark today, a stream processor
    tomorrow) are register-exact and MERGE by summing per (row, col):
    associative, commutative, partition-invariant.

    Scale shape: one ``depth``-way explode + one partial-aggregated
    groupBy over ≤ depth×width groups — the corpus never shuffles on
    the key, and the summary stays ≤ depth×width rows no matter how
    many distinct keys (hot hosts, URL shingles) flow through. Use
    exact ``groupBy(key)`` when a full-key shuffle is affordable; the
    sketch is for streaming merges and bounded-memory profiles.
    ``weight_col`` (optional, cast to long) turns it into a weighted
    frequency sketch (e.g. bytes per host instead of fetches per host).
    """
    cells = [
        F.struct(
            F.lit(r).cast("int").alias("row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{r}:"),
                               F.col(key_col).cast("string"))), 1, 12),
                16, 10).cast("long") % width).cast("int").alias("col"))
        for r in range(depth)]
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    grp = list(by or [])
    return (df.select(*[F.col(c) for c in grp],
                      F.explode(F.array(*cells)).alias("_rc"),
                      w.alias("_w"))
            .select(*grp, F.col("_rc.row").alias("row"),
                    F.col("_rc.col").alias("col"), "_w")
            .groupBy(*grp, "row", "col").agg(F.sum("_w").alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query a count-min sketch for each key row → ``(key_col,
    est)``. ``est >= true count`` always (min over rows of an
    over-counted cell); equality when no collisions.

    Scale shape: the sketch is ≤ depth×width rows — broadcast it; the
    candidate keys explode ``depth``-ways and join the broadcast with
    ZERO shuffle of the candidate set beyond the final per-key min agg.
    """
    cells = [
        F.struct(
            F.lit(r).cast("int").alias("row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{r}:"),
                               F.col(key_col).cast("string"))), 1, 12),
                16, 10).cast("long") % width).cast("int").alias("col"))
        for r in range(depth)]
    probes = (keys.select(key_col,
                          F.explode(F.array(*cells)).alias("_rc"))
              .select(key_col, F.col("_rc.row").alias("row"),
                      F.col("_rc.col").alias("col")))
    return (probes.join(F.broadcast(sketch), ["row", "col"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est")))


def cms_heavy_hitters(df: DataFrame, key_col: str, threshold: int,
                      depth: int = 4, width: int = 1024) -> DataFrame:
    """Keys whose sketch estimate ≥ ``threshold`` → ``(key_col, est)``.

    One-pass candidate generation + broadcast sketch probe. No false
    negatives (estimates only over-count); possible false positives
    from collisions, bounded by the standard CMS guarantee
    (ε = e/width of total mass at δ = e^-depth). At crawl scale this
    is the hot-host detector: the sketch absorbs 10^10 frontier rows
    into depth×width counters, and only the (bounded) distinct
    candidate set ever probes it.
    """
    sketch = cms_registers(df, key_col, depth, width)
    cands = df.select(key_col).distinct()
    est = cms_estimate(sketch, cands, key_col, depth, width)
    return est.filter(F.col("est") >= threshold)


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Bottom-k (KMV) sketch as DATA → ``(rank, key, h)``: the ``k``
    distinct keys with the smallest 48-bit md5 hash values.

    The third leg of the sketch family (HLL = distinct counts, CMS =
    frequencies, KMV = a UNIFORM DISTINCT-KEY SAMPLE plus a distinct
    estimate): because md5 is a fixed function of the key, the bottom-k
    set is deterministic, duplicate-invariant, and MERGEABLE — the
    bottom-k of the union is the bottom-k of the merged sketches, so
    per-day/per-system sketches combine exactly. Ties on h (48-bit
    collisions between distinct keys) break on the key itself, keeping
    the sketch total-ordered in any engine.

    Scale shape: one distinct over keys (bounded by distinct
    cardinality, map-side combined) then ``orderBy().limit(k)`` —
    Spark's TakeOrderedAndProject: per-partition bottom-k, merged at
    the driver, never a global sort. Use :func:`kmv_estimate` on the
    collected rows.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12),
               16, 10).cast("long")
    bottom = (df.filter(F.col(key_col).isNotNull())  # see grouped note
              .select(F.col(key_col).alias("key"), h.alias("h"))
              .distinct()
              .orderBy("h", "key").limit(k))
    w = Window.orderBy("h", "key")
    return bottom.select(
        (F.row_number().over(w) - 1).cast("int").alias("rank"),
        "key", "h")


def kmv_sketch_grouped(df: DataFrame, key_col: str, k: int = 256,
                       by: list[str] | None = None,
                       n_salts: int = 32) -> DataFrame:
    """Per-group bottom-k sketch → ``(*by, rank, key, h)``: one uniform
    distinct-key sample per group (per-source held-out URL samples,
    per-day merges). Completes the grouped-sketch family (hll/cms
    ``by=``; KMV needs its own shape because bottom-k is an ORDER
    statistic, not a cell-wise agg).

    Scale shape: a single-window form would funnel each group's whole
    distinct-key set through one task; instead a salted pre-cut
    (per-(group, h%n_salts) bottom-k — each salt cell holds ~1/n_salts
    of the group) keeps every window bounded, then the final per-group
    window ranks at most ``n_salts·k`` survivors. Correct because the
    true per-group bottom-k is a subset of the union of the per-salt
    bottom-ks.
    """
    grp = [F.col(c) for c in (by or [])]
    # NULL keys carry no identity and would rank first under Spark's
    # NULLS FIRST (displacing a real member; DuckDB orders NULLS LAST —
    # an engine divergence) — excluded from the sample
    d = (df.filter(F.col(key_col).isNotNull())
         .select(*grp, F.col(key_col).alias("key"))
         .distinct()
         .withColumn("h", F.conv(F.substring(
             F.md5(F.col("key").cast("string")), 1, 12), 16, 10)
             .cast("long"))
         .withColumn("_salt", (F.col("h") % n_salts).cast("int")))
    gcols = list(by or [])
    w1 = Window.partitionBy(*gcols, "_salt").orderBy("h", "key")
    cand = (d.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k))
    w2 = Window.partitionBy(*gcols).orderBy("h", "key")
    return (cand.withColumn("rank",
                            (F.row_number().over(w2) - 1).cast("int"))
            .filter(F.col("rank") < k)
            .select(*gcols, "rank", "key", "h"))


def kmv_estimate(rows: list[tuple], k: int) -> float | None:
    """Distinct-count estimate from collected ``(rank, key, h)`` rows:
    ``(k - 1) / (h_k / 2^48)`` when the sketch is full, else the exact
    row count (fewer than k distinct keys = we saw them all)."""
    if len(rows) < k:
        return float(len(rows))
    hk = max(int(r[2]) for r in rows)
    return (k - 1) / (hk / float(1 << 48))
