"""Exact quantiles, deterministic histogram, HLL register sketch."""

import hashlib
import math

import pytest

from fetcho_spark.operators.stats import (exact_quantiles, histogram,
                                          hll_estimate, hll_registers)

VALS = [7.5, -2.0, 3.25, 3.25, 11.0, 0.5, 99.0, 3.25, -8.75, 42.0]
ROWS = [(i, v) for i, v in enumerate(VALS)]


def _ref_quantile(vals, pct):
    s = sorted(vals)
    return s[(pct * (len(s) - 1)) // 100]     # 1-based rank -> 0-based idx


@pytest.mark.spark
def test_exact_quantiles_matches_reference(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    got = {r["pct"]: r["value"]
           for r in exact_quantiles(df, "value", "event_id").collect()}
    for pct in (25, 50, 75, 90, 99):
        assert got[pct] == _ref_quantile(VALS, pct), pct
    # duplicates: the median falls inside the 3.25 run
    assert got[50] == 3.25


@pytest.mark.spark
def test_exact_quantiles_partition_invariant(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    base = sorted(map(tuple,
                      exact_quantiles(df, "value", "event_id").collect()))
    rep = sorted(map(tuple,
                     exact_quantiles(df.repartition(7), "value",
                                     "event_id").collect()))
    assert base == rep


@pytest.mark.spark
def test_histogram_bins_and_overflow(spark):
    df = spark.createDataFrame(ROWS, ["event_id", "value"])
    got = {r["bin"]: r["n"]
           for r in histogram(df, "value", 0.0, 10.0, 5).collect()}
    ref = {}
    for v in VALS:
        b = min(max(math.floor((v - 0.0) / 2.0), -1), 5)
        ref[b] = ref.get(b, 0) + 1
    assert got == ref
    assert got[-1] == 2 and got[5] == 3       # under/overflow populated
    assert sum(got.values()) == len(VALS)


def _ref_registers(keys, p=10):
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        reg = h >> (48 - p)
        w = (h >> (48 - p - 32)) & 0xFFFFFFFF
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


@pytest.mark.spark
def test_hll_registers_match_reference_and_merge(spark):
    a = [f"u{i}" for i in range(3000)]
    b = [f"u{i}" for i in range(1500, 4500)]      # overlaps a
    da = spark.createDataFrame([(k,) for k in a], ["k"])
    db = spark.createDataFrame([(k,) for k in b], ["k"])
    ra = {r["register"]: r["max_rho"]
          for r in hll_registers(da, "k").collect()}
    assert ra == _ref_registers(a)
    # duplicates never change the sketch
    rd = {r["register"]: r["max_rho"]
          for r in hll_registers(da.union(da), "k").collect()}
    assert rd == ra
    # merge = max per register == sketch of the union
    rb = {r["register"]: r["max_rho"]
          for r in hll_registers(db, "k").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0))
              for k in set(ra) | set(rb)}
    ru = {r["register"]: r["max_rho"]
          for r in hll_registers(da.union(db), "k").collect()}
    assert merged == ru
    # estimate lands within ~5% at p=10 for 4500 distinct
    est = hll_estimate(list(ru.items()))
    assert abs(est - 4500) / 4500 < 0.05


# ------------------------------------------------------ count-min sketch

def _cms_ref(keys, depth=4, width=1024, weights=None):
    regs = {}
    for i, k in enumerate(keys):
        w = 1 if weights is None else weights[i]
        for r in range(depth):
            h = int(hashlib.md5(f"{r}:{k}".encode()).hexdigest()[:12], 16)
            cell = (r, h % width)
            regs[cell] = regs.get(cell, 0) + w
    return regs


def _cms_ref_est(regs, key, depth=4, width=1024):
    est = None
    for r in range(depth):
        h = int(hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:12], 16)
        c = regs.get((r, h % width), 0)
        est = c if est is None else min(est, c)
    return est


@pytest.mark.spark
def test_cms_registers_match_reference_and_merge(spark):
    from fetcho_spark.operators.stats import cms_registers
    keys = [f"host{i % 50}" for i in range(800)] + ["hot"] * 200
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {(r["row"], r["col"]): r["cnt"]
           for r in cms_registers(df, "k").collect()}
    assert got == _cms_ref(keys)
    # merge = per-cell SUM == sketch of the union
    other = [f"x{i}" for i in range(300)] + ["hot"] * 100
    do = spark.createDataFrame([(k,) for k in other], ["k"])
    ga = got
    gb = {(r["row"], r["col"]): r["cnt"]
          for r in cms_registers(do, "k").collect()}
    merged = {c: ga.get(c, 0) + gb.get(c, 0) for c in set(ga) | set(gb)}
    gu = {(r["row"], r["col"]): r["cnt"]
          for r in cms_registers(df.union(do), "k").collect()}
    assert merged == gu
    # partition invariance
    gp = {(r["row"], r["col"]): r["cnt"]
          for r in cms_registers(df.repartition(7), "k").collect()}
    assert gp == ga


@pytest.mark.spark
def test_cms_estimate_never_underestimates(spark):
    from fetcho_spark.operators.stats import cms_estimate, cms_registers
    import collections
    keys = [f"k{i % 37}" for i in range(500)] + ["whale"] * 77
    true = collections.Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sk = cms_registers(df, "k", depth=3, width=64)  # narrow -> collisions
    cand = spark.createDataFrame([(k,) for k in sorted(true)], ["k"])
    est = {r["k"]: r["est"]
           for r in cms_estimate(sk, cand, "k", depth=3, width=64).collect()}
    regs = _cms_ref(keys, depth=3, width=64)
    for k, n in true.items():
        assert est[k] >= n                       # CMS can only over-count
        assert est[k] == _cms_ref_est(regs, k, depth=3, width=64)
    # absent key estimates only collision mass
    miss = cms_estimate(sk, spark.createDataFrame([("nope",)], ["k"]),
                        "k", depth=3, width=64).collect()[0]["est"]
    assert miss == _cms_ref_est(regs, "nope", depth=3, width=64)


@pytest.mark.spark
def test_cms_heavy_hitters_no_false_negatives(spark):
    from fetcho_spark.operators.stats import cms_heavy_hitters
    keys = (["big"] * 120 + ["mid"] * 60 + ["small"] * 5
            + [f"noise{i}" for i in range(200)])
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    hh = {r["k"]: r["est"]
          for r in cms_heavy_hitters(df, "k", threshold=50).collect()}
    assert "big" in hh and hh["big"] >= 120
    assert "mid" in hh and hh["mid"] >= 60
    assert "small" not in hh or hh["small"] >= 50  # only over-count FPs
    assert all(est >= 50 for est in hh.values())


@pytest.mark.spark
def test_cms_weighted(spark):
    from fetcho_spark.operators.stats import cms_registers
    rows = [("a", 10), ("b", 3), ("a", 5)]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = {(r["row"], r["col"]): r["cnt"]
           for r in cms_registers(df, "k", weight_col="w").collect()}
    assert got == _cms_ref([k for k, _ in rows],
                           weights=[w for _, w in rows])


# ------------------------------------------------------- KMV bottom-k

def _kmv_ref(keys, k):
    hs = sorted({(int(hashlib.md5(str(x).encode()).hexdigest()[:12], 16), x)
                 for x in keys})[:k]
    return [(i, key, h) for i, (h, key) in enumerate(hs)]


@pytest.mark.spark
def test_kmv_sketch_reference_merge_and_estimate(spark):
    from fetcho_spark.operators.stats import kmv_estimate, kmv_sketch
    a = [f"u{i}" for i in range(2000)]
    b = [f"v{i}" for i in range(1500)]
    da = spark.createDataFrame([(x,) for x in a + a], ["k"])  # dups: no-op
    db = spark.createDataFrame([(x,) for x in b], ["k"])
    K = 64
    sa = [(r["rank"], r["key"], r["h"]) for r in kmv_sketch(da, "k", K)
          .collect()]
    assert sa == _kmv_ref(a, K)
    sb = [(r["rank"], r["key"], r["h"]) for r in kmv_sketch(db, "k", K)
          .collect()]
    # merge property: bottom-k of merged sketches == sketch of the union
    merged = sorted({(h, key) for _, key, h in sa + sb})[:K]
    su = [(r["key"], r["h"]) for r in
          kmv_sketch(da.union(db), "k", K).collect()]
    assert [(key, h) for h, key in merged] == su
    # estimate within ~25% at k=64 over 3500 distinct
    est = kmv_estimate(_kmv_ref(a + b, K), K)
    assert abs(est - 3500) / 3500 < 0.25
    # under-full sketch is exact
    small = spark.createDataFrame([("a",), ("b",)], ["k"])
    rows = [tuple(r) for r in kmv_sketch(small, "k", K).collect()]
    assert kmv_estimate(rows, K) == 2.0


@pytest.mark.spark
def test_hll_grouped_equals_per_group_sketches(spark):
    """A grouped sketch row set is exactly the union of the per-group
    sketches built separately — grouping changes the shuffle shape,
    never the registers."""
    from fetcho_spark.operators.stats import hll_registers
    rows = [(f"g{i % 3}", f"u{i % 57}") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    grouped = sorted(tuple(r) for r in
                     hll_registers(df, "uid", by=["grp"]).collect())
    separate = []
    for g in ("g0", "g1", "g2"):
        for r in hll_registers(df.filter(df.grp == g),
                               "uid").collect():
            separate.append((g, r["register"], r["max_rho"]))
    assert grouped == sorted(separate)


@pytest.mark.spark
def test_cms_grouped_equals_per_group_sketches(spark):
    from fetcho_spark.operators.stats import cms_registers
    rows = [(f"g{i % 2}", f"u{i % 23}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    grouped = sorted(tuple(r) for r in
                     cms_registers(df, "uid", width=64,
                                   by=["grp"]).collect())
    separate = []
    for g in ("g0", "g1"):
        for r in cms_registers(df.filter(df.grp == g), "uid",
                               width=64).collect():
            separate.append((g, r["row"], r["col"], r["cnt"]))
    assert grouped == sorted(separate)


@pytest.mark.spark
def test_kmv_grouped_equals_per_group_sketches(spark):
    """Salted-two-window grouped bottom-k equals kmv_sketch run on each
    group separately — the pre-cut never loses a true bottom-k member."""
    from fetcho_spark.operators.stats import kmv_sketch, kmv_sketch_grouped
    rows = [(f"g{i % 3}", f"u{(i * 7) % 41}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    K = 8
    grouped = sorted(tuple(r) for r in
                     kmv_sketch_grouped(df, "uid", k=K, by=["grp"],
                                        n_salts=4).collect())
    separate = []
    for g in ("g0", "g1", "g2"):
        for r in kmv_sketch(df.filter(df.grp == g), "uid", k=K).collect():
            separate.append((g, r["rank"], r["key"], r["h"]))
    assert grouped == sorted(separate)
    # exactly K per group (each group has > K distinct keys)
    from collections import Counter
    assert Counter(g for g, *_ in grouped) == {"g0": K, "g1": K, "g2": K}


@pytest.mark.spark
def test_kmv_null_keys_excluded(spark):
    """NULL keys carry no identity and must not occupy sketch slots
    (Spark NULLS FIRST vs DuckDB NULLS LAST is an engine divergence)."""
    from fetcho_spark.operators.stats import kmv_sketch, kmv_sketch_grouped
    rows = [("g", f"u{i}") for i in range(10)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "grp string, uid string")
    flat = kmv_sketch(df, "uid", k=4).collect()
    grouped = kmv_sketch_grouped(df, "uid", k=4, by=["grp"]).collect()
    assert len(flat) == 4 and all(r["key"] is not None for r in flat)
    assert len(grouped) == 4 and all(r["key"] is not None
                                     for r in grouped)
