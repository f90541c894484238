"""Data-quality states (operators/dq.py): mergeability law, incremental
verification over catalog snapshots, constraint semantics, exactness."""

import tempfile

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators import dq

pytestmark = [pytest.mark.spark]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, qty double, price double, flag string")


ROWS_A = [(1, 1.5, 10.0, "N"), (2, None, 20.25, "R"), (3, 3.0, None, "")]
ROWS_B = [(4, -2.5, 40.0, None), (5, 7.0, 50.5, "A")]

NUM, STR = ["qty", "price"], ["flag"]


def _m(prof):
    return {(r["column"], r["metric"]): (r["value"], r["value_s"])
            for r in prof.collect()}


def test_profile_values_exact(spark):
    p = _m(dq.profile(_df(spark, ROWS_A), NUM, STR))
    assert p[("qty", "n_rows")][0] == 3
    assert p[("qty", "n_null")][0] == 1
    assert p[("qty", "min_q")][0] == 1_500_000
    assert p[("qty", "max_q")][0] == 3_000_000
    assert p[("qty", "sum_q")][0] == 4_500_000
    assert p[("price", "sum_q")][0] == 30_250_000
    assert p[("flag", "n_empty")][0] == 1
    assert p[("flag", "min_s")][1] == "" and p[("flag", "max_s")][1] == "R"


def test_mergeability_law(spark):
    whole = _m(dq.profile(_df(spark, ROWS_A + ROWS_B), NUM, STR))
    merged = _m(dq.merge_profiles(
        dq.profile(_df(spark, ROWS_A), NUM, STR),
        dq.profile(_df(spark, ROWS_B), NUM, STR)))
    assert merged == whole
    # three-way associativity, arbitrary split
    merged3 = _m(dq.merge_profiles(
        dq.profile(_df(spark, ROWS_A[:1]), NUM, STR),
        dq.profile(_df(spark, ROWS_A[1:]), NUM, STR),
        dq.profile(_df(spark, ROWS_B), NUM, STR)))
    assert merged3 == whole


def test_check_constraints(spark):
    prof = dq.profile(_df(spark, ROWS_A + ROWS_B), NUM, STR)
    out = {(r["column"], r["op"]): (r["observed"], r["ok"])
           for r in dq.check(prof, [
               ("qty", "completeness_pct_ge", 80),   # 4/5 = 80% -> ok
               ("price", "completeness_pct_ge", 81),  # 4/5 < 81% -> fail
               ("qty", "min_q_ge", 0),                # min -2.5 -> fail
               ("price", "max_q_le", 51_000_000),     # max 50.5 -> ok
               ("flag", "n_empty_eq", 1),             # one '' -> ok
               ("missing", "min_q_ge", 0),            # absent col -> fail
           ]).collect()}
    assert out[("qty", "completeness_pct_ge")] == (400, True)
    assert out[("price", "completeness_pct_ge")] == (400, False)
    assert out[("qty", "min_q_ge")] == (-2_500_000, False)
    assert out[("price", "max_q_le")] == (50_500_000, True)
    assert out[("flag", "n_empty_eq")] == (1, True)
    assert out[("missing", "min_q_ge")][1] is False


def test_check_on_unmerged_union_is_deterministic(spark):
    """ADVICE r5 regression: check() handed a unioned-but-NOT-merged
    profile (duplicate (column, metric) rows) must verdict exactly as on
    the properly merged profile — duplicates merge with each metric's
    own op, not a nondeterministic first()."""
    pa = dq.profile(_df(spark, ROWS_A), NUM, STR)
    pb = dq.profile(_df(spark, ROWS_B), NUM, STR)
    rules = [("qty", "completeness_pct_ge", 80),
             ("qty", "min_q_ge", -3_000_000),
             ("price", "max_q_le", 50_500_000),
             ("flag", "n_empty_eq", 1)]
    unmerged = pa.unionByName(pb).repartition(7)

    def _chk(prof):
        return {(r["column"], r["op"]): (r["observed"], r["ok"])
                for r in dq.check(prof, rules).collect()}

    assert _chk(unmerged) == _chk(dq.merge_profiles(pa, pb))
    # n_rows must be the UNION total (5), not one increment's first()
    got = _chk(unmerged)
    assert got[("qty", "completeness_pct_ge")] == (100 * (5 - 1), True)


def test_unknown_rule_op_raises(spark):
    prof = dq.profile(_df(spark, ROWS_A), NUM, STR)
    with pytest.raises(ValueError):
        dq.check(prof, [("qty", "mean_between", 0)])


def test_partition_invariance(spark):
    df = _df(spark, ROWS_A + ROWS_B)
    a = _m(dq.profile(df.repartition(1), NUM, STR))
    b = _m(dq.profile(df.repartition(7), NUM, STR))
    assert a == b


def test_incremental_verification_over_catalog(spark):
    """The differential-verification loop: profile ONLY the appended
    snapshot increment, merge with the stored state, re-check — equals
    profiling the whole table."""
    from fetcho_spark.catalog import Catalog
    with tempfile.TemporaryDirectory() as td:
        cat = Catalog(spark, td)
        cat.append("t", _df(spark, ROWS_A))
        s1 = cat.current_snapshot_id("t")
        state = dq.profile(cat.read("t"), NUM, STR)
        cat.append("t", _df(spark, ROWS_B))
        inc = cat.read_incremental("t", s1)
        assert inc.count() == len(ROWS_B)  # increment, not the table
        merged = dq.merge_profiles(state, dq.profile(inc, NUM, STR))
        assert _m(merged) == _m(dq.profile(cat.read("t"), NUM, STR))
        ok = {r["op"]: r["ok"] for r in dq.check(
            merged, [("qty", "min_q_ge", 0)]).collect()}
        assert ok["min_q_ge"] is False  # ROWS_B introduced the negative


def test_all_null_increment_merges(spark):
    base = dq.profile(_df(spark, ROWS_A), NUM, STR)
    nulls = dq.profile(
        _df(spark, [(9, None, None, None)]), NUM, STR)
    merged = _m(dq.merge_profiles(base, nulls))
    whole = _m(dq.profile(
        _df(spark, ROWS_A + [(9, None, None, None)]), NUM, STR))
    assert merged == whole
    assert merged[("qty", "min_q")][0] == 1_500_000  # null min ignored


def test_streaming_incremental_profile(spark):
    """Streaming form of the differential loop: profile each micro-batch
    in foreachBatch and fold it into a running state with
    merge_profiles — after the stream drains, the folded state equals
    the batch profile of everything that flowed through (mergeability
    is exactly what makes per-batch verification sound)."""
    import os
    import shutil

    src = tempfile.mkdtemp(prefix="dqstream-src-")
    ckpt = tempfile.mkdtemp(prefix="dqstream-ckpt-")
    schema = "id long, qty double, price double, flag string"
    try:
        for i, rows in enumerate([ROWS_A, ROWS_B]):
            (spark.createDataFrame(rows, schema)
             .coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(src, f"b{i}")))
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/b*"))
        state = {"df": None, "batches": 0}

        def fold(batch_df, batch_id):
            prof = dq.profile(batch_df, NUM, STR)
            state["df"] = prof if state["df"] is None else \
                dq.merge_profiles(state["df"], prof)
            # materialize now: batch_df is only valid inside the hook
            state["df"] = state["df"].localCheckpoint(eager=True)
            state["batches"] += 1

        q = (stream.writeStream.foreachBatch(fold)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert state["batches"] == 2
        whole = dq.profile(_df(spark, ROWS_A + ROWS_B), NUM, STR)
        assert _m(state["df"]) == _m(whole)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
