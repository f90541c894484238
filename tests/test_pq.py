"""Product quantization (operators/pq.py): distributed-vs-local trainer
parity, encode/ADC exactness against the reconstruction definition,
partition invariance, recall vs brute force, JVM-only plans."""

import math

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators import pq as PQ
from fetcho_spark.operators.semdedup import _q

pytestmark = [pytest.mark.spark]

DIM, M, KSUB = 8, 4, 4


def _vecs(n, dim=DIM, spread=7):
    """Deterministic float vectors with real cluster structure: component
    values derived from integer recurrences, scaled to ~[-2, 2]."""
    out = []
    for i in range(n):
        v = [(((i * 37 + d * 101 + (i * d) % spread) % 401) - 200) / 100.0
             for d in range(dim)]
        out.append((i, v))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def test_pq_train_distributed_matches_local(spark):
    rows = _vecs(60)
    got = PQ.pq_train(_df(spark, rows), DIM, m=M, ksub=KSUB, iters=2)
    ref = PQ.pq_train_local(rows, DIM, m=M, ksub=KSUB, iters=2)
    assert got == ref


def test_pq_train_partition_invariance(spark):
    rows = _vecs(50)
    a = PQ.pq_train(_df(spark, rows).repartition(1), DIM, m=M, ksub=KSUB,
                    iters=3)
    b = PQ.pq_train(_df(spark, rows).repartition(13), DIM, m=M, ksub=KSUB,
                    iters=3)
    assert a == b == PQ.pq_train_local(rows, DIM, m=M, ksub=KSUB, iters=3)


def test_pq_adc_equals_reconstruction_distance(spark):
    """The definitional ADC property: a row's ADC dist == the exact
    squared L2 distance between the quantized query and the row's
    RECONSTRUCTED (decoded) vector."""
    rows = _vecs(40)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=2)
    query = rows[7][1]
    codes = {r["vec_id"]: list(r["codes"])
             for r in PQ.pq_encode(df, books).collect()}
    dists = {r["vec_id"]: r["dist"]
             for r in PQ.pq_adc_scan(PQ.pq_encode(df, books), books,
                                     query).collect()}
    qq = [_q(x) for x in query]
    for i, _v in rows:
        rec = PQ.reconstruct_local(codes[i], books)
        exact = sum((a - b) ** 2 for a, b in zip(qq, rec))
        assert dists[i] == exact


def test_pq_encode_is_argmin_over_codebook(spark):
    rows = _vecs(30)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=1)
    codes = {r["vec_id"]: list(r["codes"])
             for r in PQ.pq_encode(df, books).collect()}
    dsub = DIM // M
    for i, v in rows:
        qv = [_q(x) for x in v]
        for s in range(M):
            sv = qv[s * dsub:(s + 1) * dsub]
            best = min(range(KSUB), key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(sv, books[s][c])), c))
            assert codes[i][s] == best


def test_pq_topk_recall_vs_brute_force(spark):
    """PQ is approximate; with ksub=8 codebooks over this structured set
    the true nearest neighbour must appear in the ADC top-5 and top-10
    recall must be >= 0.5 (deterministic data, deterministic bound)."""
    rows = _vecs(80)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=8, iters=3)
    query = rows[3][1]
    got = [r["vec_id"] for r in PQ.pq_topk(df, books, query, k=10).collect()]
    qq = [_q(x) for x in query]
    brute = sorted(rows, key=lambda r: (
        sum((a - _q(b)) ** 2 for a, b in zip(qq, r[1])), r[0]))
    true10 = [i for i, _ in brute[:10]]
    assert brute[0][0] in got[:5]
    assert len(set(got) & set(true10)) >= 5


def test_pq_compression_shape(spark):
    rows = _vecs(20)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=1)
    enc = PQ.pq_encode(df, books)
    out = enc.collect()
    assert len(out) == 20
    assert all(len(r["codes"]) == M for r in out)
    assert all(0 <= c < KSUB for r in out for c in r["codes"])


def test_pq_plans_are_jvm_only(spark):
    rows = _vecs(25)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=1)
    for frame in (PQ.pq_encode(df, books),
                  PQ.pq_topk(df, books, rows[0][1], k=5)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_ivfpq_all_probes_equals_pq(spark):
    """IVF-PQ with n_probes == n_list scans every inverted list — must
    return exactly pq_topk over the whole corpus."""
    rows = _vecs(60)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=2)
    q = rows[5][1]
    full = [tuple(r) for r in PQ.pq_topk(df, books, q, k=8).collect()]
    ivf = [tuple(r) for r in PQ.ann_topk_ivfpq(
        df, books, q, k=8, n_list=4, n_probes=4).collect()]
    assert ivf == full


def test_ivfpq_probe_subset_is_subset(spark):
    """Probing fewer lists returns results drawn from the full ADC
    ranking (no new ids, distances identical per id)."""
    rows = _vecs(60)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=2)
    q = rows[5][1]
    full = {r["vec_id"]: r["dist"]
            for r in PQ.pq_topk(df, books, q, k=60).collect()}
    sub = PQ.ann_topk_ivfpq(df, books, q, k=8, n_list=4,
                            n_probes=1).collect()
    assert 0 < len(sub) <= 8
    for r in sub:
        assert full[r["vec_id"]] == r["dist"]


def test_ivfpq_codes_partition_pruning(spark, tmp_path):
    """The scale claim made executable: codes written partitioned by
    ivf_list are read back with a probe filter that prunes to the
    probed lists' files only — the scan never touches the other
    inverted lists' data."""
    from fetcho_spark.operators.similarity import (ivf_centroids,
                                                   with_ivf_list)
    rows = _vecs(60)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=1)
    cents = ivf_centroids(df, n_list=4)
    codes = PQ.pq_encode(with_ivf_list(df, cents), books,
                         keep_cols=["ivf_list"])
    out = str(tmp_path / "codes")
    codes.write.partitionBy("ivf_list").parquet(out)

    back = spark.read.parquet(out)
    all_lists = sorted(r["ivf_list"] for r in
                       back.select("ivf_list").distinct().collect())
    assert len(all_lists) >= 2
    probe = back.filter(F.col("ivf_list") == all_lists[0])
    # the filter reaches the scan as a PartitionFilter (applied at file
    # listing — the other lists' files are never opened), not a
    # post-scan predicate
    plan = probe._jdf.queryExecution().executedPlan().toString()
    after = plan.split("PartitionFilters: [", 1)
    assert len(after) == 2 and "ivf_list" in after[1][:120]
    # and the probed frame is exactly the one partition directory
    direct = spark.read.parquet(f"{out}/ivf_list={all_lists[0]}")
    assert sorted(r["vec_id"] for r in probe.collect()) == \
        sorted(r["vec_id"] for r in direct.collect())


def test_pq_dim_must_divide(spark):
    with pytest.raises(AssertionError):
        PQ.pq_train(_df(spark, _vecs(10, dim=6)), 6, m=4)


def test_pq_train_requires_ksub_rows(spark):
    with pytest.raises(AssertionError):
        PQ.pq_train(_df(spark, _vecs(3)), DIM, m=M, ksub=8)
    with pytest.raises(AssertionError):
        PQ.pq_train_local(_vecs(3), DIM, m=M, ksub=8)


def test_ivfpq_precoded_codes_equals_on_the_fly(spark):
    """The scale path: pass pre-encoded (id, ivf_list, codes) so the
    query never touches float vectors — identical to the build-on-the-
    fly path."""
    from fetcho_spark.operators.similarity import (ivf_centroids,
                                                   with_ivf_list)
    rows = _vecs(50)
    df = _df(spark, rows)
    books = PQ.pq_train(df, DIM, m=M, ksub=KSUB, iters=1)
    cents = ivf_centroids(df, n_list=4)
    pre = PQ.pq_encode(with_ivf_list(df, cents), books,
                       keep_cols=["ivf_list"])
    q = rows[2][1]
    a = [tuple(r) for r in PQ.ann_topk_ivfpq(
        df, books, q, k=6, n_list=4, n_probes=2, cents=cents).collect()]
    b = [tuple(r) for r in PQ.ann_topk_ivfpq(
        df, books, q, k=6, n_list=4, n_probes=2, cents=cents,
        codes=pre).collect()]
    assert a == b
