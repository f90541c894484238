"""Quantized PageRank: distributed == in-memory reference, plus the
structural sanity properties."""

import pytest

from fetcho_spark.operators.graph import pagerank, pagerank_local

# hub-and-spoke with a cycle, a self-loop, a duplicate edge, and a
# dangling sink (node 5 has no out-edges)
EDGES = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 5), (0, 5), (2, 2)]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {r["node_id"]: r["rank_q"]
            for r in pagerank(df, **kw).collect()}


@pytest.mark.spark
def test_pagerank_matches_reference(spark):
    got = _spark_ranks(spark, EDGES)
    assert got == pagerank_local(EDGES)
    # node 0 (three in-edges incl. from the cycle) outranks the spokes
    assert got[0] > got[3] == got[4]


@pytest.mark.spark
def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src: long, dst: long")
    base = sorted(map(tuple, pagerank(df).collect()))
    rep = sorted(map(tuple, pagerank(df.repartition(5)).collect()))
    assert base == rep


@pytest.mark.spark
def test_pagerank_dangling_mass_vanishes(spark):
    # chain 0 -> 1 -> 2 with sink 2: total mass strictly decreases from
    # n * scale (the documented non-redistributing variant)
    got = _spark_ranks(spark, [(0, 1), (1, 2)], n_iter=3, scale=10**6)
    ref = pagerank_local([(0, 1), (1, 2)], n_iter=3, scale=10**6)
    assert got == ref
    assert sum(got.values()) < 3 * 10**6


def test_reference_converges_to_uniform_on_cycle():
    # pure cycle: every node keeps rank ~1.0 (up to integer truncation)
    q = pagerank_local([(0, 1), (1, 2), (2, 0)], n_iter=25)
    assert all(abs(v - 10**9) < 100 for v in q.values())
