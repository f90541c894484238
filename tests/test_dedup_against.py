"""Incremental cross-corpus near-dup (dedup_against) semantics."""

import pytest

from fetcho_spark.operators.dedup import (band_index, dedup_against,
                                          lsh_candidate_pairs,
                                          minhash_signatures)

BASE = "the quick brown fox jumps over the lazy dog again and again"
REF = [(0, BASE),
       (2, "completely different reference text about spark engines here"),
       (4, BASE + " with a tiny tail change")]
NEW = [(1, BASE),                                   # exact dup of ref 0
       (3, "novel unseen content that matches nothing in the archive"),
       (5, BASE + " with a tiny tail change")]      # exact dup of ref 4


@pytest.fixture()
def sigs(spark):
    ref = minhash_signatures(spark.createDataFrame(REF, ["doc_id", "text"]),
                             n_hashes=8)
    new = minhash_signatures(spark.createDataFrame(NEW, ["doc_id", "text"]),
                             n_hashes=8)
    return new, ref


@pytest.mark.spark
def test_dedup_against_flags_archive_dups(sigs):
    new, ref = sigs
    got = {(r["new_id"], r["ref_id"]): (r["n_agree"], r["agree_pct"])
           for r in dedup_against(new, ref, n_hashes=8).collect()}
    # exact text copies agree on every hash
    assert got[(1, 0)] == (8, 100)
    assert got[(5, 4)] == (8, 100)
    # the novel doc matches nothing
    assert not any(n == 3 for n, _ in got)
    # direction: only new-vs-ref pairs ever appear
    assert all(n in {1, 3, 5} and r in {0, 2, 4} for n, r in got)


@pytest.mark.spark
def test_dedup_against_consistent_with_self_join_banding(spark, sigs):
    # the same pair (1, 0) surfaces in the classic self-join candidates
    # when both corpora are pooled — the incremental path finds exactly
    # the cross-corpus subset
    new, ref = sigs
    pooled = minhash_signatures(
        spark.createDataFrame(REF + NEW, ["doc_id", "text"]), n_hashes=8)
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(pooled, n_hashes=8).collect()}
    inc = {tuple(sorted((r["new_id"], r["ref_id"])))
           for r in dedup_against(new, ref, n_hashes=8,
                                  threshold_pct=0).collect()}
    cross = {(a, b) for a, b in pairs if (a % 2 == 0) != (b % 2 == 0)}
    assert inc == cross


@pytest.mark.spark
def test_band_index_is_deterministic(spark, sigs):
    _, ref = sigs
    a = sorted(map(tuple, band_index(ref, n_hashes=8).collect()))
    b = sorted(map(tuple,
                   band_index(ref.repartition(5), n_hashes=8).collect()))
    assert a == b
