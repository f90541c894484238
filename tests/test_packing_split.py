"""Sequence packing layout + hash-based split assignment."""

import hashlib

import pytest

from fetcho_spark.operators.textops import pack_sequences, split_assign

DOCS = [(i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 3) % 9)))
        for i in range(40)] + [(99, "")]


def _ref_pack(docs, window, seed=42):
    order = sorted(
        docs, key=lambda d: (hashlib.md5(f"{d[0]}:{seed}".encode())
                             .hexdigest(), d[0]))
    out, cum = {}, 0
    for k, t in order:
        n = len(t.split()) if t.strip() else 0
        off = cum
        cum += n
        out[k] = (n, off, off // window, off % window,
                  0 if n == 0 else (cum - 1) // window - off // window + 1)
    return out


@pytest.mark.spark
def test_pack_sequences_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["pack_id"],
                         r["pack_offset"], r["n_packs"])
           for r in pack_sequences(df, window=16).collect()}
    assert got == _ref_pack(DOCS, 16)
    # layout is gapless: offsets tile the token stream exactly
    spans = sorted((o, o + n) for n, o, *_ in got.values())
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    # straddling docs exist at window=16 (docs are 5-13 tokens)
    assert any(v[4] > 1 for v in got.values())
    assert got[99] == (0, got[99][1], got[99][2], got[99][3], 0)


@pytest.mark.spark
def test_pack_sequences_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    base = sorted(map(tuple, pack_sequences(df, window=16).collect()))
    rep = sorted(map(tuple,
                     pack_sequences(df.repartition(7),
                                    window=16).collect()))
    assert base == rep


@pytest.mark.spark
def test_split_assign_deterministic_and_stable(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert set(got.values()) <= {"train", "val", "test"}
    # reference: same md5-slot arithmetic
    for k, _ in DOCS:
        slot = int(hashlib.md5(f"{k}:42".encode()).hexdigest()[:4], 16)
        want = ("train" if slot < 65536 * 90 // 100 else
                "val" if slot < 65536 * 95 // 100 else "test")
        assert got[k] == want, k
    # growth stability: a subset corpus assigns identically
    sub = {r["doc_id"]: r["split"]
           for r in split_assign(df.limit(10)).collect()}
    assert all(got[k] == v for k, v in sub.items())


def test_split_assign_rejects_bad_fractions(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        split_assign(df, fractions=(("a", 50), ("b", 49)))


@pytest.mark.spark
def test_stratified_split_exact_per_group(spark):
    """Every group contributes floor-exact counts to each split — the
    property split_assign's hash slots only give in expectation."""
    from fetcho_spark.operators.textops import stratified_split
    rows = [(i, f"g{i % 3}") for i in range(60)] + \
           [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(
        df, fractions=(("train", 50), ("val", 25), ("test", 25)))
    got = {}
    for r in out.collect():
        got.setdefault((r["source"], r["split"]), 0)
        got[(r["source"], r["split"])] += 1
    for g in ("g0", "g1", "g2"):   # 20 docs each -> 10/5/5 exactly
        assert got[(g, "train")] == 10
        assert got[(g, "val")] == 5 and got[(g, "test")] == 5
    # 3-doc group: ranks 0,1,2 -> 100r < 50*3 puts ranks 0..1? 100*1=100
    # < 150 yes; rank 2: 200 < 150 no, 200 < 225 yes -> val; so 2/1/0
    assert got[("tiny", "train")] == 2 and got[("tiny", "val")] == 1
    assert ("tiny", "test") not in got


@pytest.mark.spark
def test_stratified_split_partition_invariance(spark):
    from fetcho_spark.operators.textops import stratified_split
    rows = [(i, f"s{i % 5}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(tuple(r) for r in
               stratified_split(df.repartition(1)).collect())
    b = sorted(tuple(r) for r in
               stratified_split(df.repartition(13)).collect())
    assert a == b


@pytest.mark.spark
def test_stratified_split_bad_fractions_raise(spark):
    from fetcho_spark.operators.textops import stratified_split
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        stratified_split(df, fractions=(("train", 60), ("val", 20)))


@pytest.mark.spark
def test_stratified_split_keeps_null_group(spark):
    """A NULL group (missing provenance) forms its own stratum instead
    of silently vanishing (null-unsafe join hazard)."""
    from fetcho_spark.operators.textops import stratified_split
    rows = [(i, "a") for i in range(8)] + [(100 + i, None)
                                           for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(
        df, fractions=(("train", 50), ("test", 50))).collect()
    assert len(out) == 12
    nulls = [r for r in out if r["source"] is None]
    assert sorted(r["split"] for r in nulls) == \
        ["test", "test", "train", "train"]
