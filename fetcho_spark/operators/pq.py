"""Product quantization (PQ) — the memory-bounded ANN path.

Jégou et al. 2011 ("Product Quantization for Nearest Neighbor Search"):
split each vector into ``m`` subvectors, k-means each subspace to ``ksub``
centroids, store per vector only the ``m`` centroid codes (bytes instead
of floats — a 64-dim float32 embedding compresses 64× at m=4/ksub=256),
and answer queries with the Asymmetric Distance Computation (ADC): a
per-query lookup table of exact subspace distances, summed per row.

This completes the repo's ANN family (similarity.py: brute force = the
exactness oracle, sign-LSH = the bucketed path, IVF = the partition-pruned
path): PQ is what makes a 10^10-vector corpus *fit* — codes ride in RAM /
short parquet columns while the float vectors stay cold. IVF-PQ composes
directly: ``with_ivf_list`` for the coarse partition-pruning, PQ codes for
the in-list scan.

Reference context: the reference engine has no embedding ops (nearest
analog: the data-hash equi-join, fetcho/Queueo.cs duplicate culling);
this module is part of the LLM-training-data axis the north rule adds.

Cross-engine exactness — STRONGER here than the cosine operators, because
L2 decomposes over subspaces and needs no sqrt at all:

- Vectors quantize once to semdedup's 1e-6 integer grid
  (``floor(x*1e6 + 0.5)``, branchless, engine-agnostic).
- Assignment argmin key is ``norm2(c) - 2*dot(v_sub, c)`` (the rank of
  ``||v-c||^2`` with the row's own norm dropped) — an exact BIGINT, so
  comparisons, ties (lowest cid) and hence the whole training run are
  bit-identical in any engine with NO floating point whatsoever.
- Centroid updates are semdedup's floor-quantized integer means, computed
  as EXACT integer floor division (``(s - pmod(s, n)) div n`` — never
  through a double, whose 2^53 mantissa would silently round a large
  cluster cell's sum where DuckDB's hugeint does not).
- ADC distances are exact BIGINT sums of exact BIGINT table entries.

Scale shape: training assignment is a zero-shuffle JVM projection against
m*ksub broadcast literal centroids; the update is ONE partial-agg shuffle
of (sub, cluster, pos) cells per iteration (m*ksub*dsub rows to the
driver — the MLlib KMeans driver contract); encode is a zero-shuffle
projection; the ADC scan is a zero-shuffle projection + per-partition
top-k (TakeOrderedAndProject — the corpus never globally sorts).

Overflow bound: |q| <= G*|x|; with |x| <= 4 the per-component diff^2 is
<= (8e6)^2 = 6.4e13, so dsub up to ~10^5 components stays inside int64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .semdedup import _dot_q, _q, quantize_vec

__all__ = ["pq_train", "pq_train_local", "pq_encode", "pq_adc_scan",
           "pq_topk", "ann_topk_ivfpq", "reconstruct_local"]


def _slice(qv: Column, sub: int, dsub: int) -> Column:
    """Subvector ``sub`` of a quantized vector (1-based slice is
    engine-shared: elements sub*dsub+1 .. (sub+1)*dsub)."""
    return F.slice(qv, sub * dsub + 1, dsub)


def _lit_vec(cv: list[int]) -> Column:
    return F.array(*[F.lit(int(v)).cast("long") for v in cv])


def _assign_code(qv: Column, cents: list[list[int]],
                 off: int = 0) -> Column:
    """argmin centroid code over one subspace's literal codebook, as one
    JVM expression: array_min over (key, cid) structs — struct ordering
    compares key first, then cid, so ties break to the LOWEST code. The
    argmin key is the exact-BIGINT ``norm2(cv) - 2*dot(sv, cv)`` (the
    row's own norm2 is constant across centroids and drops out); ``off``
    is the subspace's element offset into the full quantized vector.

    Plan-size discipline (optimization r6, mirroring semdedup._nearest):
    the codebook rides as ONE ``from_json(lit(json), …)`` ksub×dsub
    nested-array literal node (``F.lit(list)`` re-expands to per-element
    nodes) indexed per code with a literal ``element_at`` — the tree is
    O(ksub) tiny structs instead of O(ksub·dsub) literal nodes, so
    planning/codegen stay flat in the subvector dimension (see
    _nearest's docstring for why an outer ``transform`` lambda is NOT
    used). The same fold-based exact integer dot over the same values ⇒
    bit-identical codes (oracle-verified)."""
    import json as _json
    ksub, dsub = len(cents), len(cents[0])
    cb = F.from_json(
        F.lit(_json.dumps([[int(v) for v in cv] for cv in cents])),
        "array<array<bigint>>")
    sv = F.slice(qv, off + 1, dsub)
    zero = F.lit(0).cast("long")
    scored = []
    for cid, cv in enumerate(cents):
        n2 = sum(v * v for v in cv)
        dot = F.aggregate(
            F.zip_with(sv, F.element_at(cb, cid + 1), lambda x, y: x * y),
            zero, lambda acc, x: acc + x)
        key = F.lit(n2).cast("long") - F.lit(2).cast("long") * dot
        scored.append(F.struct(key.alias("k"),
                               F.lit(cid).cast("int").alias("cid")))
    return F.array_min(F.array(*scored))["cid"]


def _staged(corpus: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return corpus.select(F.col(id_col),
                         quantize_vec(F.col(vec_col)).alias("_qv"))


def pq_train(corpus: DataFrame, dim: int, m: int = 4, ksub: int = 8,
             iters: int = 2, seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id") -> list[list[list[int]]]:
    """Train the ``m`` subspace codebooks → ``codebooks[sub][cid]`` =
    quantized centroid subvector (``dsub = dim // m`` components each).

    Init is ONE md5-seeded total order over row ids (rank by
    ``md5(id ':pq:' seed)``): the cid-th ranked row's sub-slice seeds
    centroid cid of EVERY subspace — one bounded TakeOrdered for all
    codebooks. Each Lloyd iteration then runs all m subspaces together:
    one zero-shuffle assignment projection (m argmin expressions) and one
    partial-agg shuffle over (sub, cluster, pos) cells; empty clusters
    keep their previous centroid (semdedup's backfill rule).
    """
    assert dim % m == 0, "dim must divide into m equal subspaces"
    dsub = dim // m
    # cache the quantized staging frame across the init scan + Lloyd
    # iterations (kmeans_fit's persist discipline: reuse-justified,
    # unpersisted the moment the eager training actions are done)
    staged = _staged(corpus, vec_col, id_col).persist()
    try:
        init_rows = (staged
                     .withColumn("_rk", F.md5(F.concat(
                         F.col(id_col).cast("string"),
                         F.lit(f":pq:{seed}"))))
                     .orderBy("_rk", id_col)
                     .limit(ksub)
                     .select("_qv")
                     .collect())
        assert len(init_rows) >= ksub, \
            f"corpus has {len(init_rows)} rows < ksub={ksub}"
        books = [[[int(v) for v in r["_qv"][s * dsub:(s + 1) * dsub]]
                  for r in init_rows] for s in range(m)]

        for _ in range(iters):
            assigned = staged.select(
                "_qv",
                *[_assign_code(F.col("_qv"), books[s], s * dsub)
                  .alias(f"_c{s}") for s in range(m)])
            cells = (assigned
                     .select(F.explode(F.array(*[
                         F.struct(F.lit(s).cast("int").alias("sub"),
                                  F.col(f"_c{s}").alias("cluster"),
                                  _slice(F.col("_qv"), s, dsub).alias("sv"))
                         for s in range(m)])).alias("e"))
                     .select("e.sub", "e.cluster",
                             F.posexplode("e.sv").alias("pos", "val"))
                     .groupBy("sub", "cluster", "pos")
                     # exact integer floor division (never through double):
                     # s - pmod(s, n) is an exact multiple of n, so the
                     # integral div truncation IS the floor for any sign
                     .agg(F.expr("(sum(val) - pmod(sum(val), count(*)))"
                                 " div count(*)")
                          .cast("long").alias("val"))
                     .collect())
            new = [[list(books[s][c]) for c in range(ksub)]
                   for s in range(m)]
            for r in cells:
                new[r["sub"]][r["cluster"]][r["pos"]] = r["val"]
            books = new
        return books
    finally:
        staged.unpersist()


def pq_train_local(rows: list[tuple], dim: int, m: int = 4, ksub: int = 8,
                   iters: int = 2, seed: int = 42) -> list[list[list[int]]]:
    """Pure-Python reference with IDENTICAL semantics (md5 init, exact
    integer argmin keys, floor-quantized means, empty-cluster backfill) —
    the unit-test twin. ``rows`` = [(id, [float])]."""
    dsub = dim // m
    assert len(rows) >= ksub, f"corpus has {len(rows)} rows < ksub={ksub}"
    qrows = [(i, [_q(x) for x in v]) for i, v in rows]
    ranked = sorted(qrows, key=lambda r: (
        hashlib.md5(f"{r[0]}:pq:{seed}".encode()).hexdigest(), r[0]))
    books = [[list(r[1][s * dsub:(s + 1) * dsub]) for r in ranked[:ksub]]
             for s in range(m)]
    for _ in range(iters):
        members: dict[tuple[int, int], list[list[int]]] = {}
        for _id, qv in qrows:
            for s in range(m):
                sv = qv[s * dsub:(s + 1) * dsub]
                best = min(range(ksub), key=lambda c: (
                    sum(v * v for v in books[s][c])
                    - 2 * sum(a * b for a, b in zip(sv, books[s][c])), c))
                members.setdefault((s, best), []).append(sv)
        new = [[list(books[s][c]) for c in range(ksub)] for s in range(m)]
        for (s, c), mem in members.items():
            n = len(mem)
            new[s][c] = [sum(col) // n for col in zip(*mem)]
        books = new
    return books


def pq_encode(corpus: DataFrame, codebooks: list[list[list[int]]],
              vec_col: str = "embedding", id_col: str = "vec_id",
              keep_cols: list[str] | None = None) -> DataFrame:
    """(id[, keep_cols...], codes array<int>) — the compressed corpus
    representation, as a zero-shuffle JVM projection against the
    broadcast literal codebooks. At scale this is the build step:
    persist (id, codes) and let the float vectors go cold.
    ``keep_cols`` rides extra columns through (e.g. the IVF list id)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    extra = [F.col(c) for c in (keep_cols or [])]
    staged = corpus.select(F.col(id_col), *extra,
                           quantize_vec(F.col(vec_col)).alias("_qv"))
    return staged.select(
        F.col(id_col), *extra,
        F.array(*[_assign_code(F.col("_qv"), codebooks[s], s * dsub)
                  for s in range(m)]).alias("codes"))


def ann_topk_ivfpq(corpus: DataFrame, codebooks: list[list[list[int]]],
                   query_vec: list[float], k: int = 10,
                   n_list: int = 16, n_probes: int = 2, seed: int = 42,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   cents=None, codes: DataFrame | None = None) -> DataFrame:
    """IVF-PQ: the billion-scale composition — similarity.with_ivf_list
    prunes the scan to the query's ``n_probes`` nearest coarse
    centroids' inverted lists (partition pruning when the codes are
    written partitioned by ``ivf_list``), then the ADC scan ranks the
    surviving CODES; the float vectors are never touched at query time.
    With ``n_probes == n_list`` this is exactly :func:`pq_topk` over the
    whole corpus (the unit-test identity)."""
    from .similarity import ivf_centroids, with_ivf_list
    if cents is None:
        cents = ivf_centroids(corpus, n_list, seed, vec_col, id_col)
    # reuse ann_topk_ivf's centroid ranking for the probe list
    ranked = sorted(
        cents, key=lambda c: (
            -(sum(x * y for x, y in zip(query_vec, c[1]))
              / ((sum(x * x for x in query_vec) ** 0.5)
                 * (sum(y * y for y in c[1]) ** 0.5) or 1.0)), c[0]))
    probe_ids = [cid for cid, _ in ranked[:n_probes]]
    if codes is None:
        # build-on-the-fly path; at scale, pre-encode ONCE (pq_encode
        # with keep_cols=["ivf_list"], written partitioned by ivf_list)
        # and pass `codes` so queries never touch the float vectors
        listed = with_ivf_list(corpus, cents, vec_col)
        codes = pq_encode(listed, codebooks, vec_col, id_col,
                          keep_cols=["ivf_list"])
    cand = codes.filter(F.col("ivf_list").isin(probe_ids)) \
        .select(id_col, "codes")
    return (pq_adc_scan(cand, codebooks, query_vec, id_col)
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k))


def adc_tables(codebooks: list[list[list[int]]],
               query_vec: list[float]) -> list[list[int]]:
    """Per-subspace ADC lookup tables: ``lut[sub][cid]`` = exact BIGINT
    ``||q_sub - c||^2``. Driver-side over m*ksub centroids only."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qq = [_q(x) for x in query_vec]
    return [[sum((qq[s * dsub + j] - cv[j]) ** 2 for j in range(dsub))
             for cv in codebooks[s]] for s in range(m)]


def pq_adc_scan(codes: DataFrame, codebooks: list[list[list[int]]],
                query_vec: list[float],
                id_col: str = "vec_id") -> DataFrame:
    """(id, dist) — approximate squared-L2 distance of every row to the
    query, computed from codes alone: sum over subspaces of the literal
    LUT entry the row's code selects. Zero shuffle, all BIGINT."""
    luts = adc_tables(codebooks, query_vec)
    dist = None
    for s, lut in enumerate(luts):
        term = F.element_at(_lit_vec(lut),
                            F.col("codes")[s].cast("int") + F.lit(1))
        dist = term if dist is None else dist + term
    return codes.select(F.col(id_col), dist.alias("dist"))


def pq_topk(corpus: DataFrame, codebooks: list[list[list[int]]],
            query_vec: list[float], k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            codes: DataFrame | None = None) -> DataFrame:
    """Approximate L2 top-k via ADC over PQ codes (encode on the fly when
    a pre-encoded ``codes`` frame isn't supplied). orderBy+limit is
    TakeOrderedAndProject: per-partition top-k, tiny final merge — the
    corpus never globally sorts. Ties break on id, so the result is a
    pure function of the data."""
    if codes is None:
        codes = pq_encode(corpus, codebooks, vec_col, id_col)
    return (pq_adc_scan(codes, codebooks, query_vec, id_col)
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k))


def reconstruct_local(codes: list[int],
                      codebooks: list[list[list[int]]]) -> list[int]:
    """Decode PQ codes back to the quantized-grid approximation (test
    helper: ADC dist of a row == exact ||q - reconstruct(codes)||^2)."""
    out: list[int] = []
    for s, c in enumerate(codes):
        out.extend(codebooks[s][c])
    return out
