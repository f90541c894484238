"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exactness baseline, plus an LSH-bucketed
(random-hyperplane sign) variant as the scale path — at 10^9 vectors the
bucket join prunes the candidate set by ~2^n_planes before scoring. Dot
products are JVM-side ``aggregate``/``zip_with`` expressions (vectorized in
codegen, no Python); math is done in double so the DuckDB oracle matches to
rounding.

The hyperplanes for the LSH variant are *data-derived* pseudo-randoms
(md5-based, seeded) so both the Spark build and any re-run produce identical
buckets — same determinism discipline as the crawl (SURVEY.md §7.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import xxh64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(corpus: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k of one query against the corpus — one scan, one
    partial top-k per partition, tiny final sort (orderBy+limit is
    TakeOrderedAndProject, no global shuffle of the corpus)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cos"))


def pairwise_topk_within_label(corpus: DataFrame, k: int = 5,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               label_col: str = "label") -> DataFrame:
    """Blocked all-pairs: top-k neighbours per vector *within its label
    block* — the blocked-join pattern (block key here: label; at scale: an
    LSH bucket) that avoids the full O(n²) cross join."""
    from pyspark.sql import Window
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(label_col),
                      F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(label_col),
                      F.col(vec_col).alias("vb"))
    pairs = (a.join(b, label_col)
             .filter(F.col("id_a") != F.col("id_b"))
             .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6)))
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(),
                                           F.col("id_b").asc())
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("id_a", "id_b", "cos", "rk"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: component (p, d) =
    centered 16-bit value from xxh64 — reproducible everywhere, no RNG."""
    planes = []
    for p in range(n_planes):
        row = [((xxh64(f"hp:{seed}:{p}:{d}".encode()) & 0xFFFF) - 32768) / 32768.0
               for d in range(dim)]
        planes.append(row)
    return planes


def with_lsh_bucket(corpus: DataFrame, dim: int, n_planes: int = 8,
                    seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id: bit p = (v · hyperplane_p) >= 0. Cosine-similar
    vectors collide with high probability; bucket count = 2^n_planes."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pc = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(F.transform(F.col(vec_col),
                                      lambda x: x.cast("double")), pc) >= 0,
                     F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return corpus.withColumn("lsh_bucket", bucket)


def probe_buckets(query_vec: list[float], planes: list[list[float]],
                  n_probes: int) -> list[int]:
    """Multi-probe sequence: the query's own bucket, then buckets obtained by
    flipping the sign bits whose hyperplane margin is smallest (the planes the
    query sits closest to — where true neighbours most likely landed on the
    other side), then the smallest two-bit flips. Deterministic."""
    margins = []
    qb = 0
    for p, plane in enumerate(planes):
        m = sum(q * w for q, w in zip(query_vec, plane))
        if m >= 0:
            qb |= 1 << p
        margins.append((abs(m), p))
    margins.sort()
    order = [p for _, p in margins]
    probes = [qb]
    import itertools
    for radius in range(1, len(order) + 1):   # Hamming-1, then -2, …
        # within a radius, combinations of the nearest planes first
        for combo in itertools.combinations(order, radius):
            if len(probes) >= n_probes:
                return probes
            flip = 0
            for p in combo:
                flip ^= 1 << p
            probes.append(qb ^ flip)
    return probes[:n_probes]


def ann_topk_lsh(corpus: DataFrame, query_vec: list[float], dim: int,
                 k: int = 10, n_planes: int = 8, seed: int = 42,
                 n_probes: int = 1, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket(s). Recall is
    tunable via n_planes (fewer planes → bigger buckets) and ``n_probes``
    (multi-probe: also search the buckets across the query's lowest-margin
    hyperplanes — recovers most of the single-bucket recall cliff at a cost
    of n_probes/2^n_planes of the corpus). Brute force is the recall oracle."""
    planes = _hyperplanes(dim, n_planes, seed)
    probes = probe_buckets(query_vec, planes, n_probes)
    bucketed = with_lsh_bucket(corpus, dim, n_planes, seed, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(probes))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (cand.select(F.col(id_col),
                        F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


# ----------------------------------------------------------------- IVF ANN

def ivf_centroids(corpus: DataFrame, n_list: int, seed: int = 42,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the ``n_list`` corpus vectors with
    the lowest seeded hash of their id act as centroids (a seeded sample —
    reproducible, no RNG, no iterative training). Bounded driver transfer:
    n_list rows only."""
    rows = (corpus
            .withColumn("_ck", F.xxhash64(F.col(id_col).cast("string"),
                                          F.lit(f"ivf:{seed}")))
            .orderBy("_ck")
            .limit(n_list)
            .select(id_col, vec_col)
            .collect())
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


def _nearest_centroid(vec: Column,
                      cents: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine centroid id as a pure JVM expression: build an array of
    (score, centroid_id) structs and take array_max — no Python, no shuffle."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    scored = []
    for cid, cv in cents:
        c = F.array(*[F.lit(v) for v in cv])
        s = _dot(vd, c) / (_norm(vd) * _norm(c))
        scored.append(F.struct(s.alias("s"),
                               F.lit(-cid).cast("long").alias("nid")))
    # ties break to the LOWEST centroid id (hence -cid inside the max)
    best = F.array_max(F.array(*scored))
    return (-best["nid"]).cast("int")


def with_ivf_list(corpus: DataFrame, cents: list[tuple[int, list[float]]],
                  vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (the IVF inverted list).
    At scale this is the build step: write the corpus partitioned by
    ``ivf_list`` so a probe touches only n_probes/n_list of the files."""
    return corpus.withColumn("ivf_list",
                             _nearest_centroid(F.col(vec_col), cents))


def ann_topk_ivf(corpus: DataFrame, query_vec: list[float], k: int = 10,
                 n_list: int = 16, n_probes: int = 2, seed: int = 42,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 cents: list[tuple[int, list[float]]] | None = None) -> DataFrame:
    """IVF top-k: score only the vectors whose inverted list is among the
    query's ``n_probes`` nearest centroids. With the corpus pre-partitioned
    by ``ivf_list`` the scan prunes to n_probes/n_list of the data (partition
    pruning — the filter is a literal IN over the partition column)."""
    if cents is None:
        cents = ivf_centroids(corpus, n_list, seed, vec_col, id_col)

    def _cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(cents, key=lambda c: (-_cos(query_vec, c[1]), c[0]))
    probe_ids = [cid for cid, _ in ranked[:n_probes]]
    cand = with_ivf_list(corpus, cents, vec_col) \
        .filter(F.col("ivf_list").isin(probe_ids))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (cand.select(F.col(id_col),
                        F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))
