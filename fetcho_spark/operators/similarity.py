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


def ann_topk_lsh(corpus: DataFrame, query_vec: list[float], dim: int,
                 k: int = 10, n_planes: int = 8, seed: int = 42,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket. Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher recall);
    the brute-force op is the correctness baseline for recall tests."""
    planes = _hyperplanes(dim, n_planes, seed)
    qb = 0
    for p, plane in enumerate(planes):
        if sum(q * w for q, w in zip(query_vec, plane)) >= 0:
            qb |= 1 << p
    bucketed = with_lsh_bucket(corpus, dim, n_planes, seed, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket") == F.lit(qb))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (cand.select(F.col(id_col),
                        F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))
