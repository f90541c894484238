"""Deduplication operators for training-data pipelines at corpus scale.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — each expressed with JVM-side built-ins only
(explode / groupBy / join; no Python), so they shuffle on content keys and
scale horizontally. Each has an exact SQL twin for the DuckDB oracle.

Cross-engine determinism trick: "hash functions" are ``md5(x || ':' || i)``
**as hex strings** — min() over hex strings is a valid min-hash and is
byte-identical in Spark and ANSI SQL. Where an integer hash is needed
(SimHash bits), the first 15 hex chars parse to a 60-bit int the same way in
both engines (``conv(...,16,10)`` / ``('0x'||...)::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import fingerprint


def _words(col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (built-ins only)."""
    w = _words(col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    ))


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: fingerprint → (fingerprint, keep_id, n_dupes), keeping the
    lowest id as the canonical representative. One shuffle on the hash."""
    return (df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_docs"))
            .select("fp", "keep_id", "n_docs"))


def exact_dedup_best(df: DataFrame, score_col: str,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Quality-aware exact dedup: per fingerprint keep the HIGHEST-score
    row (ties → lowest id; a NULL score ranks below every non-NULL
    score, so NULL-score rows survive only when the whole group is
    NULL-scored — then lowest id wins) — real pipelines keep the best
    duplicate (cleanest fetch, longest extraction), not the lowest id.
    Same one-shuffle shape as :func:`exact_dedup_groups`; the survivor
    is a ``min_by`` over an orderable (−score, id) struct — the score,
    numeric by contract, is the only negated term (as double: no
    overflow), the id rides un-negated so ANY orderable id type works —
    and it partial-aggregates map-side like any min."""
    negscore = -F.coalesce(F.col(score_col).cast("double"),
                           F.lit(float("-inf")))
    ordk = F.struct(negscore.alias("ns"), F.col(id_col).alias("i"))
    return (df.select(F.col(id_col), F.col(score_col),
                      fingerprint(F.col(text_col)).alias("fp"))
            .groupBy("fp")
            .agg(F.min_by(F.col(id_col), ordk).alias("keep_id"),
                 F.max(score_col).alias("best_score"),
                 F.count("*").alias("n_docs")))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 12,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash: sig_i(doc) = min over shingles of md5(shingle:i).

    explode(shingles) × n_hashes → groupBy(doc) with map-side partial min —
    the agg is partial+final automatically, so the shuffle carries only
    (doc, i, min) not the shingle stream.
    """
    sh = (df.select(F.col(id_col),
                    F.explode(shingles(F.col(text_col), shingle_n))
                    .alias("shingle")))
    idx = sh.select(
        id_col, "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("i"))
    return (idx.withColumn(
                "h", F.md5(F.concat_ws(":", F.col("shingle"), F.col("i"))))
            .groupBy(id_col, "i").agg(F.min("h").alias("minhash")))


def band_index(sigs: DataFrame, id_col: str = "doc_id",
               n_bands: int = 4, n_hashes: int = 12) -> DataFrame:
    """Signature rows → the LSH band index ``(id, band, band_hash)``
    (rows_per_band = n_hashes/n_bands). This IS the persistable dedup
    artifact: write it partitioned by ``band`` and an incremental batch
    joins against it without ever re-scanning the archived corpus
    (:func:`dedup_against`)."""
    rows_per_band = n_hashes // n_bands
    return (sigs.withColumn("band",
                            (F.col("i") / rows_per_band).cast("int"))
            .groupBy(id_col, "band")
            .agg(F.md5(F.concat_ws("|", F.array_sort(
                F.collect_list(F.concat_ws(":", F.col("i"),
                                           F.col("minhash"))))))
                 .alias("band_hash")))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        n_bands: int = 4, n_hashes: int = 12) -> DataFrame:
    """Band the signature (rows_per_band = n_hashes/n_bands), bucket-join on
    (band, band_hash) → candidate pairs (id_a < id_b). The join is an
    equi-join on the band hash — shuffle, no broadcast, no O(n²)."""
    banded = band_index(sigs, id_col, n_bands, n_hashes)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def dedup_against(new_sigs: DataFrame, ref_sigs: DataFrame,
                  id_col: str = "doc_id", n_bands: int = 4,
                  n_hashes: int = 12,
                  threshold_pct: int = 50) -> DataFrame:
    """Incremental cross-corpus near-dup: flag documents of a NEW batch
    that near-duplicate an archived REFERENCE corpus →
    ``(new_id, ref_id, n_agree, agree_pct)`` for pairs whose signature
    agreement reaches ``threshold_pct`` (agreement fraction is the
    MinHash Jaccard estimate; all-integer, engine-exact).

    Scale shape: the archive participates ONLY through its (tiny,
    persistable) signature + band index — the daily increment dedups
    against a 100 TB archive without re-reading archive text. Bands
    equi-join new×ref (never ref×ref, never all-pairs); verification
    joins signatures only for banded candidates, ≤ n_hashes rows per
    candidate pair.
    """
    nb = (band_index(new_sigs, id_col, n_bands, n_hashes)
          .select(F.col(id_col).alias("new_id"), "band", "band_hash"))
    rb = (band_index(ref_sigs, id_col, n_bands, n_hashes)
          .select(F.col(id_col).alias("ref_id"), "band", "band_hash"))
    cand = (nb.join(rb, ["band", "band_hash"])
            .select("new_id", "ref_id").distinct())
    ns = new_sigs.select(F.col(id_col).alias("new_id"), "i",
                         F.col("minhash").alias("_hn"))
    rs = ref_sigs.select(F.col(id_col).alias("ref_id"), "i",
                         F.col("minhash").alias("_hr"))
    agree = (cand.join(ns, "new_id").join(rs, ["ref_id", "i"])
             .groupBy("new_id", "ref_id")
             .agg(F.sum((F.col("_hn") == F.col("_hr")).cast("long"))
                  .alias("n_agree")))
    return (agree
            .withColumn("agree_pct",
                        F.expr(f"(100 * n_agree) div {n_hashes}"))
            .filter(F.col("n_agree") * 100 >= threshold_pct * n_hashes))


def jaccard_pairs(df: DataFrame, candidates: DataFrame | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3, threshold: float = 0.8,
                  max_shingle_df: int | None = 1000,
                  observation=None) -> DataFrame:
    """n-gram Jaccard similarity for pairs (all pairs sharing ≥1 shingle, or
    only LSH candidates when given): |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold.

    Shuffles on the shingle (inverted-index join), then on the pair — the
    standard scalable shape. ``max_shingle_df`` drops shingles whose
    document frequency exceeds the cap BEFORE the self-join: one ubiquitous
    stop-phrase shingle (boilerplate menus, license headers) would otherwise
    emit O(df²) intermediate pairs — the quadratic blowup at corpus scale.
    Capped shingles are excluded from both intersections and set sizes, so
    the Jaccard stays consistent over the reduced shingle universe.

    The cap is never silent when the caller asks: pass an ``Observation``
    and the action that materializes the pairs reports
    ``hot_shingles_dropped`` / ``hot_shingle_rows`` (0/0 = the cap never
    engaged) — the hamming_band_pairs metric contract.
    """
    sh = (df.select(F.col(id_col),
                    F.explode(shingles(F.col(text_col), shingle_n))
                    .alias("shingle")).distinct())
    if max_shingle_df is not None:
        counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        if observation is not None:
            hot = F.col("_df") > max_shingle_df
            counts = counts.observe(
                observation,
                F.coalesce(F.sum(F.when(hot, 1)), F.lit(0))
                 .alias("hot_shingles_dropped"),
                F.coalesce(F.sum(F.when(hot, F.col("_df"))), F.lit(0))
                 .alias("hot_shingle_rows"))
        # positive join against the COLD set (not anti-join against hot):
        # keeps the observed counts node on the surviving path, so the
        # metrics don't vanish via AQE empty-relation propagation exactly
        # when they'd read 0/0
        cold = counts.filter(F.col("_df") <= max_shingle_df) \
            .select("shingle")
        sh = sh.join(cold, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   max_iters: int = 25, checkpoint_every: int = 5) -> DataFrame:
    """Near-dup pair list → connected components: (doc_id, cluster_id) with
    ``cluster_id`` = the minimum doc id in the component — the canonical
    survivor choice for a dedup cluster (same min-id discipline as
    exact_dedup_groups).

    Iterative min-label propagation: every node adopts the minimum label in
    its closed neighbourhood each round; converges in O(component diameter)
    rounds with one shuffle per round (groupBy node). Dedup components are
    near-cliques from LSH banding, so the diameter is small in practice —
    and the pair list itself is bounded by banding, never O(n²). The loop is
    driver-coordinated (as any iterative Spark algorithm) but all data stays
    distributed; ``localCheckpoint`` every few rounds truncates the lineage
    so plans don't grow unboundedly. Output is a pure function of the edge
    set — partitioning/iteration order never leaks in.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .persist())
    labels.count()
    for it in range(max_iters):
        # min over neighbours' labels, then min with own label
        nbr = (edges.join(labels.withColumnRenamed("node", "src"), "src")
               .groupBy(F.col("dst").alias("node"))
               .agg(F.min("label").alias("nbr_min")))
        new_labels = (labels.join(nbr, "node", "left")
                      .select("node",
                              F.least("label", "nbr_min").alias("label")))
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (labels.withColumnRenamed("label", "old")
                   .join(new_labels, "node")
                   .filter(F.col("old") != F.col("label")).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


SIMHASH_BITS = 60  # 60 bits keep the value in signed-int64 range both engines


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash-60: per token, a 60-bit md5-derived hash votes ±1 on each bit;
    the sign of each bit-sum sets the output bit. explode → groupBy, all
    built-ins; exact SQL twin via the same hex-parse trick.

    Formulation note (r6 optimization round, negative result): an
    explode-by-bit rewrite ((id, bit, ±1) rows + two narrow groupBys)
    cut the ~1.5-4 s plan-analysis/codegen cost of this 60-aggregate
    shape and won at sf0.1 — but INVERTED at sf1 (23.4 s vs 7.8 s exec):
    materializing 60× token rows is linear-in-data work the wide
    aggregate never does, while the 60-aggregate's cost is a once-per-
    query plan constant. The wide shape is the scale-correct one; kept."""
    tokens = (df.select(F.col(id_col),
                        F.explode(_words(F.col(text_col))).alias("tok"))
              .filter(F.col("tok") != ""))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    toks = tokens.withColumn("h", h)
    bit_votes = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*bit_votes)
    val = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0,
                      F.lit(1 << b).cast("long")).otherwise(
                          F.lit(0).cast("long"))
        val = term if val is None else val + term
    return agg.select(id_col, val.alias("simhash"))


def hamming_band_pairs(sigs: DataFrame, sig_col: str, id_col: str,
                       n_bits: int, max_hamming: int,
                       max_band_df: int | None = 1000,
                       observation=None) -> DataFrame:
    """Pairs of ids whose ``n_bits``-bit signatures are within
    ``max_hamming``, mined with banding — never an all-pairs product →
    ``(id_a, id_b, hamming)``.

    The signature splits into ``max_hamming + 1`` bands (last band absorbs
    the remainder); by pigeonhole, two signatures within ``max_hamming``
    bits differ in at most ``max_hamming`` bands, so they agree EXACTLY on
    at least one — every qualifying pair surfaces from an equi-join on
    (band_index, band_value) (100% recall), then ``bit_count(xor)``
    verifies the exact distance. At corpus scale the join cost is
    Σ bucket², bounded by the band-value distribution, vs n² brute force.
    ``max_band_df`` makes the boilerplate-cluster bound REAL (the
    jaccard_pairs document-frequency cap pattern): band buckets with more
    than that many members are dropped before the self-join, so one
    million-identical-pages cluster can't produce a 10¹² -pair bucket.
    Pairs inside a dropped bucket are found only if they still share a
    colder band — a documented recall trade, exactly like the jaccard cap.
    The cap is ON by default (1000, mirroring jaccard_pairs): the default
    call is bounded at 100 TB; pass ``None`` to opt OUT for exhaustive
    small-corpus mining. Exact-duplicate mega-clusters that the cap hides
    from THIS miner are exactly the ones :func:`exact_dedup_groups` already
    collapses with one groupBy — run that first, then band the survivors.
    Arithmetic ``shiftright`` + mask is sign-safe, so full signed-64-bit
    signatures (image phash) work as well as simhash-60.

    Bounded-recall mode is never silent when the caller asks: pass a
    ``pyspark.sql.Observation`` as ``observation`` and, on the same action
    that materializes the pairs (zero extra jobs — observe metrics ride the
    scan), ``observation.get`` reports ``hot_buckets_dropped`` /
    ``hot_bucket_rows`` — 0/0 means the cap never engaged and recall was
    100%; anything else quantifies exactly how much the cap cut.
    """
    n_bands = max_hamming + 1
    width = n_bits // n_bands
    bands = []
    for i in range(n_bands):
        lo = i * width
        w = n_bits - lo if i == n_bands - 1 else width
        bands.append(F.struct(
            F.lit(i).alias("bi"),
            F.shiftright(F.col(sig_col), lo)
             .bitwiseAND(F.lit((1 << w) - 1)).alias("bv")))
    b = (sigs.select(F.col(id_col), F.col(sig_col),
                     F.explode(F.array(*bands)).alias("_b"))
         .select(id_col, sig_col,
                 F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv")))
    if max_band_df is not None:
        counts = b.groupBy("bi", "bv").agg(F.count("*").alias("_n"))
        if observation is not None:
            hot = F.col("_n") > max_band_df
            counts = counts.observe(
                observation,
                F.coalesce(F.sum(F.when(hot, 1)), F.lit(0))
                 .alias("hot_buckets_dropped"),
                F.coalesce(F.sum(F.when(hot, F.col("_n"))), F.lit(0))
                 .alias("hot_bucket_rows"))
        cold = counts.filter(F.col("_n") <= max_band_df).drop("_n")
        b = b.join(cold, ["bi", "bv"])
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(sig_col).alias("_sha"), "bi", "bv")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(sig_col).alias("_shb"), "bi", "bv")
    cand = (left.join(right, ["bi", "bv"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_sha", "_shb")
            .distinct())
    ham = F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb"))).cast("int")
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3,
                       max_band_df: int | None = 1000,
                       observation=None) -> DataFrame:
    """Text near-dup pairs by simhash-60 hamming distance (banded — see
    :func:`hamming_band_pairs`) → ``(id_a, id_b, hamming)``."""
    return hamming_band_pairs(simhash(df, text_col, id_col), "simhash",
                              id_col, SIMHASH_BITS, max_hamming,
                              max_band_df, observation=observation)


def phash_near_pairs(images: DataFrame, phash_col: str = "phash",
                     id_col: str = "image_id",
                     max_hamming: int = 4,
                     max_band_df: int | None = 1000,
                     observation=None) -> DataFrame:
    """IMAGE near-dup pairs by 64-bit perceptual-hash hamming distance
    (banded — see :func:`hamming_band_pairs`): re-encoded / lightly edited
    copies of an image land within a few phash bits, exact copies at 0.
    Input: any frame with an id and an int64 phash column (the corpus
    `images` table stores one per payload; `functions.codec.phash64`
    computes it from decoded pixels)."""
    return hamming_band_pairs(
        images.select(id_col, phash_col), phash_col, id_col, 64,
        max_hamming, max_band_df, observation=observation)
