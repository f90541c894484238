"""Hashed TF-IDF document vectors — the text → embedding bridge.

Feature hashing (Weinberger et al. 2009) gives every document a
fixed-``dim`` vector with no vocabulary table: token → md5 bucket,
weight = tf × integer-quantized idf. The output plugs straight into the
repo's embedding operators — semdedup's k-means, PQ/IVF ANN, the
curation cosine filters — so the text corpus gets the whole
embedding-side toolchain without a model in the loop.

Cross-engine exactness: tokens are ``textops.words_arr`` (the shared
tokenizer), buckets the dsir md5 idiom (``conv(md5[:12], 16, 10) %
dim``), idf the rank_docs integer quantization ``(SCALE * n_docs) div
df`` (monotone in log-idf — rankings identical, no libm), weights exact
BIGINTs, and the only float is the final per-document max-normalization
``w / max(w)`` — ONE correctly-rounded IEEE division of exact integers,
bit-identical in any engine, which also lands components in [0, 1]
where ``semdedup.quantize_vec``'s 1e-6 grid is overflow-safe.

Scale shape: one (id, bucket) partial-agg shuffle for tf, a ≤ dim-group
agg for document frequencies riding the same lineage, a broadcast-sized
idf join (≤ dim rows), and one groupBy(id) map assembly — no windows
over the corpus, no driver data path (n_docs is a single scalar, the
kmeans/pagerank contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import words_arr

__all__ = ["hashed_tfidf"]

SCALE = 1_000_000


def hashed_tfidf(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", dim: int = 256) -> DataFrame:
    """(id, vec_raw array<bigint>, vec array<double>) — dense hashed
    TF-IDF. ``vec_raw[b] = tf(doc, b) * ((SCALE * n_docs) div df(b))``;
    ``vec = vec_raw / max(vec_raw)`` per document (all-zero documents
    stay all-zero). Documents with no tokens still get a row."""
    n_docs = df.count()  # single driver scalar, bounded
    toks = (df.select(F.col(id_col),
                      F.explode(words_arr(F.col(text_col))).alias("_w"))
            .select(id_col,
                    (F.conv(F.substring(F.md5(F.col("_w")), 1, 12), 16, 10)
                     .cast("long") % dim).cast("int").alias("bucket")))
    tf = toks.groupBy(id_col, "bucket").agg(F.count("*").alias("tf"))
    dfb = tf.groupBy("bucket").agg(F.count("*").alias("df"))
    w = (tf.join(F.broadcast(dfb), "bucket")
         .select(id_col, "bucket",
                 (F.col("tf") * F.expr(f"({SCALE}L * {n_docs}L) div df"))
                 .alias("w")))
    dense = (w.groupBy(id_col)
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("bucket", "w"))).alias("_m"))
             .select(F.col(id_col),
                     F.transform(
                         F.sequence(F.lit(0), F.lit(dim - 1)),
                         lambda i: F.coalesce(
                             F.element_at("_m", i.cast("int")),
                             F.lit(0).cast("long"))).alias("vec_raw")))
    all_ids = df.select(F.col(id_col)).distinct()
    filled = (all_ids.join(dense, id_col, "left")
              .select(id_col,
                      F.coalesce(
                          "vec_raw",
                          F.array_repeat(F.lit(0).cast("long"), dim))
                      .alias("vec_raw")))
    # stage the max as a column FIRST: an expression referenced inside a
    # higher-order-function lambda is re-evaluated PER ELEMENT, so an
    # inlined array_max would run O(dim) times per row (the
    # word_ngrams_arr staging lesson; r6 optimization)
    staged = filled.withColumn("_wmax",
                               F.array_max("vec_raw").cast("double"))
    wmax = F.col("_wmax")
    return staged.select(
        id_col, "vec_raw",
        F.when(wmax > 0,
               F.transform("vec_raw",
                           lambda x: x.cast("double") / wmax))
        .otherwise(F.transform("vec_raw",
                               lambda x: F.lit(0.0))).alias("vec"))
