"""Block-partitioned inverted-index builder.

Reference context: reado walks packets and extracts per-page keyword
term counts (reado/ExtractKeywordsConsumer.cs:9-70 over
common/ContentReader/WordTokenizer.cs) which feed the workspace word
filters; ``textops.keyword_counts`` covers the corpus-rollup side (A5).
This operator builds the actual searchable artifact those filters
imply: term -> posting lists of (doc, tf).

Scale shape (100 TB): naive ``groupBy(term).collect_list`` puts a
whole posting list in ONE row — for a stopword-frequency term that row
is corpus-sized and the task holding it dies at scale. Postings are
therefore blocked by document-id range (``block_size`` docs per
block): every output row is bounded by the block span regardless of
term frequency, hot terms just produce more rows, and a range of the
index can be read/updated by block pruning. Two partial-aggregated
shuffles total (term×doc tf, then term×block assembly); the per-term
document frequency rides a window over the already-collapsed block
rows, not a third corpus pass.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import words_arr


def inverted_index(df: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text", min_len: int = 3,
                   block_size: int = 1024) -> DataFrame:
    """Build ``(term, block_id, postings, block_df, df)`` where postings
    is the doc-id-sorted ``array<struct<key, tf>>`` for that term within
    the block ``[block_id * block_size, …)`` and ``df`` is the term's
    total document frequency. Terms shorter than ``min_len`` are dropped
    (WordTokenizer's keyword discipline)."""
    toks = (df.select(F.col(key_col),
                      F.explode(words_arr(F.col(text_col))).alias("term"))
            .filter(F.length("term") >= min_len))
    tf = (toks.groupBy("term", key_col)
          .agg(F.count("*").alias("tf")))
    blocked = tf.withColumn(
        "block_id", F.expr(f"{key_col} div {block_size}"))
    idx = (blocked.groupBy("term", "block_id")
           .agg(F.array_sort(F.collect_list(
                    F.struct(F.col(key_col), F.col("tf"))))
                .alias("postings"),
                F.count("*").alias("block_df")))
    return idx.withColumn(
        "df", F.sum("block_df").over(Window.partitionBy("term")))


def rank_docs(df: DataFrame, query_terms: list, top_k: int = 20,
              key_col: str = "doc_id", text_col: str = "text",
              min_len: int = 3, q: int = 10**6) -> DataFrame:
    """TF-IDF ranked retrieval → top ``top_k`` ``(key, score_q)`` for a
    bag-of-terms query (the reado/FetchoAPI word-search direction,
    ranked instead of boolean).

    idf is integer-quantized as ``(q * N) // df`` — a monotone rational
    transform of the true log idf for any fixed df ordering, engine-
    exact — and ``score_q = sum(tf * idf_q)`` over the query terms.

    Scale shape: the term filter lands BEFORE the tf aggregation, so
    only postings of query terms shuffle (query-sized, not
    corpus-vocabulary-sized); df for those terms is a second bounded
    agg; final top-k is TakeOrderedAndProject. Ties break on key for
    determinism.
    """
    n = df.count()
    toks = (df.select(F.col(key_col),
                      F.explode(words_arr(F.col(text_col))).alias("term"))
            .filter(F.length("term") >= min_len)
            .filter(F.col("term").isin([t.lower() for t in query_terms])))
    tf = toks.groupBy("term", key_col).agg(F.count("*").alias("tf"))
    # L-suffixed literals: bare ints parse as 32-bit and q * N overflows
    # under ANSI for corpora past ~2k docs
    dfreq = (tf.groupBy("term").agg(F.count("*").alias("df"))
             .withColumn("idf_q", F.expr(f"({q}L * {n}L) div df")))
    return (tf.join(dfreq, "term")
            .groupBy(key_col)
            .agg(F.sum(F.col("tf") * F.col("idf_q")).alias("score_q"))
            .orderBy(F.desc("score_q"), F.col(key_col))
            .limit(top_k))


def postings_str(key_col: str = "doc_id"):
    """Canonical 'doc:tf doc:tf …' rendering of a postings array (for
    cross-engine comparison and text dumps)."""
    return F.array_join(
        F.transform(F.col("postings"),
                    lambda s: F.concat_ws(":", s[key_col], s["tf"])), " ")
