"""Line-granular corpus cleaning: cross-document line dedup and the C4
line/document quality filters.

Reference context: fetcho stores whole page text (common/Entities/
WorkspaceResult.cs carries the page body; reado consumes it verbatim) and
has no corpus-cleaning stage — these operators are the training-data
counterpart the north rule adds: the RefinedWeb/CCNet line-dedup rule
(drop a line appearing in >= min_df documents — navigation chrome, cookie
banners, footers) and the C4 heuristics (Raffel et al. 2020 §2.2: keep
lines ending in terminal punctuation with >= 3 words, drop javascript
lines, drop lorem-ipsum/brace documents, require >= 3 kept sentences).

Scale shape (100 TB):
- ONE explode pass over documents collapses to (doc, line-hash) groups
  carrying their (pos, line) occurrences; document frequency is then a
  window count over the hash on those already-collapsed rows — the same
  single-scan-lineage choice as ``textops.duplicate_spans`` (a join
  formulation re-computes the explode subtree on both sides of the
  join, doubling the corpus scan);
- document frequency, not occurrence count: in-doc repetition never
  promotes a line to boilerplate;
- reassembly flattens the surviving occurrence lists per doc and
  sort_arrays inside the row — document text never funnels through a
  driver or a corpus-wide window;
- the C4 filters are pure per-row projections (zero shuffle) except the
  final doc-level sentence count, which rides the same reassembly agg.
"""

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# C4's sentence-end heuristic: terminal punctuation, optionally followed
# by a closing quote.  Kept as a shared constant so the SQL twin in
# __spark_entry__ quotes the exact same pattern.
TERMINAL_RE = r'[.!?]["”]?$'
MIN_WORDS_PER_LINE = 3
MIN_SENTENCES_PER_DOC = 3
BAD_LINE_RE = r"javascript|cookies? (policy|enabled)"
BAD_DOC_RE = r"lorem ipsum|\{"


def _lines_with_pos(df: DataFrame, key_col: str, text_col: str):
    """Explode text into (key, pos, line, norm) rows; norm is the dedup
    key (trimmed, case-folded) and blank lines are dropped outright."""
    ln = (df.select(F.col(key_col),
                    F.posexplode(F.split(F.col(text_col), "\n"))
                    .alias("pos", "line"))
          .withColumn("norm", F.lower(F.trim(F.col("line"))))
          .filter(F.col("norm") != ""))
    return ln


def line_dedup(df: DataFrame, key_col: str = "doc_id",
               text_col: str = "text", min_df: int = 2) -> DataFrame:
    """Remove every line that occurs in >= ``min_df`` distinct documents.

    Returns ``(key, text, n_lines, n_removed)`` — text is the surviving
    lines rejoined with newlines in original order (blank lines are
    always collapsed away).  A document whose lines are all boilerplate
    survives with empty text so downstream length filters decide its
    fate; rows never silently disappear here.
    """
    ln = _lines_with_pos(df, key_col, text_col)
    per = (ln.groupBy(key_col, F.xxhash64("norm").alias("h"))
           .agg(F.collect_list(F.struct("pos", "line")).alias("occs")))
    # corpus document-frequency as a window over the hash on the
    # collapsed (doc, hash) rows — one scan lineage, no join recompute
    tagged = per.withColumn(
        "dup", F.count("*").over(Window.partitionBy("h")) >= min_df)
    n_occ = F.size("occs").cast("long")
    agg = (tagged.groupBy(key_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.flatten(F.collect_list(
                            F.when(~F.col("dup"), F.col("occs"))))),
                        lambda s: s["line"]),
                    "\n").alias("text"),
                F.sum(n_occ).alias("n_lines"),
                F.sum(F.when(F.col("dup"), n_occ).otherwise(F.lit(0)))
                .alias("n_removed")))
    # all-blank documents have no line rows at all — restore them so the
    # operator is total over its input keys
    return (df.select(key_col).join(agg, key_col, "left")
            .select(key_col,
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed")))


def _kept_line(line: Column) -> Column:
    t = F.trim(line)
    return ((F.size(F.split(t, r"\s+")) >= MIN_WORDS_PER_LINE)
            & t.rlike(TERMINAL_RE)
            & ~F.lower(t).rlike(BAD_LINE_RE))


def c4_filter(df: DataFrame, key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) as one zero-shuffle-per-line
    pass: line rule = ends in terminal punctuation AND >= 3 words AND no
    javascript/cookie notice; doc rule = no lorem-ipsum / '{' anywhere
    AND >= 3 kept lines.

    Returns ``(key, text, n_kept, n_dropped, keep_doc)`` with text = the
    kept lines; dropped documents are returned flagged, not filtered, so
    callers can audit the cut (filter on keep_doc for the C4 corpus).
    """
    # stage the arrays: each bare-expression reference re-runs the split
    # and filters per use (textops staged-array discipline)
    staged = df.select(
        F.col(key_col),
        F.filter(F.split(F.col(text_col), "\n"),
                 lambda l: F.trim(l) != "").alias("_ls"),
        F.lower(F.col(text_col)).rlike(BAD_DOC_RE).alias("_bad"))
    staged = staged.select(
        F.col(key_col), "_ls", "_bad",
        F.filter(F.col("_ls"), _kept_line).alias("_kept"))
    kept = F.col("_kept")
    return staged.select(
        F.col(key_col),
        F.array_join(F.transform(kept, F.trim), "\n").alias("text"),
        F.size(kept).alias("n_kept"),
        (F.size("_ls") - F.size(kept)).alias("n_dropped"),
        (~F.col("_bad") & (F.size(kept) >= MIN_SENTENCES_PER_DOC))
        .alias("keep_doc"))
