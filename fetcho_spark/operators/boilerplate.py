"""Main-content extraction: HTML boilerplate-block classification.

The step between the crawl's link extraction (operators/htmllinks.py, the
reference's TextFileLinkExtractor analog) and the corpus-level text
filters (lines.c4_filter, textops.gopher_repetition): a fetched HTML page
is mostly navigation, footers, cookie banners and ad scaffolding; an LLM
training pipeline wants the article. This implements the context-free
core of jusText (Pomikálek 2011) / trafilatura-style block
classification: split the page into blocks at block-level tag boundaries,
score each block's length, link density and stopword density, keep the
content-like blocks. (jusText's second, neighbour-propagation pass is
deliberately omitted — it needs per-document sequential state for a
quality gain the corpus-level filters downstream largely recover;
documented divergence, not an accident.)

Reference context: fetcho extracts links and titles but ships whole raw
pages into the workspace (common/ResourceFetchers, reado query surface);
boilerplate removal is part of the LLM-training-data axis the north rule
adds on top.

Cross-engine exactness: every step is a regexp/string/array operation in
the Java-and-RE2-shared subset the repo already relies on (pii_scrub,
robots_parse): explicit character classes (never \\s / \\p{...}),
(?i)/(?s) flags, non-greedy repetition, no backreferences. All
classification comparisons are INTEGER cross-multiplications
(``100*anchor_len >= pct*total_len``) — no float anywhere, so verdicts
are bit-identical in any engine and the DuckDB gate twin mirrors the
pipeline literally.

Scale shape: one zero-shuffle JVM projection per document — regexp
replaces, one split, and array transforms over the block list; no join,
no agg, no Python. At 100 TB this runs at parquet-scan speed and
whole-stage codegen keeps it fused with the downstream filters.

Anchor accounting: ``<a ...>`` / ``</a>`` are rewritten to \\x01 / \\x02
markers BEFORE tags are stripped, so anchor text survives the strip and
per-block link chars = the marker-delimited spans' lengths (an aggregate
over the \\x01-split segments). Inline markup inside anchors is stripped
like any other tag; script/style/comment bodies are removed before any
splitting so their payloads can't mint phantom blocks.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["block_classify", "extract_content", "classify_blocks_local",
           "STOPWORDS", "BLOCK_TAG_RE"]

# block-level HTML elements whose open/close tags delimit text blocks.
# `(?:[ \t\r\n][^>]*)?>` — attributes only after explicit whitespace, so
# the `li` branch can never eat `<link ...>` etc.
_BLOCK_TAGS = ("p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
               "|blockquote|pre|section|article|header|footer|nav|aside"
               "|form|fieldset|main|figure|figcaption|hr|br")
BLOCK_TAG_RE = f"(?i)</?(?:{_BLOCK_TAGS})(?:[ \\t\\r\\n][^>]*)?>"

_SCRIPT_RE = "(?is)<script(?:[ \\t\\r\\n][^>]*)?>.*?</script[ \\t\\r\\n]*>"
_STYLE_RE = "(?is)<style(?:[ \\t\\r\\n][^>]*)?>.*?</style[ \\t\\r\\n]*>"
_COMMENT_RE = "(?s)<!--.*?-->"
_A_OPEN_RE = "(?i)<a(?:[ \\t\\r\\n][^>]*)?>"
_A_CLOSE_RE = "(?i)</a(?:[ \\t\\r\\n][^>]*)?>"
_TAG_RE = "<[^>]*>"
_WS_RE = "[ \\t\\r\\n]+"
_TRAIL_PUNCT_RE = "[.,!?;:]+$"

# (entity, replacement) applied in ORDER — &amp; must be last so
# double-escaped entities don't cascade.
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
            ("&nbsp;", " "), ("&copy;", "(c)"), ("&amp;", "&")]

# minimal English function-word list (jusText ships per-language lists;
# the gate corpus is English-shaped word soup + injected glue)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "on", "is",
             "are", "was", "it", "this", "that", "with", "for", "as", "at",
             "by", "be", "from"]

MIN_LEN = 25      # chars: shorter blocks are boilerplate ("short")
LINK_PCT = 30     # bad if 100*anchor_len >= LINK_PCT*total_len ("links")
STOP_PCT = 20     # good needs 100*n_stop >= STOP_PCT*n_words ...
LONG_LEN = 150    # ... unless the block is this long ("long" rescue)


def _classified_blocks(html: Column,
                       min_len: int = MIN_LEN, link_pct: int = LINK_PCT,
                       stop_pct: int = STOP_PCT,
                       long_len: int = LONG_LEN) -> Column:
    """array<struct(text, total_len, anchor_len, n_words, n_stop, keep)>
    for the non-empty blocks of one HTML column — a single JVM
    expression."""
    h = F.regexp_replace(html, _SCRIPT_RE, "")
    h = F.regexp_replace(h, _STYLE_RE, "")
    h = F.regexp_replace(h, _COMMENT_RE, "")
    h = F.regexp_replace(h, _A_OPEN_RE, "\x01")
    h = F.regexp_replace(h, _A_CLOSE_RE, "\x02")
    blocks = F.split(h, BLOCK_TAG_RE)

    def _measure(b: Column) -> Column:
        t = F.regexp_replace(b, _TAG_RE, "")
        for ent, rep in ENTITIES:
            t = F.replace(t, F.lit(ent), F.lit(rep))
        t = F.trim(F.regexp_replace(t, _WS_RE, " "))
        clean = F.replace(F.replace(t, F.lit("\x01"), F.lit("")),
                          F.lit("\x02"), F.lit(""))
        anchor_len = F.aggregate(
            F.slice(F.split(t, "\x01"), 2, 1 << 30),
            F.lit(0).cast("long"),
            lambda acc, seg: acc + F.length(
                F.split(seg, "\x02").getItem(0)))
        words = F.filter(F.split(clean, " "), lambda w: F.length(w) > 0)
        # isin = Catalyst InSet (hashed membership), not a per-word scan
        # of a rebuilt literal array — same verdicts, measured ~2x
        # faster cold on the bench corpus (r6 optimization)
        stops = F.filter(words, lambda w: F.regexp_replace(
            F.lower(w), _TRAIL_PUNCT_RE, "").isin(*STOPWORDS))
        return F.struct(clean.alias("text"),
                        F.length(clean).cast("long").alias("total_len"),
                        anchor_len.alias("anchor_len"),
                        F.size(words).cast("long").alias("n_words"),
                        F.size(stops).cast("long").alias("n_stop"))

    measured = F.transform(blocks, _measure)
    nonempty = F.filter(measured, lambda s: s["total_len"] > 0)
    return F.transform(nonempty, lambda s: s.withField(
        "keep",
        (s["total_len"] >= F.lit(min_len))
        & (F.lit(100) * s["anchor_len"]
           < F.lit(link_pct) * s["total_len"])
        & ((F.lit(100) * s["n_stop"] >= F.lit(stop_pct) * s["n_words"])
           | (s["total_len"] >= F.lit(long_len)))))


def block_classify(df: DataFrame, html_col: str = "html",
                   id_col: str = "doc_id", **thresholds) -> DataFrame:
    """Block-level audit: one row per non-empty text block →
    ``(id, block_idx, text, total_len, anchor_len, n_words, n_stop,
    keep)``. Blocks are marked, never silently removed (the
    drop_reasons discipline of curation.py) — `extract_content` is the
    keep-only view."""
    b = _classified_blocks(F.col(html_col), **thresholds)
    return (df.select(F.col(id_col), F.posexplode(b).alias("block_idx", "s"))
            .select(id_col, "block_idx", "s.text", "s.total_len",
                    "s.anchor_len", "s.n_words", "s.n_stop", "s.keep"))


def extract_content(df: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id", **thresholds) -> DataFrame:
    """Document-level view: ``(id, content, n_blocks, n_kept)`` where
    content = kept blocks joined by newline. Zero shuffle."""
    b = _classified_blocks(F.col(html_col), **thresholds)
    kept = F.filter(b, lambda s: s["keep"])
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
        .alias("content"),
        F.size(b).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"))


def classify_blocks_local(html: str, min_len: int = MIN_LEN,
                          link_pct: int = LINK_PCT,
                          stop_pct: int = STOP_PCT,
                          long_len: int = LONG_LEN) -> list[dict]:
    """Pure-Python twin with IDENTICAL semantics (same regexes, same
    integer comparisons) — the unit-test reference."""
    h = re.sub(_SCRIPT_RE, "", html)
    h = re.sub(_STYLE_RE, "", h)
    h = re.sub(_COMMENT_RE, "", h)
    h = re.sub(_A_OPEN_RE, "\x01", h)
    h = re.sub(_A_CLOSE_RE, "\x02", h)
    out = []
    for b in re.split(BLOCK_TAG_RE, h):
        t = re.sub(_TAG_RE, "", b)
        for ent, rep in ENTITIES:
            t = t.replace(ent, rep)
        t = re.sub(_WS_RE, " ", t).strip()
        clean = t.replace("\x01", "").replace("\x02", "")
        if not clean:
            continue
        anchor_len = sum(len(seg.split("\x02")[0])
                         for seg in t.split("\x01")[1:])
        words = [w for w in clean.split(" ") if w]
        n_stop = sum(1 for w in words
                     if re.sub(_TRAIL_PUNCT_RE, "", w.lower()) in STOPWORDS)
        keep = (len(clean) >= min_len
                and 100 * anchor_len < link_pct * len(clean)
                and (100 * n_stop >= stop_pct * len(words)
                     or len(clean) >= long_len))
        out.append({"text": clean, "total_len": len(clean),
                    "anchor_len": anchor_len, "n_words": len(words),
                    "n_stop": n_stop, "keep": keep})
    return out
