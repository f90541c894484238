"""Seed-list sources: HackerNews front pages + Reddit submission JSON.

Re-expresses the reference's live seed fetchers as distributed parsers
over already-fetched documents (the north rule sanctions synthetic
corpora, so no live HTTP — the FORMATS are real, the bytes come from
the corpus):

- ``common/Net/HackerNewsFrontPageFetcher.cs:25-49`` — front-page HTML
  → every ``<a>`` whose href contains ``item?id=`` → the text after
  the FIRST ``=`` must parse as a 32-bit int (``GetHrefId`` :62-68) →
  the item record (Firebase JSON, ``HackerNewsItem.cs``) must have
  ``type == "story"`` and a non-empty well-formed absolute ``url``.
- ``common/Net/RedditSubmissionFetcher.cs:14-47`` — pushshift response
  JSON → ``data[]`` children; a child with null ``url`` OR null
  ``link_flair_text`` is skipped (``:34``).
- ``fetcho/Commands/FetchControloCommand.cs:62-101`` — both feed
  ``MakeQueueItem`` → queue injection; :func:`seeds_to_frontier` is
  the frontier-row analog.

Spark-first shape: the HN anchor scan is one JVM ``regexp_extract_all``
and the item/submission records parse via ``from_json`` — zero Python
in any path, all filters Catalyst expressions, so Catalyst prunes and
pushes down freely and a malformed record drops as a null row, never a
failed job (one bad page in a 10^10-URL crawl must not abort seeding).

Documented approximations vs the C# (each over-accepts nothing the
crawl would keep anyway):

- anchors are matched as ``<a ... href="...">`` with double-quoted
  hrefs (HtmlAgilityPack also accepts single-quoted; HN itself emits
  double quotes);
- ``int.TryParse`` is mirrored as trim + optional sign + digits +
  32-bit range;
- ``Uri.IsWellFormedUriString(url, Absolute)`` is mirrored as
  ``scheme://host[...]`` with no whitespace — other absolute forms
  (``mailto:``) would be dropped by the P2 scheme whitelist at
  frontier entry regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Firebase item record (common/Net/HackerNewsItem.cs) — fields the
# pipeline reads; unknown JSON fields are ignored by from_json.
HN_ITEM_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("type", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("score", T.IntegerType()),
    T.StructField("time", T.LongType()),
    T.StructField("by", T.StringType()),
])

# pushshift search/submission response (RedditSubmissionFetcher.cs:32-40
# reads only url + link_flair_text out of each child)
REDDIT_SCHEMA = T.StructType([
    T.StructField("data", T.ArrayType(T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("link_flair_text", T.StringType()),
    ])))
])

_HREF_RE = r'<[aA]\b[^>]*\bhref="([^"]*)"'
# Uri.IsWellFormedUriString(…, Absolute) approximation: scheme://host,
# no whitespace anywhere (C# rejects unescaped spaces)
_ABS_URL_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^\s/?#]\S*$"


def hn_item_refs(pages: DataFrame, page_col: str = "page_url",
                 body_col: str = "body") -> DataFrame:
    """Front-page HTML rows → one row per ``item?id=`` anchor:
    ``(page_url, seq, item_id)``.

    ``seq`` is the anchor's position among the page's MATCHING anchors
    (the reference iterates ``//a[contains(@href,'item?id=')]`` in
    document order and fetches the item once per anchor — multiplicity
    is preserved, not deduped). ``item_id`` mirrors ``GetHrefId`` +
    ``int.TryParse``: everything after the FIRST ``=``, trimmed, must
    be an optionally-signed integer in 32-bit range; anchors whose
    suffix fails to parse yield no row (e.g. ``href="from=me&item?id=7"``
    — after the first ``=`` the text is ``me&item?id=7``, not an int,
    exactly as the C# drops it).
    """
    hrefs = F.filter(
        F.regexp_extract_all(F.col(body_col), F.lit(_HREF_RE), F.lit(1)),
        lambda h: h.contains("item?id="))
    rows = (pages
            .select(F.col(page_col).alias("page_url"),
                    F.posexplode(hrefs).alias("seq", "href")))
    id_str = F.trim(F.expr("substring(href, instr(href, '=') + 1)"))
    item_id = F.when(
        id_str.rlike(r"^[+-]?[0-9]+$")
        & id_str.try_cast("long").between(-(2 ** 31), 2 ** 31 - 1),
        id_str.cast("int"))
    return (rows.withColumn("item_id", item_id)
            .filter(F.col("item_id").isNotNull())
            .select("page_url", F.col("seq").cast("int"), "item_id"))


def hn_parse_items(items_json: DataFrame,
                   body_col: str = "body") -> DataFrame:
    """Raw Firebase item JSON rows → typed item rows (HN_ITEM_SCHEMA
    columns). Malformed JSON → all-null struct → dropped (the C#
    returns null from GetItem on a bad response and skips it)."""
    p = F.from_json(F.col(body_col), HN_ITEM_SCHEMA)
    return (items_json
            .select(*[p[f.name].alias(f.name)
                      for f in HN_ITEM_SCHEMA.fields])
            .filter(F.col("id").isNotNull()))


def hn_story_links(pages: DataFrame, items: DataFrame,
                   page_col: str = "page_url",
                   body_col: str = "body") -> DataFrame:
    """The full HackerNewsFrontPageFetcher.GetLinks pipeline:
    ``(page_url, seq, item_id, url, title, score)`` — one row per
    front-page anchor whose item is a ``story`` with a non-empty
    well-formed absolute url (HackerNewsFrontPageFetcher.cs:41-44).

    ``items`` carries HN_ITEM_SCHEMA columns (from
    :func:`hn_parse_items` or any equi-shaped source). The join is an
    equi-join on item id — the item side is the small dimension
    (one row per story id), so at corpus scale Catalyst broadcasts it
    under the usual threshold and shuffles on id past it; the anchor
    side never collects.
    """
    refs = hn_item_refs(pages, page_col, body_col)
    stories = (items
               .filter((F.col("type") == "story")
                       & F.col("url").isNotNull()
                       & (F.length("url") > 0)
                       & F.col("url").rlike(_ABS_URL_RE))
               .select(F.col("id").alias("item_id"),
                       "url", "title", "score"))
    return (refs.join(stories, "item_id")
            .select("page_url", "seq", "item_id", "url", "title", "score"))


def reddit_submission_links(responses: DataFrame, src_col: str = "src",
                            body_col: str = "body") -> DataFrame:
    """pushshift response JSON rows → ``(src, seq, url,
    link_flair_text)`` — one row per ``data[]`` child that has BOTH
    ``url`` and ``link_flair_text`` non-null
    (RedditSubmissionFetcher.cs:34: ``if (child["url"] == null ||
    child["link_flair_text"] == null) continue``).

    ``seq`` is the child's index in the ORIGINAL array (encounter
    order), so callers can reconstruct the reference's append order
    even after the null-skip filter. Malformed JSON parses to a null
    ``data`` array and yields no rows.
    """
    p = F.from_json(F.col(body_col), REDDIT_SCHEMA)
    rows = (responses
            .select(F.col(src_col).alias("src"),
                    F.posexplode_outer(p["data"]).alias("seq", "child"))
            .filter(F.col("child.url").isNotNull()
                    & F.col("child.link_flair_text").isNotNull()))
    return rows.select("src", F.col("seq").cast("int"),
                       F.col("child.url").alias("url"),
                       F.col("child.link_flair_text")
                       .alias("link_flair_text"))


def seeds_to_frontier(urls: DataFrame, url_col: str = "url",
                      round_added: int = 0) -> DataFrame:
    """Seed URLs → frontier-shaped rows ``(url, src_url, round_added)``
    — the FetchControloCommand.MakeQueueItem analog. ``src_url`` is
    null: injected seeds have no source page, which is exactly the
    !CanBeDiscarded marker S7's redirect hop keys off (QueueItem
    semantics). Callers pass the result straight to ``CrawlConfig``
    seeds or union it into a round's frontier; canonicalization happens
    at frontier entry like every other URL (the crawl owns the C2
    contract — seed sources stay format parsers)."""
    return urls.select(
        F.col(url_col).alias("url"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(round_added).cast("int").alias("round_added"))
