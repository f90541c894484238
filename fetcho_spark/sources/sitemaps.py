"""Sitemap XML source: robots ``Sitemap:`` URLs → seed lists.

Completes the seed pipeline the reference only starts: RobotsFile.cs
collects ``Sitemap:`` lines (common/RobotsFile.cs:191-194) but never
fetches them; here the collected URLs' documents are parsed into seed
rows — the same beyond-reference posture as the WARC source. Supports
both document kinds from sitemaps.org 0.9: ``urlset`` (page entries
with loc/lastmod/changefreq/priority) and ``sitemapindex`` (pointers
to child sitemaps), plus the common ``.xml.gz`` transport encoding.

Spark-first shape: parsing runs in ``mapInPandas`` (Arrow batches —
sitemap documents are bounded at 50k entries / 50 MB by the spec, so
one document per row is a safe task unit); a malformed document yields
an ``err`` row, never a failed job (one bad sitemap in a 10^10-URL
crawl must not abort seed ingestion). The XML walk is stdlib
ElementTree with namespace-agnostic local-name matching — real-world
sitemaps disagree on the namespace URI.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(body: bytes | str) -> tuple[str, list[dict]]:
    """One sitemap document → ``(kind, entries)``.

    ``kind`` is ``'urlset'`` or ``'sitemapindex'``; each entry is a dict
    with ``loc`` (required by the spec; entries without one are dropped)
    and optional ``lastmod`` / ``changefreq`` / ``priority`` (urlset
    only), values whitespace-trimmed, XML entities already resolved by
    the parser. Gzip transport (``.xml.gz``) is transparent. Raises
    ``ValueError`` on non-sitemap XML or garbage.
    """
    if isinstance(body, str):
        raw = body.encode()
    else:
        raw = bytes(body)
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    try:
        root = ET.fromstring(raw)
    except ET.ParseError as e:
        raise ValueError(f"sitemap: bad XML ({e})") from None
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unexpected root <{kind}>")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        entry: dict = {}
        for f in el:
            name = _local(f.tag)
            if name in _FIELDS and f.text is not None:
                entry[name] = f.text.strip()
        if entry.get("loc"):
            entries.append(entry)
    return kind, entries


SITEMAP_SCHEMA = T.StructType([
    T.StructField("sitemap_key", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority", T.StringType()),
    T.StructField("err", T.StringType()),
])


def sitemap_entries(df: DataFrame, key_col: str = "sitemap_url",
                    body_col: str = "body") -> DataFrame:
    """Distributed sitemap parse: (key, body) rows → one row per entry
    ``(sitemap_key, kind, seq, loc, lastmod, changefreq, priority,
    err)``. ``seq`` is document order. ``priority`` stays a STRING —
    the value is compared/joined, never summed, and string passthrough
    keeps it byte-exact cross-engine. A malformed document yields one
    all-null row with ``err`` set instead of failing the job.
    """
    src = df.select(F.col(key_col).alias("sitemap_key"),
                    F.col(body_col).alias("body"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, body in zip(pdf["sitemap_key"], pdf["body"]):
                try:
                    kind, entries = parse_sitemap(
                        body if isinstance(body, (bytes, bytearray))
                        else str(body))
                except Exception as e:
                    rows.append((key, None, None, None, None, None, None,
                                 str(e)[:200]))
                    continue
                for i, en in enumerate(entries):
                    rows.append((key, kind, i, en.get("loc"),
                                 en.get("lastmod"), en.get("changefreq"),
                                 en.get("priority"), None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              SITEMAP_SCHEMA.fields])

    return src.mapInPandas(run, SITEMAP_SCHEMA)


def sitemap_seeds(entries: DataFrame) -> DataFrame:
    """Page-URL seed rows from parsed entries: ``urlset`` locs only
    (``sitemapindex`` locs are CHILD SITEMAPS — feed them back through
    fetch + :func:`sitemap_entries`, not into the frontier)."""
    return (entries.filter((F.col("kind") == "urlset")
                           & F.col("loc").isNotNull())
            .select(F.col("loc").alias("url")))
