"""Sitemap XML source (sitemaps.org 0.9): urlset + sitemapindex parse,
gzip transport, err-row discipline, robots Sitemap: -> seeds pipeline."""

import gzip

import pytest

from fetcho_spark.sources.sitemaps import (parse_sitemap, sitemap_entries,
                                           sitemap_seeds)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example/p?x=1&amp;y=2 </loc>
    <lastmod>2024-01-03</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/q</loc></url>
  <url><lastmod>2024-01-04</lastmod></url>
  <other>ignored</other>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sm1.xml</loc>
           <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.example/sm2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_fields_entities_trim_and_locless_drop():
    kind, entries = parse_sitemap(URLSET)
    assert kind == "urlset"
    assert entries == [
        {"loc": "https://a.example/p?x=1&y=2", "lastmod": "2024-01-03",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://a.example/q"},
    ]


def test_parse_sitemapindex():
    kind, entries = parse_sitemap(INDEX)
    assert kind == "sitemapindex"
    assert [e["loc"] for e in entries] == [
        "https://a.example/sm1.xml", "https://a.example/sm2.xml.gz"]
    assert entries[0]["lastmod"] == "2024-02-01"


def test_parse_gzip_transport_and_weird_namespace():
    body = URLSET.replace("http://www.sitemaps.org/schemas/sitemap/0.9",
                          "https://other.ns/SITEMAP")
    kind, entries = parse_sitemap(gzip.compress(body.encode()))
    assert kind == "urlset" and len(entries) == 2


def test_parse_rejects_garbage_and_non_sitemap():
    with pytest.raises(ValueError):
        parse_sitemap(b"not xml at all <<<")
    with pytest.raises(ValueError):
        parse_sitemap("<html><body>404</body></html>")


@pytest.mark.spark
def test_sitemap_entries_and_seeds(spark):
    rows = [("s1", URLSET), ("s2", INDEX), ("s3", "garbage <<<")]
    df = spark.createDataFrame(rows, "sitemap_url string, body string")
    got = sitemap_entries(df).orderBy("sitemap_key", "seq").collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["sitemap_key"], []).append(r)
    assert [r["loc"] for r in by_key["s1"]] == [
        "https://a.example/p?x=1&y=2", "https://a.example/q"]
    assert by_key["s1"][0]["priority"] == "0.8"
    assert [r["kind"] for r in by_key["s2"]] == ["sitemapindex"] * 2
    assert by_key["s3"][0]["err"] is not None          # bad doc -> err row
    assert by_key["s3"][0]["loc"] is None
    seeds = {r["url"] for r in sitemap_seeds(sitemap_entries(df)).collect()}
    # urlset locs only; index children are NOT frontier seeds
    assert seeds == {"https://a.example/p?x=1&y=2", "https://a.example/q"}


@pytest.mark.spark
def test_robots_to_sitemap_seed_pipeline(spark):
    """robots.txt Sitemap: lines -> fetch bodies -> urlset locs as seeds."""
    from fetcho_spark.operators.robots import (parse_robots_df,
                                               robots_sitemaps)
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /private\n"
          "Sitemap: https://a.example/sitemap.xml\n")],
        "host string, body string")
    sm_urls = robots_sitemaps(parse_robots_df(robots))
    assert [r["sitemap"] for r in sm_urls.collect()] == \
        ["https://a.example/sitemap.xml"]
    # simulated fetch of the collected sitemap URL
    bodies = spark.createDataFrame(
        [("https://a.example/sitemap.xml", URLSET)],
        "sitemap_url string, body string")
    fetched = sm_urls.join(
        bodies, sm_urls.sitemap == bodies.sitemap_url).select(
        "sitemap_url", "body")
    seeds = sorted(r["url"] for r in
                   sitemap_seeds(sitemap_entries(fetched)).collect())
    assert seeds == ["https://a.example/p?x=1&y=2", "https://a.example/q"]
