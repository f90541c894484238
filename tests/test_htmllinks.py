"""Raw-HTML / raw-text link extraction (C3) — semantics pinned by the
reference's extractors and test file:
HtmlFileLinkExtractor.cs:26-80 (a/link[href], script[src], base switch),
TextFileLinkExtractorTest.cs (raw http runs, quoted href= values)."""

import pytest

from fetcho_spark.functions.urls import canonicalize
from fetcho_spark.operators.htmllinks import (extract_html_links,
                                              extract_text_links)


def _canon_text(fragment, base="http://www.blah.com"):
    pairs = extract_text_links(fragment, base)
    return [canonicalize(h, b) for h, b in pairs]


def test_text_extractor_ported_cases():
    # TextFileLinkExtractorTest.ExtractTest, re-expressed: the reference
    # normalizes via System.Uri (adds trailing '/' on bare hosts) — our
    # canonicalizer does the same via path normalization
    assert _canon_text("https://www.test.com/") == ["https://www.test.com/"]
    assert _canon_text('<a href="https://www.blahblah.com">blah blah</a>') \
        == ["https://www.blahblah.com/"]
    assert _canon_text("<a href='https://www.blahblah.com'>blah blah</a>") \
        == ["https://www.blahblah.com/"]


def test_text_extractor_raw_runs_and_delimiters():
    got = _canon_text("see http://a.example/x and (http://b.example/y) end")
    assert got == ["http://a.example/x", "http://b.example/y"]
    # quote-delimited run stops at the closing quote
    got = _canon_text('link "http://c.example/z?q=1" trailing')
    assert got == ["http://c.example/z?q=1"]
    # html-encoded href= value is decoded before canonicalization
    got = _canon_text('x href="http://d.example/p?a=1&amp;b=2" y')
    assert got == ["http://d.example/p?a=1&b=2"]


def test_html_extractor_tags_and_base_switch():
    page = "http://h.example/dir/page"
    src = (
        '<html><head>'
        '<link href="/style.css">'
        '<script src="https://cdn.example/lib.js"></script>'
        '</head><body>'
        '<a href="one.html">1</a>'
        '<base href="http://other.example/root/">'
        '<a href="two.html">2</a>'
        '<a href="/abs">3</a>'
        '</body></html>')
    pairs = extract_html_links(src, page)
    got = [canonicalize(h, b) for h, b in pairs]
    assert got == [
        "http://h.example/style.css",          # link, pre-base
        "https://cdn.example/lib.js",          # script src
        "http://h.example/dir/one.html",       # relative, pre-base
        "http://other.example/root/two.html",  # relative, post-base
        "http://other.example/abs",            # root-relative, post-base
    ]


def test_html_extractor_ignores_other_tags_and_blank_hrefs():
    src = ('<img src="http://x.example/i.png"><a href="  ">blank</a>'
           '<a name="anchor">no href</a><a href="http://ok.example/p">k</a>')
    pairs = extract_html_links(src, "http://h.example/")
    assert [h for h, _ in pairs] == ["http://ok.example/p"]


@pytest.mark.spark
def test_extract_links_udf_modes(spark):
    from pyspark.sql import functions as F

    from fetcho_spark.operators.htmllinks import extract_links_udf
    rows = [
        ("http://h.example/a", "text/html",
         '<a href="/x">x</a><base href="http://b.example/"><a href="y">y</a>'),
        ("http://h.example/b", "text/plain",
         "raw http://c.example/z here"),
        ("http://h.example/c", "text/html", None),
    ]
    df = spark.createDataFrame(rows, "url string, content_type string, "
                                     "body string")
    out = {r["url"]: r["pairs"] for r in df.select(
        "url", extract_links_udf(F.col("body"), F.col("url"),
                                 F.col("content_type")).alias("pairs"))
        .collect()}
    assert [(p["href"], p["base"]) for p in out["http://h.example/a"]] == [
        ("/x", "http://h.example/a"), ("y", "http://b.example/")]
    assert [p["href"] for p in out["http://h.example/b"]] \
        == ["http://c.example/z"]
    assert out["http://h.example/c"] == []


# ------------------------------------------------------ anchor-text index

ANCHOR_HTML = (
    '<html><a href="https://t.example/a"><b>Bold</b>  link &amp; text</a>'
    '<a href="/rel">rel one</a>'
    '<base href="https://b.example/dir/">'
    '<a href="/rel">rel two</a>'
    '<a href="https://t.example/a">Bold link &amp; text</a>'
    '<a href="https://t.example/empty"> <b> </b> </a>'
    '<a name="no-href">skip</a></html>')


def test_extract_anchors_text_normalization_and_base_switch():
    from fetcho_spark.operators.htmllinks import extract_anchors
    got = extract_anchors(ANCHOR_HTML, "https://page.example/p")
    assert got == [
        ("https://t.example/a", "https://page.example/p",
         "Bold link & text"),
        ("/rel", "https://page.example/p", "rel one"),
        ("/rel", "https://b.example/dir/", "rel two"),
        ("https://t.example/a", "https://b.example/dir/",
         "Bold link & text"),
    ]
    assert extract_anchors(None, "u") == []
    assert extract_anchors("", "u") == []


@pytest.mark.spark
def test_anchor_stats_aggregates_canonical_targets(spark):
    from fetcho_spark.operators.htmllinks import anchor_stats
    pages = spark.createDataFrame(
        [("https://p1.example/x", ANCHOR_HTML),
         ("https://p2.example/y",
          '<a href="https://t.example/a">Bold link &amp; text</a>')],
        "url string, body string")
    got = {(r["url"], r["anchor"]): r["n_refs"]
           for r in anchor_stats(pages).collect()}
    # same target+text across pages and base switches aggregate together
    assert got[("https://t.example/a", "Bold link & text")] == 3
    # relative hrefs resolve against the EFFECTIVE base
    assert got[("https://p1.example/rel", "rel one")] == 1
    assert got[("https://b.example/rel", "rel two")] == 1
    assert not any(u.endswith("/empty") for u, _ in got)


KEYWORD_HTML = (
    "<!DOCTYPE html><html><head>"
    "<title>Page &amp; Title</title>"
    "<style>p { color: red }</style>"
    "<script>var x = 'not text';</script>"
    "</head><body>"
    "<!-- hidden note -->"
    "<p>First run</p>"
    "between tags"
    "<![if IE]>cond<![endif]>"
    "<p>  trimmed  </p>"
    "</body></html>"
)


def test_extract_keywords_reference_semantics():
    """HTMLKeywordParser.cs parity: chardata runs + comment tokens (WITH
    their delimiters, as the listener's GetText() emits them), trimmed,
    html-decoded; script/style bodies and DTDs are never chardata."""
    from fetcho_spark.operators.htmllinks import extract_keywords
    got = extract_keywords(KEYWORD_HTML)
    assert "Page & Title" in got            # entity-decoded chardata
    assert "First run" in got and "between tags" in got
    assert "trimmed" in got                 # .Trim() before emit
    assert "<!-- hidden note -->" in got    # comment WITH delimiters
    assert "<![if IE]>" in got and "<![endif]>" in got
    assert "cond" in got                    # chardata between conditionals
    assert not any("color: red" in f for f in got)      # style body
    assert not any("not text" in f for f in got)        # script body
    assert not any("DOCTYPE" in f for f in got)         # DTD
    # document order of the text fragments is preserved
    assert got.index("Page & Title") < got.index("First run") \
        < got.index("between tags") < got.index("trimmed")


def test_extract_keywords_length_bounds_and_toggles():
    from fetcho_spark.operators.htmllinks import extract_keywords
    # bounds are INCLUSIVE on the TRIMMED raw text (IsBetween)
    html = "<p>abc</p><p>abcd</p><!-- c -->"
    assert extract_keywords(html, min_len=3, max_len=3,
                            include_comments=False) == ["abc"]
    assert extract_keywords(html, min_len=4, max_len=4,
                            include_comments=False) == ["abcd"]
    # IncludeChardata / IncludeComments toggles
    assert extract_keywords(html, include_chardata=False) == ["<!-- c -->"]
    assert extract_keywords(html, include_comments=False,
                            include_chardata=False) == []
    # min_len=0 admits the reference's empty-after-trim fragments
    ws = "<p> </p><p>x</p>"
    assert extract_keywords(ws, min_len=0) == ["", "x"]
    assert extract_keywords(ws) == ["x"]
    assert extract_keywords(None) == [] and extract_keywords("") == []
    # unterminated script swallows to EOF (SCRIPT_SHORT_BODY), no crash
    assert extract_keywords("<p>a</p><script>var y=1;") == ["a"]


@pytest.mark.spark
def test_keyword_fragments_dataframe(spark):
    from fetcho_spark.operators.htmllinks import keyword_fragments
    pages = spark.createDataFrame(
        [("u1", KEYWORD_HTML), ("u2", None)], "url string, body string")
    rows = keyword_fragments(pages, min_len=1,
                             include_comments=False).collect()
    frags = [r["fragment"] for r in sorted(rows, key=lambda r: r["frag_idx"])
             if r["url"] == "u1"]
    assert frags == ["Page & Title", "First run", "between tags",
                     "cond", "trimmed"]
    assert not [r for r in rows if r["url"] == "u2"]


@pytest.mark.spark
def test_keyword_counts_max_len(spark):
    from fetcho_spark.operators.textops import keyword_counts
    df = spark.createDataFrame(
        [("one four seven elevenplus",)], "text string")
    got = {r["word"]: r["n"]
           for r in keyword_counts(df, min_len=3, max_len=5).collect()}
    assert set(got) == {"one", "four", "seven"}
