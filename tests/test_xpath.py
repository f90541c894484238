"""XPath subset evaluator (F18, functions/xpath.py) — pure-python unit
tests for the documented grammar against XPathFilter.cs-style usage."""

import pytest

from fetcho_spark.functions.xpath import xpath_select

HTML = """
<html><head><title>My Page</title></head>
<body>
  <div class="nav"><a href="/home">Home</a><a href="/about">About</a></div>
  <div class="main" id="content">
    <h1>Heading</h1>
    <p>First para</p>
    <p lang="fr">Deuxieme</p>
  </div>
  <ul><li>one<li>two<li>three</ul>
</body></html>
"""


def test_descendant_tag():
    assert xpath_select(HTML, "//p") == ["First para", "Deuxieme"]
    assert xpath_select(HTML, "//h1") == ["Heading"]


def test_child_axis_vs_descendant():
    assert xpath_select(HTML, "/html/head/title") == ["My Page"]
    assert xpath_select(HTML, "/html/title") == []
    assert xpath_select(HTML, "//title") == ["My Page"]


def test_attr_predicates():
    assert xpath_select(HTML, "//div[@class='main']/h1") == ["Heading"]
    assert xpath_select(HTML, "//div[@id]") == \
        ["Heading First para Deuxieme"]
    assert xpath_select(HTML, "//p[@lang]") == ["Deuxieme"]
    assert xpath_select(HTML, "//p[@lang='de']") == []


def test_positional_predicate():
    assert xpath_select(HTML, "//p[1]") == ["First para"]
    assert xpath_select(HTML, "//p[2]") == ["Deuxieme"]
    assert xpath_select(HTML, "//p[9]") == []


def test_terminals_text_and_attr():
    assert xpath_select(HTML, "//a/@href") == ["/home", "/about"]
    assert xpath_select(HTML, "//h1/text()") == ["Heading"]
    # text() is immediate text only — the div's own text is whitespace
    assert xpath_select(HTML, "//div[@class='main']/text()") == []


def test_unclosed_li_tolerated():
    assert xpath_select(HTML, "//li") == ["one", "two", "three"]


def test_wildcard_and_bare_name():
    assert xpath_select(HTML, "//div[@class='nav']/*") == ["Home", "About"]
    assert xpath_select(HTML, "title") == ["My Page"]  # bare == //


def test_empty_and_invalid():
    assert xpath_select(None, "//p") == []
    assert xpath_select("", "//p") == []
    for bad in ("//p/[", "//p[@a='b", "//p/text()/x", "//p[foo=bar]"):
        with pytest.raises(ValueError):
            xpath_select(HTML, bad)
