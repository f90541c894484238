"""Workspace query language — parse + evaluate semantics pinned by
commonTest/QueryTest.cs:21-92 (re-expressed against DataFrames)."""

import pytest
from pyspark.sql import functions as F

from fetcho_spark.plans import query as Q


def _results(spark):
    rows = [
        # url, host, title, text, props, content_type, data_hash, lang, seq
        ("http://a.example/1", "a.example", "Cats and dogs",
         "all about cats and dogs", {"og_title": "Cats"}, "text/html", "aa", "en", 1),
        ("http://b.example/2", "b.example", "Dogs only",
         "all about dogs", {}, "text/html", "bb", "en", 2),
        ("http://c.example/3", "c.example", "Fish",
         "fish are wet pets", {"og_title": ""}, "image/jpeg", "cc", "fr", 3),
        ("http://a.example/4", "a.example", "More cats",
         "cats cats cats", {"author": "x"}, "text/html", "aa", "en", 4),
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, title string, text string, "
              "props map<string,string>, content_type string, "
              "data_hash string, lang string, seq long")
    return df.withColumn("tags", F.array().cast("array<string>")) \
             .withColumn("req_headers", F.create_map().cast("map<string,string>")) \
             .withColumn("resp_headers", F.create_map().cast("map<string,string>"))


def _urls(df, qtext):
    return sorted(r["url"] for r in Q.evaluate(df, qtext).collect())


@pytest.mark.spark
def test_simple_word_and_exclude(spark):
    df = _results(spark)
    assert _urls(df, "cats") == ["http://a.example/1", "http://a.example/4"]
    assert _urls(df, "cats -dogs") == ["http://a.example/4"]


@pytest.mark.spark
def test_implicit_and_and_ignored_token(spark):
    df = _results(spark)
    assert _urls(df, "cats and about") == ["http://a.example/1"]


@pytest.mark.spark
def test_or_across_site_terms(spark):
    # QueryTest.cs:63-78 — OR of three site: terms
    df = _results(spark)
    assert _urls(df, "site:a.example OR site:b.example OR site:c.example") \
        == _urls(df, "uri:http")
    assert _urls(df, "site:b.example OR site:c.example") == [
        "http://b.example/2", "http://c.example/3"]


@pytest.mark.spark
def test_filter_prefixes(spark):
    df = _results(spark)
    assert _urls(df, "title:fish") == ["http://c.example/3"]
    assert _urls(df, "uri:example/2") == ["http://b.example/2"]
    assert _urls(df, "filetype:image") == ["http://c.example/3"]
    assert _urls(df, "hash:aa") == ["http://a.example/1", "http://a.example/4"]
    assert _urls(df, "lang:fr") == ["http://c.example/3"]


@pytest.mark.spark
def test_has_and_property(spark):
    df = _results(spark)
    # has: needs non-empty value (c.example has og_title but empty)
    assert _urls(df, "has:og_title") == ["http://a.example/1"]
    assert _urls(df, "property(og_title):cat") == ["http://a.example/1"]


@pytest.mark.spark
def test_regex_filter_and_invalid_regex_raises(spark):
    df = _results(spark)
    assert _urls(df, "regex:c.ts") == ["http://a.example/1", "http://a.example/4"]
    with pytest.raises(Exception):
        Q.parse_query("regex:((")
        Q.compile_query(Q.parse_query("regex:(("))


@pytest.mark.spark
def test_tagging_mode(spark):
    df = _results(spark)
    out = {r["url"]: r["tags"] for r in
           Q.evaluate(df, "cats site:a.example:*").collect()}
    assert set(out) == {"http://a.example/1", "http://a.example/4"}
    assert all(t == ["a.example"] for t in out.values())


@pytest.mark.spark
def test_tagger_only_term(spark):
    df = _results(spark)
    out = Q.evaluate(df, "dogs title::*").collect()
    by_url = {r["url"]: r["tags"] for r in out}
    assert by_url["http://b.example/2"] == ["Dogs only"]


@pytest.mark.spark
def test_quoted_strings_and_comments(spark):
    df = _results(spark)
    assert _urls(df, '"about cats" // trailing comment\n') == \
        ["http://a.example/1"]


@pytest.mark.spark
def test_subquery_filter(spark):
    df = _results(spark)
    Q.SUBQUERIES["k1"] = "site:a.example"
    try:
        assert _urls(df, "query(k1):x cats") == [
            "http://a.example/1", "http://a.example/4"]
    finally:
        Q.SUBQUERIES.clear()


@pytest.mark.spark
def test_ml_model_stub_deterministic(spark):
    df = _results(spark)
    a = _urls(df, "ml-model(m1):class_")
    b = _urls(df, "ml-model(m1):class_")
    assert a == b and len(a) == 4  # every row gets some class_N label


@pytest.mark.spark
def test_distinct_window(spark):
    df = _results(spark)
    kept = Q.distinct_window(df, "data_hash", n=2)
    # seq 1 and 4 share hash 'aa', gap 3 > 2 → both kept
    assert kept.count() == 4
    kept2 = Q.distinct_window(df, "data_hash", n=5)
    assert sorted(r["seq"] for r in kept2.collect()) == [1, 2, 3]


@pytest.mark.spark
def test_paging_and_random(spark):
    df = _results(spark).withColumn("updated", F.col("seq"))
    page = Q.page_results(df, "sequence:desc", offset=1, count=2).collect()
    assert [r["seq"] for r in page] == [3, 2]
    r1 = [r["url"] for r in Q.random_results(df, 2).collect()]
    r2 = [r["url"] for r in Q.random_results(df, 2).collect()]
    assert r1 == r2 and len(r1) == 2  # seeded → stable
