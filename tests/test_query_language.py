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
def test_text_filter_reparse_vs_word(spark):
    """F2 ``text:`` re-parses the raw body's VISIBLE text (ComplexTextFilter
    streams BracketPipe Core fragments): script/style content must not
    match, visible content must; without a body column it degrades to the
    extracted-text match (F1)."""
    df = _results(spark).withColumn(
        "body",
        F.when(F.col("seq") == 1,
               F.lit('<p>hello world</p><script>var secret=1;</script>'
                     '<style>.x{color:red}</style>'))
         .when(F.col("seq") == 2, F.lit("<div>secret plans</div>")))
    # 'secret' is visible only on page 2; page 1 has it inside <script> only
    assert _urls(df, "text:secret") == ["http://b.example/2"]
    assert _urls(df, "text:hello") == ["http://a.example/1"]
    # text:* passes any page with a body (IsReducingFilter=false analog)
    assert _urls(df, "text:*") == ["http://a.example/1", "http://b.example/2"]
    # no body column → extracted text is the visible text (F1 behavior)
    assert _urls(_results(spark), "text:fish") == ["http://c.example/3"]


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


def _ml_docs(spark):
    rows = [
        ("http://s.ex/1", "quantum physics experiment data research theory"),
        ("http://s.ex/2", "doctor patient vaccine therapy clinic medicine"),
        ("http://s.ex/3", "team match league score coach player season"),
        ("http://s.ex/4", "zzz qqq unrelated mumble"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    return df.withColumn("tags", F.array().cast("array<string>"))


@pytest.mark.spark
def test_ml_model_classifier(spark):
    """F14: real NB classifier — label-contains match + confidence gate
    (MachineLearningModelFilter.cs:57-76)."""
    df = _ml_docs(spark)
    assert _urls(df, "ml-model(topics,0.5):Science") == ["http://s.ex/1"]
    assert _urls(df, "ml-model(topics,0.5):Health") == ["http://s.ex/2"]
    # 'any' confidence (0.01) with wildcard class: every predictable row
    assert len(_urls(df, "ml-model(topics,any):*")) == 4
    # confidence gate actually gates: threshold 1.0 matches nothing
    # (strict >), and the low-confidence Finance guess fails default 0.98
    assert _urls(df, "ml-model(topics,1):Science") == []
    assert _urls(df, "ml-model(topics):Finance") == []
    # deterministic
    assert _urls(df, "ml-model(topics,0.5):Sports") \
        == _urls(df, "ml-model(topics,0.5):Sports")
    # unknown model raises at query-compile time (ThrowIfModelDoesntExist)
    with pytest.raises(KeyError):
        Q.evaluate(df, "ml-model(nope):X")


@pytest.mark.spark
def test_geo_ip_filters(spark):
    """F13: country/city/subdivision substring + ll bounding box, over the
    broadcast geo dimension."""
    from fetcho_spark.operators.geo import bind_geo, geo_dim_df
    geo = geo_dim_df(spark, 32)
    df = (_results(spark)
          .withColumn("ip_group", F.pmod(F.xxhash64("host"), F.lit(32))))
    bound = bind_geo(df, geo)
    ref = {r["url"]: r for r in bound.collect()}
    for url, r in ref.items():
        got = _urls(bound, f"geo-ip-country:{r['geo_country']}")
        assert url in got
        got_city = _urls(bound, f"geo-ip-city:{r['geo_city']}")
        assert url in got_city
        got_sub = _urls(bound, f"geo-ip-subdivision:{r['geo_subdivision']}")
        assert url in got_sub
    # bounding box: a 1e-3-degree box around one row's coords matches it
    any_url, r0 = next(iter(ref.items()))
    la, lo = r0["geo_lat"], r0["geo_lon"]
    box = f"[[{la - 0.001},{lo - 0.001}],[{la + 0.001},{lo + 0.001}]]"
    inside = _urls(bound, f"geo-ip-ll:{box}")
    assert any_url in inside
    # whole-world box matches everything with coordinates
    assert len(_urls(bound, "geo-ip-ll:[[-90,-180],[90,180]]")) == 4
    with pytest.raises(ValueError):
        Q.evaluate(bound, "geo-ip-ll:[bogus]")


@pytest.mark.spark
def test_xpath_filter(spark):
    """F18: match = xpath selects ≥1 node; tag = first match; invalid
    xpath raises at compile (XPathFilter semantics)."""
    rows = [
        ("http://x.ex/1",
         "<html><body><div class='m'>hello <b>world</b></div></body></html>"),
        ("http://x.ex/2", "<html><body><p>nothing here</p></body></html>"),
    ]
    df = (spark.createDataFrame(rows, "url string, html string")
          .withColumn("tags", F.array().cast("array<string>")))
    got = _urls(df, "xpath://div[@class='m']")
    assert got == ["http://x.ex/1"]
    # tag form: the first matched node's recursive text becomes the tag
    tagged = Q.evaluate(df, "xpath://div[@class='m']:*")
    rows_t = tagged.collect()
    assert [r["url"] for r in rows_t] == ["http://x.ex/1"]
    assert rows_t[0]["tags"] == ["hello world"]
    with pytest.raises(ValueError):
        Q.evaluate(df, "xpath:///[")


@pytest.mark.spark
def test_fragment_dedup_window(spark):
    """F1 fragment FIFO: repeated menu fragments suppress the match within
    the window; far-apart repeats match again (TextMatchFilter.cs)."""
    menu = "home | products | about us | contact | careers | blog"
    rows = [(i, f"{menu} body text {i}" if i % 2 == 0
             else f"unique page {i} mentions products differently {i}")
            for i in range(10)]
    df = spark.createDataFrame(rows, "seq long, text string")
    kept = Q.word_match_fragment_dedup(df, "products", window=100)
    seqs = sorted(r["seq"] for r in kept.collect())
    # first menu page (seq 0) survives; later identical menu fragments are
    # suppressed; the odd pages have distinct fragments → all survive
    assert 0 in seqs
    assert all(s not in seqs for s in (2, 4, 6, 8))
    assert all(s in seqs for s in (1, 3, 5, 7, 9))
    # a window smaller than the repeat distance lets repeats through
    kept2 = Q.word_match_fragment_dedup(df, "products", window=1)
    assert sorted(r["seq"] for r in kept2.collect()) == list(range(10))


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


def test_supported_filters_introspection():
    """/supportedFilters analog: every documented filter family is listed
    with a positive cost (FilterHelpInfo over the registry)."""
    from fetcho_spark.plans.query import supported_filters
    fl = supported_filters()
    toks = {f["token"] for f in fl}
    # distinct-window (F16) is deliberately absent: it is a set-reducing
    # window over the result stream (plans.query.distinct_window), not a
    # per-row Column predicate, so it lives at the plan level
    for required in ("(word)", "text", "regex", "site", "uri", "title",
                     "has", "property", "hash", "filetype", "lang",
                     "random", "tag", "xpath", "query",
                     "ml-model", "geo-ip-country", "geo-ip-city",
                     "geo-ip-subdivision", "geo-ip-ll",
                     "request-header", "response-header"):
        assert required in toks, required
    assert all(f["cost"] > 0 for f in fl)
