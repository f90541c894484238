"""Raw robots.txt text parsing — semantics pinned by the reference parse
loop (common/RobotsFile.cs:120-197) and its DisallowedTest fixture
(commonTest/RobotsTest.cs:24-38). JVM fold ≡ pure-Python reference on every
quirk class; parsed rules feed the existing HostRules/compile_rules gate.
"""

import pytest

from fetcho_spark.operators.robots import (compile_rules, parse_robots_df,
                                           parse_robots_text, robots_rules,
                                           robots_sitemaps)

# the reference's own in-test fixture (RobotsTest.cs:27)
FIXTURE = ("user-agent: *\n\ndisallow: /data/*\ndisallow: /daylight/$\n"
           "disallow: /jerk\ndisallow: /h*ray.html$")

QUIRKS = [
    FIXTURE,
    # CRLF + tab indentation + comment lines + inline '#' kept in pattern
    "User-Agent: *\r\n\t Disallow: /a#b\r\n# Disallow: /commented\r\n",
    # ONE trailing '*' chopped (RobotsFile.cs:166): '/x**' -> '/x*'
    "user-agent: *\ndisallow: /x**\nallow: /y*\ndisallow: *\n",
    # rules BEFORE any user-agent line -> inert '' group, never a crash
    "disallow: /early\nuser-agent: bot\ndisallow: /late\n",
    # empty patterns ignored; case-insensitive keywords; UA-name trim
    "USER-AGENT:  Fetcho \nDISALLOW:\nALLOW:   \nDisAllow: /Up\n",
    # sitemap lines: file-wide, collected even mid-group, trailing-* chop
    ("user-agent: a\ndisallow: /1\nsitemap: http://h/s1.xml\n"
     "user-agent: b\nSitemap: http://h/s2.xml*\nsitemap:\n"),
    # consecutive user-agent lines: each RESETS the group (reference keeps
    # only the last — no multi-UA accumulation); blank lines don't close it
    "user-agent: a\nuser-agent: b\n\ndisallow: /only-b\n",
    # unknown directives ignored; '*'-only and '#'-only lines are no-ops
    "user-agent: *\ncrawl-delay: 10\n*\n#\ndisallow: /z\n",
    "",
]


def test_reference_fixture_rules_and_gate():
    rules, sitemaps = parse_robots_text(FIXTURE)
    assert rules == [("*", "disallow", "/data/"),
                     ("*", "disallow", "/daylight/$"),
                     ("*", "disallow", "/jerk"),
                     ("*", "disallow", "/h*ray.html$")]
    assert sitemaps == []
    hr = compile_rules([("h", ua, d, p) for ua, d, p in rules])["h"]
    # the reference's own assertions (RobotsTest.cs:31-37)
    assert hr.disallowed("/jerk")
    assert hr.disallowed("/data/hooray.html")
    assert hr.disallowed("/hooray.html")
    assert not hr.disallowed("/daylight/loafo.html")
    assert hr.disallowed("/daylight/")
    assert not hr.disallowed("/index.html")
    assert not hr.disallowed("/")


def test_trailing_star_chop_is_single():
    rules, _ = parse_robots_text("user-agent: *\ndisallow: /x**\n"
                                 "disallow: *\nallow: /y*\n")
    assert rules == [("*", "disallow", "/x*"), ("*", "allow", "/y")]


def test_pre_ua_rules_are_inert_not_fatal():
    rules, _ = parse_robots_text("disallow: /early\nuser-agent: bot\n"
                                 "disallow: /late\n")
    assert rules == [("", "disallow", "/early"), ("bot", "disallow", "/late")]
    compiled = compile_rules([("h", ua, d, p) for ua, d, p in rules],
                             user_agent="fetcho")
    # the '' group is never selected for a real UA; no '*' group -> host open
    assert "h" not in compiled


def test_sitemaps_file_wide_with_chop():
    _, sitemaps = parse_robots_text(
        "sitemap: http://h/s0.xml\nuser-agent: a\n"
        "Sitemap: http://h/s1.xml*\nsitemap:\n")
    assert sitemaps == ["http://h/s0.xml", "http://h/s1.xml"]


def test_consecutive_ua_lines_reset_group():
    rules, _ = parse_robots_text("user-agent: a\nuser-agent: b\n"
                                 "disallow: /only-b\n")
    assert rules == [("b", "disallow", "/only-b")]


def test_inline_hash_is_not_a_comment():
    rules, _ = parse_robots_text("user-agent: *\ndisallow: /a#b\n")
    assert rules == [("*", "disallow", "/a#b")]


@pytest.mark.slow
def test_jvm_fold_matches_python_reference(spark):
    from fetcho_spark.operators.robots import parse_robots_rows
    rows = [(f"h{i}", body) for i, body in enumerate(QUIRKS)]
    parsed = parse_robots_df(
        spark.createDataFrame(rows, "host string, body string")).cache()
    got = {(r.host, r.user_agent, r.directive, r.pattern, r.seq)
           for r in parsed.collect()}
    want = {(h, ua, d, p, seq)
            for h, body in rows
            for seq, (ua, d, p) in enumerate(parse_robots_rows(body))}
    assert got == want
    rule_rows = {(r.host, r.user_agent, r.directive, r.pattern)
                 for r in robots_rules(parsed).collect()}
    assert rule_rows == {t[:4] for t in want if t[2] != "sitemap"}
    sm = {(r.host, r.sitemap) for r in robots_sitemaps(parsed).collect()}
    assert sm == {(t[0], t[3]) for t in want if t[2] == "sitemap"}


@pytest.mark.slow
def test_parse_feeds_existing_gate(spark):
    df = spark.createDataFrame([("rofflo.org", FIXTURE)],
                               "host string, body string")
    rules = robots_rules(parse_robots_df(df))
    rows = [tuple(r) for r in rules.collect()]
    hr = compile_rules(rows)["rofflo.org"]
    assert hr.disallowed("/data/hooray.html")
    assert not hr.disallowed("/daylight/loafo.html")
