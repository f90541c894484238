"""URL canonicalization — Utility.GetLinks semantics (SURVEY.md §2.8 C2)."""

from fetcho_spark.functions.urls import canonicalize, host_of, path_of


BASE = "http://h1.example/dir/page"


def test_fragment_stripped():
    assert canonicalize("http://a.example/x#frag", BASE) == "http://a.example/x"
    assert canonicalize("#frag", BASE) is None


def test_scheme_relative_inherits_base_scheme():
    assert canonicalize("//a.example/x", BASE) == "http://a.example/x"
    assert canonicalize("//a.example/x", "https://s.example/") == "https://a.example/x"


def test_triple_slash_fix():
    assert canonicalize("http:///a.example/x", BASE) == "http://a.example/x"


def test_relative_resolution():
    assert canonicalize("/abs", BASE) == "http://h1.example/abs"
    assert canonicalize("sibling", BASE) == "http://h1.example/dir/sibling"
    assert canonicalize("../up", BASE) == "http://h1.example/up"


def test_unsupported_schemes_dropped():
    for u in ("mailto:x@a.example", "javascript:void(0)", "ftp://a/b",
              "data:text/plain,x"):
        assert canonicalize(u, BASE) is None


def test_html_entity_decoding():
    assert (canonicalize("http://a.example/x?a=1&amp;b=2", BASE)
            == "http://a.example/x?a=1&b=2")


def test_case_and_port_normalization():
    assert canonicalize("HTTP://A.EXAMPLE:80/Path", BASE) == "http://a.example/Path"
    assert canonicalize("https://a.example:443/x", BASE) == "https://a.example/x"
    assert canonicalize("http://a.example:8080/x", BASE) == "http://a.example:8080/x"


def test_empty_path_becomes_slash():
    assert canonicalize("http://a.example", BASE) == "http://a.example/"


def test_length_cap():
    assert canonicalize("http://a.example/" + "x" * 2050, BASE) is None


def test_blank_and_hostless_dropped():
    assert canonicalize("", BASE) is None
    assert canonicalize(None, BASE) is None
    assert canonicalize("http://", BASE) is None


def test_host_and_path_helpers():
    assert host_of("http://A.Example:8080/x") == "a.example"
    assert path_of("http://a.example/p?q=1") == "/p?q=1"
    assert path_of("http://a.example") == "/"


def test_idempotent():
    dirty = ["http://a.example/x#f", "//a.example/y", "HTTP://A.EXAMPLE/z?a=1&amp;b=2"]
    for d in dirty:
        once = canonicalize(d, BASE)
        assert canonicalize(once, BASE) == once
