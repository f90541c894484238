"""The workspace standing-query language → Catalyst Columns (SURVEY.md §2.3).

Grammar (reference: common/Query/Query.cs:108-253, tokenizer :306-332;
README.md:19-40): whitespace-separated terms; quoted strings; ``//`` comments;
``-term`` excludes; ``term:value`` filter; ``term:value:tag`` filter + tag;
``term::*`` tagger-only; ``OR`` binary operator; juxtaposition = AND ("and"
token ignored). Filters carry a static cost; evaluation is cheapest-first with
exclude-mode costs ×1000 (Query.cs:65-87, Filter.cs:61) — reproduced here by
building the conjunction cheap-first so Catalyst keeps native predicates ahead
of UDF-backed ones (R1), then letting Catalyst short-circuit per row.

The reference evaluates queries row-at-a-time against ``WorkspaceResult``
objects; here a parsed query compiles **once** to a pair of Column
expressions (include-predicate, tags-array) applied to the whole DataFrame —
the "plan" the reference builds per page is a Catalyst plan built per query.

Filter inventory F1-F23 mapped per SURVEY.md §2.3, all real and
oracle-checked: GeoIP (F13) broadcast-joins a synthetic ip→geo dim table
(operators/geo.py; MaxMind is external data — out of scope, the binder and
bbox logic are the real thing); ml-model (F14) scores a trained multinomial
naive-Bayes model (functions/mlmodel.py) with an integer-quantized JVM
scorer for cross-engine hash parity; xpath (F18) runs a from-scratch
XPath-subset evaluator over html.parser (functions/xpath.py) with
compile-time validation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical result-row columns the language binds to
TEXT, TITLE, URL, HOST, TAGS = "text", "title", "url", "host", "tags"

MAX_COST = 10_000_000
EXCLUDE_COST_FACTOR = 1000  # Filter.cs:61


@dataclass
class Term:
    kind: str                 # registry key, '' = simple word
    value: str
    tag_arg: str | None       # third token part (':tag' / ':*')
    exclude: bool = False
    key: str | None = None    # parenthesized arg: property(key):v
    or_with: "Term | None" = None


@dataclass
class ParsedQuery:
    filters: list[Term] = field(default_factory=list)
    taggers: list[Term] = field(default_factory=list)
    raw: str = ""


_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


_COMMENT_RE = re.compile(r"(?:^|\s)//")


def tokenize(text: str) -> list[str]:
    """Strip //-comments, honor quoted strings (Query.cs:306-332). A ``//``
    only starts a comment at line start or after whitespace — mid-token
    ``//`` (URLs, ``xpath://div``) is content."""
    lines = []
    for line in text.splitlines():
        m = _COMMENT_RE.search(line)
        lines.append(line[:m.start()] if m else line)
    return [t[1:-1] if t.startswith('"') and t.endswith('"') and len(t) >= 2
            else t
            for t in _TOKEN_RE.findall(" ".join(lines))]


def _split_term(tok: str) -> Term:
    exclude = tok.startswith("-")
    if exclude:
        tok = tok[1:]
    # name(:value(:tag)) with optional parenthesized key in the name
    parts = tok.split(":", 2)
    name = parts[0].lower()
    key = None
    m = re.match(r"^([a-z_\-]+)\(([^)]*)\)$", name)
    if m:
        name, key = m.group(1), m.group(2)
    if name in _REGISTRY and len(parts) > 1:
        value = parts[1]
        tag_arg = parts[2] if len(parts) > 2 else None
        return Term(name, value, tag_arg, exclude, key)
    # plain word (F1 SimpleTextMatch) — ':' in a non-filter word stays literal
    return Term("", tok, None, exclude, None)


def parse_query(text: str) -> ParsedQuery:
    q = ParsedQuery(raw=text)
    toks = tokenize(text)
    i = 0
    pending: Term | None = None
    while i < len(toks):
        tok = toks[i]
        if tok.lower() == "and":
            i += 1
            continue
        if tok == "OR":
            if pending is None or i + 1 >= len(toks):
                raise ValueError("OR needs filters on both sides")
            rhs = _split_term(toks[i + 1])
            tail = pending
            while tail.or_with is not None:   # chain: a OR b OR c
                tail = tail.or_with
            tail.or_with = rhs
            i += 2
            continue
        if pending is not None:
            _route(q, pending)
        pending = _split_term(tok)
        i += 1
    if pending is not None:
        _route(q, pending)
    return q


def _route(q: ParsedQuery, t: Term) -> None:
    # 'term::*' or 'term:v:tag' routes a tagger instance (Query.cs:135-164)
    if t.tag_arg is not None:
        q.taggers.append(t)
        if t.value != "" and t.value != "*":
            q.filters.append(Term(t.kind, t.value, None, t.exclude, t.key,
                                  t.or_with))
    else:
        q.filters.append(t)


# ------------------------------------------------------------------ filters

def _ci_contains(col: Column, needle: str) -> Column:
    return F.instr(F.lower(col), needle.lower()) > 0


def _seeded_frac(df_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) per row — replaces the reference's
    pre-materialized ``random`` column (Database DDL :241) with a seeded
    hash so oracle checks are exact."""
    return F.pmod(F.xxhash64(df_col, F.lit(salt)), F.lit(1_000_000_000)) \
            / F.lit(1_000_000_000.0)


# each entry: (cost, predicate(term) -> Column, tag(term) -> Column|None)
_REGISTRY: dict[str, tuple] = {}


def _reg(name: str, cost: int):
    def deco(fn):
        _REGISTRY[name] = (cost, fn)
        return fn
    return deco


@_reg("", 30)  # F1 simple word
def _f_word(t: Term):
    return _ci_contains(F.col(TEXT), t.value), F.lit(t.value)


@_reg("text", 100)  # F2 — ComplexTextFilter: match against visible text
def _f_text(t: Term):
    """``text:word`` re-parses the RAW body into visible-text fragments and
    matches those (ComplexTextFilter.cs:30-53 streams BracketPipe Core
    fragments) — distinct from F1, which matches the pre-extracted text
    column. When the bound frame carries a raw ``body`` column, strip
    script/style + tags JVM-side and match there; otherwise the extracted
    text column IS the visible text and F2 degrades to F1 (the reference's
    behavior when only extracted text is cached). ``text:*`` / ``text:``
    matches any page with a body (IsReducingFilter=false passthrough)."""
    def pred_for(df_cols):
        if "body" in df_cols:
            visible = F.regexp_replace(
                F.col("body"),
                r"(?is)<(script|style)[^>]*>.*?</\1>|<[^>]+>", " ")
        else:
            visible = F.col(TEXT)
        if t.value in ("", "*"):
            return visible.isNotNull()
        return _ci_contains(visible, t.value)
    return pred_for, F.lit(t.value)


@_reg("regex", 50)  # F3 — tags = first match
def _f_regex(t: Term):
    re.compile(t.value)  # invalid regex raises at parse (QueryTest.cs:83-92)
    return (F.col(TEXT).rlike(t.value),
            F.regexp_extract(F.col(TEXT), t.value, 0))


@_reg("site", 1)  # F4
def _f_site(t: Term):
    return _ci_contains(F.col(HOST), t.value), F.col(HOST)


@_reg("uri", 1)  # F5
def _f_uri(t: Term):
    return _ci_contains(F.col(URL), t.value), F.col(URL)


@_reg("title", 1)  # F6
def _f_title(t: Term):
    return _ci_contains(F.col(TITLE), t.value), F.col(TITLE)


@_reg("has", 2)  # F7 — property bag has non-empty key
def _f_has(t: Term):
    v = F.col("props").getItem(t.value)
    return v.isNotNull() & (v != ""), F.lit(t.value)


@_reg("property", 50)  # F8 property(k):v
def _f_property(t: Term):
    v = F.col("props").getItem(t.key or "")
    return _ci_contains(v, t.value), v


@_reg("request-header", 1)  # F9a
def _f_req_header(t: Term):
    v = F.col("req_headers").getItem(t.key or "")
    return _ci_contains(v, t.value), v


@_reg("response-header", 1)  # F9b
def _f_resp_header(t: Term):
    v = F.col("resp_headers").getItem(t.key or "")
    return _ci_contains(v, t.value), v


@_reg("hash", 1)  # F10 — page-body MD5 equality
def _f_hash(t: Term):
    return F.col("data_hash") == F.lit(t.value.lower()), F.col("data_hash")


@_reg("filetype", 1)  # F11
def _f_filetype(t: Term):
    return F.lower(F.col("content_type")).contains(t.value.lower()), \
        F.col("content_type")


@_reg("lang", 50)  # F12 — engine populates 'lang' via textops.lang_id
def _f_lang(t: Term):
    return F.lower(F.col("lang")) == F.lit(t.value.lower()), F.col("lang")


@_reg("random", 1)  # F15 — seeded Bernoulli(p), p∈[1e-7, 1e-4] in reference
def _f_random(t: Term):
    p = min(max(float(t.value), 1e-7), 1e-4) if t.value else 1e-7
    return _seeded_frac(F.col(URL), "random-filter") < F.lit(p), F.lit("random")


@_reg("tag", MAX_COST)  # F17 — substring vs already-assigned tags; runs last
def _f_tag(t: Term):
    return F.exists(F.col(TAGS),
                    lambda x: F.instr(F.lower(x), t.value.lower()) > 0), \
        F.lit(t.value)


@_reg("ml-model", 500)  # F14 — multinomial NB (functions/mlmodel.py)
def _f_ml_model(t: Term):
    # ml-model(name[,conf]):class — predicted label contains class AND
    # maxScore > confidence (MachineLearningModelFilter.cs:57-76 semantics;
    # default 0.98, 'any' → 0.01, unparsable → default, clamped [0,1]).
    # Unknown model name raises at query-compile time
    # (ThrowIfModelDoesntExist).
    from ..functions.mlmodel import (ANY_CONFIDENCE, DEFAULT_CONFIDENCE,
                                     make_ml_udf)
    args = [a.strip() for a in (t.key or "").split(",")]
    name = args[0]
    if len(args) < 2 or args[1] == "":
        conf = DEFAULT_CONFIDENCE
    elif args[1].lower() == "any":
        conf = ANY_CONFIDENCE
    else:
        try:
            conf = min(max(float(args[1]), 0.0), 1.0)
        except ValueError:
            conf = DEFAULT_CONFIDENCE
    pred = make_ml_udf(name)(F.col(TEXT))
    match = pred["label"].isNotNull() & (pred["score"] > F.lit(conf))
    if t.value not in ("", "*"):
        match = match & _ci_contains(pred["label"], t.value)
    return match, pred["label"]


# F13 — geo-ip family; requires geo_* columns from operators/geo.bind_geo
# (broadcast join on the synthetic ip_group). Semantics per GeoIPFilter.cs:
# substring match on the looked-up attribute; empty value matches any row
# that HAS the attribute; ll is a bounding-box range predicate.

def _geo_contains(col_name: str):
    def f(t: Term):
        c = F.col(col_name)
        if t.value in ("", "*"):
            return c.isNotNull() & (c != ""), c
        return _ci_contains(c, t.value), c
    return f


_BBOX_RE = re.compile(
    r"^\[\[\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*\]\s*,"
    r"\s*\[\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*\]\]$")


def _f_geo_ll(t: Term):
    # geo-ip-ll:[[lat,lon],[lat,lon]] — inside-box predicate
    # (GeoIPCoordinateFilter.BoundingBox.IsWithin: min/max of each corner);
    # tag = "[lat,lon]" at 3 decimals (GetTags format)
    lat, lon = F.col("geo_lat"), F.col("geo_lon")
    tag = F.format_string("[%.3f,%.3f]", lat, lon)
    if t.value in ("", "*"):
        return lat.isNotNull(), tag
    m = _BBOX_RE.match(t.value.strip())
    if not m:
        raise ValueError(f"bad geo-ip-ll bounding box {t.value!r}")
    a1, o1, a2, o2 = (float(m.group(i)) for i in (1, 2, 3, 4))
    pred = (lat.isNotNull()
            & (lat >= min(a1, a2)) & (lat <= max(a1, a2))
            & (lon >= min(o1, o2)) & (lon <= max(o1, o2)))
    return pred, tag


_REGISTRY["geo-ip-country"] = (500, _geo_contains("geo_country"))
_REGISTRY["geo-ip-city"] = (500, _geo_contains("geo_city"))
_REGISTRY["geo-ip-subdivision"] = (500, _geo_contains("geo_subdivision"))
_REGISTRY["geo-ip-ll"] = (500, _f_geo_ll)


@_reg("xpath", 1000)  # F18 — subset evaluator (functions/xpath.py)
def _f_xpath(t: Term):
    # match = xpath selects ≥1 node on the raw 'html' column
    # (XPathFilter.cs:29-56: include-only, runs last-ish at cost 1000);
    # tag = first matched node text / attr value. Invalid xpath raises at
    # query-compile time.
    from ..functions.xpath import make_xpath_udf
    matches = make_xpath_udf(t.value)(F.col("html"))
    return F.size(matches) > 0, F.get(matches, 0)


# F19 — sub-query: evaluates another registered workspace query inline
# (WorkspaceSubQueryFilter.cs:9-91; recursion capped at depth 10)
SUBQUERIES: dict[str, str] = {}
_MAX_SUBQUERY_DEPTH = 10
_subquery_depth = 0


@_reg("query", 5000)
def _f_subquery(t: Term):
    global _subquery_depth
    key = t.key or t.value
    if key not in SUBQUERIES:
        raise KeyError(f"unknown sub-query access key {key!r}")
    if _subquery_depth >= _MAX_SUBQUERY_DEPTH:
        raise RecursionError("sub-query recursion depth > 10")
    _subquery_depth += 1
    try:
        # compile eagerly (depth/raise semantics at parse time) but with no
        # column context; re-resolve lazily so plan-dependent filters in the
        # sub-query (F2) see the outer frame's columns
        compile_query(parse_query(SUBQUERIES[key]))

        def pred_for(cols):
            global _subquery_depth
            _subquery_depth += 1
            try:
                include, _ = compile_query(parse_query(SUBQUERIES[key]), cols)
            finally:
                _subquery_depth -= 1
            return include
    finally:
        _subquery_depth -= 1
    return pred_for, F.lit(key)


def _term_cost(t: Term) -> int:
    cost = _REGISTRY[t.kind][0]
    if t.or_with is not None:
        cost += _term_cost(t.or_with)
    return cost * (EXCLUDE_COST_FACTOR if t.exclude else 1)


def _resolve(pred, cols) -> Column:
    """Registry predicates are Columns, or callables of the bound frame's
    column list for filters whose plan depends on what's bound (F2 needs to
    know whether a raw ``body`` column exists)."""
    return pred(cols or ()) if callable(pred) else pred


def _term_predicate(t: Term, cols=None) -> Column:
    pred = _resolve(_REGISTRY[t.kind][1](t)[0], cols)
    if t.or_with is not None:
        pred = pred | _term_predicate(t.or_with, cols)
    return ~pred if t.exclude else pred


def compile_query(q: ParsedQuery, cols=None) -> tuple[Column, Column]:
    """→ (include predicate, tags array) Column pair. ``cols`` is the bound
    frame's column list for plan-dependent filters (see _resolve).

    Conjunction is built cheapest-first (R1); tags are the distinct union of
    all tagger outputs on included rows (FilterCollection.GetTags).
    """
    include = F.lit(True)
    for t in sorted(q.filters, key=_term_cost):
        include = include & _term_predicate(t, cols)
    tag_exprs = []
    for t in q.taggers:
        pred, tag = _REGISTRY[t.kind][1](t)
        pred = _resolve(pred, cols)
        emit = pred if (t.value not in ("", "*")) else F.lit(True)
        tag_exprs.append(F.when(emit & tag.isNotNull() & (tag != ""), tag))
    if tag_exprs:
        tags = F.array_distinct(
            F.filter(F.array(*tag_exprs), lambda x: x.isNotNull()))
    else:
        tags = F.array().cast("array<string>")
    return include, tags


def evaluate(df: DataFrame, query_text: str, keep_tags: bool = True) -> DataFrame:
    """Distill: rows matching the query, with tags attached (Query.Evaluate +
    Distill, Query.cs:59-103)."""
    q = parse_query(query_text)
    include, tags = compile_query(q, df.columns)
    out = df.filter(include)
    return out.withColumn(TAGS, tags) if keep_tags else out


# ------------------------------------------------- cost bookkeeping (A3/R4)

def query_cost_stats(q: ParsedQuery) -> dict:
    """A3: static cost bookkeeping per query (Query.cs:20-27,258-267)."""
    costs = [_term_cost(t) for t in q.filters]
    tagger_costs = [_REGISTRY[t.kind][0] for t in q.taggers]
    all_costs = costs + tagger_costs
    return {
        "n_filters": len(q.filters),
        "n_taggers": len(q.taggers),
        "n_excludes": sum(1 for t in q.filters if t.exclude),
        "min_cost": min(all_costs) if all_costs else 0,
        "max_cost": max(all_costs) if all_costs else 0,
        "avg_cost": (sum(all_costs) / len(all_costs)) if all_costs else 0.0,
        "total_cost": sum(all_costs),
    }


def supported_filters() -> list[dict]:
    """/supportedFilters introspection — one row per registered filter
    token with its cost and short help (the API's FilterHelpInfo over
    FilterAttribute reflection, FetchoAPI/Controllers/
    WorkspacesController.cs:789-813 + common/Query/FilterAttribute.cs).
    The '' entry is the plain-word filter (F1)."""
    out = []
    for name, (cost, fn) in sorted(_REGISTRY.items()):
        doc = (getattr(fn, "__doc__", None) or "").strip().splitlines()
        out.append({"token": name or "(word)", "cost": cost,
                    "short_help": doc[0].strip() if doc else ""})
    return out


DEFAULT_QUERY_BUDGET = 1_000_000  # QueryBudgetForAverageQueryCost


def schedule_queries(query_texts: dict[str, str],
                     budget: int = DEFAULT_QUERY_BUDGET) -> list[str]:
    """R4: evaluation order for standing queries — skip those whose average
    cost exceeds the budget, cheapest-average first (reado/QueryConsumer.cs:
    66-68). Driver-side logic, not a Catalyst concern."""
    scored = []
    for name, text in query_texts.items():
        stats = query_cost_stats(parse_query(text))
        if stats["avg_cost"] <= budget:
            scored.append((stats["avg_cost"], name))
    return [name for _, name in sorted(scored)]


# --------------------------------------------------------- paging APIs (O3/O4)

def page_results(df: DataFrame, order: str = "sequence:asc",
                 offset: int = 0, count: int = 50) -> DataFrame:
    """API paging (WorkspacesController.cs:501-545): order ∈
    {sequence, updated} × {asc, desc}, count capped at 50."""
    field_, _, dir_ = order.partition(":")
    col = {"sequence": "seq", "updated": "updated"}.get(field_)
    if col is None:
        raise ValueError(f"bad order field {field_!r}")
    c = F.col(col).desc() if dir_ == "desc" else F.col(col).asc()
    return df.orderBy(c, F.col("url").asc()).offset(offset).limit(min(count, 50))


def random_results(df: DataFrame, count: int = 50,
                   seed_salt: str = "rr") -> DataFrame:
    """Random page (Database.cs:1227-1252): the reference orders by a
    pre-materialized ``random`` column; seeded hash order here (md5-derived:
    byte-identical in any ANSI engine) → deterministic and oracle-checkable."""
    key = F.conv(F.substring(F.md5(F.concat(F.col(URL), F.lit(seed_salt))),
                             1, 15), 16, 10).cast("long")
    return df.orderBy(key.asc(), F.col(URL).asc()).limit(count)


def social_results(df: DataFrame, body_col: str = "body",
                   order: str = "sequence:asc", offset: int = 0,
                   count: int = 50) -> DataFrame:
    """/results/social analog (FetchoAPI/Controllers/WorkspacesController.cs:
    554-597): page the results, then re-parse each cached body's og: meta
    tags into the social shape — image_url ← og:image, author ← og:author,
    result_type ← og:type, site_name ← og:site_name. The reference re-reads
    the body cache row-by-row on the API server; here the re-parse is an
    Arrow-batched UDF over the already-paged (≤50-row) set, so the expensive
    HTML parse never touches more than one page of results."""
    from ..functions.text import extract_page_meta
    page = page_results(df, order=order, offset=offset, count=count)
    m = extract_page_meta(F.col(body_col))
    return (page.withColumn("_m", m)
            .select(*[c for c in page.columns if c != body_col],
                    F.col("_m.title").alias("title"),
                    F.col("_m.props")["og:image"].alias("image_url"),
                    F.col("_m.props")["og:author"].alias("author"),
                    F.col("_m.props")["og:type"].alias("result_type"),
                    F.col("_m.props")["og:site_name"].alias("site_name")))


def word_match_fragment_dedup(df: DataFrame, word: str, window: int = 1000,
                              seq_col: str = "seq",
                              text_col: str = TEXT) -> DataFrame:
    """F1 SimpleTextMatchFilter with the fragment FIFO de-dup
    (TextMatchFilter.cs:10-95): match = case-insensitive substring; the
    ±20-char fragment around the FIRST match is remembered in a
    1000-fragment window, and a repeated fragment suppresses the match —
    "should get rid of menu links referring to the same link over and over".
    Count-based FIFO window = lag over (fragment, seq), like F16."""
    lower = F.lower(F.col(text_col))
    idx = F.instr(lower, word.lower())
    frag = F.substring(lower, F.greatest(idx - 20, F.lit(1)),
                       len(word) + 40)
    return (df.filter(idx > 0)
            .withColumn("_frag", frag)
            .transform(lambda d: distinct_window(d, "_frag", window, seq_col))
            .drop("_frag"))


def distinct_window(df: DataFrame, field_name: str, n: int,
                    seq_col: str = "seq") -> DataFrame:
    """F16 distinct-window(field):N — keep a row unless the same field value
    was seen within the previous N rows of the stream: count-based FIFO
    window via lag over (field, seq) (SURVEY.md §2.6 O6)."""
    from pyspark.sql import Window
    w = Window.partitionBy(field_name).orderBy(seq_col)
    return (df.withColumn("_prev", F.lag(seq_col).over(w))
              .filter(F.col("_prev").isNull()
                      | (F.col(seq_col) - F.col("_prev") > n))
              .drop("_prev"))
