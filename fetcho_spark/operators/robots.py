"""robots.txt gating (SURVEY.md §2.2 P11, §2.8 C6).

Semantics pinned by the reference's tests
(/root/reference/commonTest/RobotsTest.cs:24-38,113-128 and
common/RobotsFile.cs:81-250, re-expressed — not copied):

- a pattern is a **prefix** match on the URL path;
- ``*`` matches any character run mid-pattern;
- ``$`` anchors the pattern to the path end;
- rules for our specific user-agent take precedence over the ``*`` group
  (per-UA sections, e.g. the github fixture);
- ``Disallow: /news/0`` must NOT block ``/news/world-…`` (prefix regression);
- most-specific (longest) matching rule wins; allow beats disallow on ties.

The reference compiles rules to a char-level FSM and walks it per URL
(RobotsFile.cs / FiniteStateMachine.cs). Spark-first shape: parse once to
rule rows, compile per-host to anchored regexes on the driver, broadcast the
compiled table, and match inside an Arrow-batched pandas UDF — one Python
crossing per batch, not per row. Robots state persists in a ``robots`` table
with a 28-day TTL (Site.cs:18-20) under the engine's logical clock.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_UA = "fetcho"


def pattern_to_regex(pattern: str) -> re.Pattern:
    """robots pattern → compiled anchored-prefix regex (*, $ supported)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class HostRules:
    """Compiled rules for one host. ``disallowed(path)`` = longest-match-wins."""

    __slots__ = ("rules",)

    def __init__(self, rules: list[tuple[bool, str]]):
        # longest-pattern-first; allow before disallow on equal length so the
        # first match at the winning length already encodes tie-break-to-allow
        self.rules = [
            (is_allow, len(p), pattern_to_regex(p))
            for is_allow, p in sorted(rules, key=lambda r: (-len(r[1]), not r[0]))
        ]

    def disallowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for is_allow, plen, rx in self.rules:
            if plen <= best_len:
                break  # sorted: no longer match possible
            if rx.match(path):
                best_len, best_allow = plen, is_allow
        return not best_allow


def compile_rules(rows: list[tuple[str, str, str, str]],
                  user_agent: str = DEFAULT_UA) -> dict[str, HostRules]:
    """(host, user_agent, directive, pattern) rows → host → HostRules.

    Per-UA precedence: if a host has any rules for ``user_agent``, the ``*``
    group is ignored for that host (RobotsTest github-fixture semantics).
    """
    ua = user_agent.lower()
    by_host: dict[str, dict[str, list[tuple[bool, str]]]] = {}
    for host, agent, directive, pattern in rows:
        if pattern is None or pattern == "":
            continue  # empty Disallow == allow all
        g = by_host.setdefault(host, {})
        g.setdefault(agent.lower(), []).append(
            (directive.lower() == "allow", pattern))
    out: dict[str, HostRules] = {}
    for host, groups in by_host.items():
        chosen = groups.get(ua) if ua in groups else groups.get("*")
        if chosen:
            out[host] = HostRules(chosen)
    return out


def make_disallowed_udf(spark: SparkSession, robots_df: DataFrame,
                        user_agent: str = DEFAULT_UA):
    """Broadcast the compiled rule table; return pandas UDF (host, path)→bool.

    The rule table is small per round (≤100k hot hosts,
    FetchoConfiguration.cs:27-28) → broadcast join territory. At 10^10 scale
    the robots table stays bounded by live-host count, not frontier size.
    """
    rows = [tuple(r) for r in robots_df
            .select("host", "user_agent", "directive", "pattern").collect()]
    compiled = compile_rules(rows, user_agent)
    bc = spark.sparkContext.broadcast(compiled)

    @F.pandas_udf(T.BooleanType())
    def robots_disallowed(host: pd.Series, path: pd.Series) -> pd.Series:
        table = bc.value
        out = []
        for h, p in zip(host, path):
            hr = table.get(h)
            out.append(bool(hr and hr.disallowed(p if p else "/")))
        return pd.Series(out, dtype=bool)

    return robots_disallowed


def apply_robots_gate(spark: SparkSession, frontier: DataFrame,
                      robots_df: DataFrame, user_agent: str = DEFAULT_UA,
                      path_col: str = "path",
                      compiled_rules: DataFrame | None = None,
                      broadcast: bool = True) -> DataFrame:
    """P11: drop frontier rows the host's robots rules disallow. Runs LAST in
    the cascade — most expensive predicate (Queueo.cs:426 ordering, R3).

    JVM route: robots patterns translate losslessly to SQL LIKE (prefix →
    ``pat%``, ``*`` → ``%``, ``$`` anchor → exact), so the gate is a broadcast
    join on host + higher-order-function match — whole-stage codegen, no
    Python crossing, longest-match/allow-ties preserved via array_max over
    (plen, allow) structs. The pandas-UDF route (make_disallowed_udf) remains
    for regex-semantics tests; both are pinned to the same HostRules oracle.

    Pass ``compiled_rules`` (from :func:`rules_like_df`, cached per robots
    snapshot) to avoid recompiling unchanged robots state every round.
    ``broadcast=False`` routes the rules join through a shuffle on host
    instead of forcing a broadcast — callers with a size estimate (the
    crawl engine checks the robots table's manifest bytes) must flip it
    once the compiled-rules dimension outgrows executor memory.
    """
    rules = (compiled_rules if compiled_rules is not None
             else rules_like_df(spark, robots_df, user_agent))
    if broadcast:
        rules = F.broadcast(rules)
    joined = frontier.join(rules, "host", "left")
    matched = F.filter(
        F.col("_rules"),
        lambda r: F.like(F.col(path_col), r["pat"], F.lit("\\")))
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(r["plen"].alias("plen"),
                                    r["allow"].alias("allow"))))
    disallowed = F.col("_rules").isNotNull() & best.isNotNull() \
        & (best["allow"] == 0)
    return joined.filter(~F.coalesce(disallowed, F.lit(False))).drop("_rules")


def pattern_to_like(pattern: str) -> str | None:
    """robots pattern → SQL LIKE pattern (escape ``%``/``_``/``\\``; ``*`` →
    ``%``; trailing ``$`` anchors, else append ``%`` for prefix match)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def rules_like_df(spark: SparkSession, robots_df: DataFrame,
                  user_agent: str = DEFAULT_UA) -> DataFrame:
    """Per-host LIKE-rule arrays (host, _rules array<struct<pat,plen,allow>>)
    after per-UA group selection — one small broadcastable row per host.

    Fully distributive (groupBy(host) + collect_list + higher-order filter;
    no driver ``collect()``), so compiling millions of hosts' robots state
    is one shuffle on host, not a driver OOM. The per-host rule list is
    bounded by robots-file size, so collect_list stays small. The LIKE
    translation itself is JVM expressions mirroring :func:`pattern_to_like`
    (escape ``\\ % _``, ``*`` → ``%``, trailing ``$`` anchors else append
    ``%``); ``plen`` is the FULL original pattern length (incl. ``$``),
    matching HostRules' longest-match tie-break.
    """
    ua = user_agent.lower()
    pat = F.col("pattern")
    anchored = pat.endswith("$")
    body = F.when(anchored, F.substring(pat, 1, F.length(pat) - 1)) \
            .otherwise(pat)
    esc = F.replace(body, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    like_pat = F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))
    rules = (robots_df
             .filter(pat.isNotNull() & (pat != ""))
             .withColumn("_agent", F.lower("user_agent"))
             .filter(F.col("_agent").isin(ua, "*"))
             .select("host",
                     (F.col("_agent") == ua).cast("int").alias("_is_ua"),
                     F.struct(
                         like_pat.alias("pat"),
                         F.length(pat).cast("int").alias("plen"),
                         F.when(F.lower("directive") == "allow", 1)
                          .otherwise(0).cast("int").alias("allow"),
                         (F.col("_agent") == ua).cast("int").alias("is_ua"),
                     ).alias("_rule")))
    grouped = rules.groupBy("host").agg(
        F.max("_is_ua").alias("_has_ua"),
        F.collect_list("_rule").alias("_all"))
    # per-UA precedence: a host with any UA-specific rules ignores its '*'
    # group (RobotsTest github-fixture semantics)
    chosen = F.filter(F.col("_all"),
                      lambda r: r["is_ua"] == F.col("_has_ua"))
    return grouped.select(
        "host",
        F.transform(chosen, lambda r: F.struct(
            r["pat"].alias("pat"), r["plen"].alias("plen"),
            r["allow"].alias("allow"))).alias("_rules"))
