"""The persistent crawl loop as iterative DataFrame rounds (SURVEY.md §3.1).

One round = one DataFrame DAG::

    frontier → dedup → cheap predicates → seen anti-join (bloom-routed)
             → hosts join → priority → salted per-host ranking
             → robots gate → politeness budget split
             → fetch join → payload verify → link extraction
             → next frontier  (carryover ∪ new links)

with every state table (frontier, seen, seen_filter, hosts, fetched,
crawl_log, metrics, checkpoints) committed as a snapshot between rounds —
fetcho's packet-granularity loop (fetcho/ReadLinko.cs:91-111 wraps packet
files; fetcho/Program.cs:21-91 wires the stages) with Iceberg-style snapshot
commits replacing packet rotation and shuffles replacing the four
BufferBlock thread boundaries.

Determinism: all ordering is a pure function of data — seeded priority
(operators/priority.py), total (priority, url_hash64, url) sort keys,
deterministic batch-dedup survivor choice — so the same seed list + politeness
budget reproduce the same crawl order and seen set at any parallelism level
(north rule; golden-tested against the pure-Python oracle in simulator.py).

Skew: one mega-host can dominate a per-host window. The ranking is two-phase —
a salted pre-rank on (host_hash, salt) keeps a bounded superset per salt, the
final per-host window ranks only survivors — explicit salting per the north
rule, on top of AQE's runtime skew-join splitting.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from .catalog import Catalog
from .operators import frontier as fr
from .operators import politeness as po
from .operators import priority as pr
from .operators.fetch import extract_links, simulate_fetch
from .operators.robots import (apply_robots_gate, parse_robots_df,
                               robots_rules)
from .operators.seen import SeenSet
from .functions.urls import (canonicalize_udf, frontier_host_col,
                             with_fast_canonical, with_url_keys)

EPOCH0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

# Dimension tables (hosts, robots) are force-broadcast into the frontier
# joins only while their on-disk snapshot size stays under this bound;
# above it the join falls back to a shuffle on host. Mirrors
# SeenSet.BROADCAST_MAX_BYTES — one executor-memory-safe policy everywhere.
DIM_BROADCAST_MAX_BYTES = 64 << 20

# host/src_host are NOT stored: they are pure functions of url/src_url
# (urls.frontier_host — one shared definition with the simulator) and are
# re-derived post-dedup each round. Dropping them cut 16% of the frontier
# table's bytes at the bench shape — the table every mention of a
# 10^10-URL frontier is scanned from (dedup) and written to (link stage).
FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("src_url", T.StringType()),
    T.StructField("round_added", T.IntegerType()),
])

# arrow schemas for the driver-local bookkeeping appends
# (catalog.append_rows) — types mirror what Spark itself writes for these
# tables (pmod/count/sum → int64; F.lit(round_no) → int32) so appended
# files mix cleanly inside one snapshot-versioned table
import pyarrow as _pa  # noqa: E402  (baked-in dependency)

_METRICS_ARROW = _pa.schema([("bucket", _pa.int64()),
                             ("n_fetched", _pa.int64()),
                             ("n_ok", _pa.int64()),
                             ("round", _pa.int32())])
_CKPT_ARROW = _pa.schema([("round", _pa.int32()),
                          ("snapshots", _pa.string()),
                          ("counters", _pa.string())])


# state tables whose snapshot ids every round checkpoint records
# (rollback truncates torn writes newer than these ids on resume)
_CKPT_TABLES = ("frontier", "seen", "seen_filter", "hosts",
                "fetched", "crawl_log", "metrics", "recent_ips",
                "robots", "robots_fetched")


@dataclass
class CrawlConfig:
    seed: int = 42
    round_ms: int = 60_000
    ttl_ms: int = 28 * 24 * 3_600_000   # PageCacheExpiry 28d (Fetcho.cs:278)
    max_chunk: int = 200                 # MaxQueueBufferQueueLength analog
    max_priority: int = pr.MAX_PRIORITY
    max_network_issues: int = 3          # FetchoConfiguration.cs:125-126
    max_links_per_page: int = 500
    user_agent: str = "fetcho"
    n_seen_buckets: int = 64
    bits_per_bucket: int = 1 << 20
    seen_backend: str = "bloom"          # "bloom" | "cuckoo" — blob format
                                         # of the seen filter; router only,
                                         # so crawl OUTPUT is identical
                                         # (golden-tested). cuckoo adds
                                         # deletion: SeenSet.expire() sheds
                                         # TTL-expired keys incrementally.
    n_salts: int = 32
    salted_prepass: bool = True
    ip_window_rounds: int = 0            # P9: >0 drops discardable items
                                         # whose IP group was fetched within
                                         # the last N rounds (Queueo.cs:
                                         # 504-528 FIFO IP window, as rounds)
    blocked_extensions: tuple | None = None  # P4: IsProbablyBlocked media
                                         # extensions; None = off (this
                                         # engine's corpus IS media — see
                                         # frontier.BLOCKED_EXTENSIONS)
    max_link_quota: int | None = None    # P14: stop accepting new links once
                                         # this many were queued (Queueo.cs:
                                         # 383,477 QuotaEnabled/MaxLinkQuota;
                                         # None = disabled, as in reference)
    quota_rank_threshold: int = 1_000_000  # P14 cut strategy switch: below,
                                         # orderBy().limit() is a bounded
                                         # TakeOrderedAndProject; above, the
                                         # remaining-quota top-K would funnel
                                         # through the driver, so the cut
                                         # runs as the two-phase range-
                                         # partitioned rank instead
    webgraph_buckets: int | None = None  # bucket the (static, 100 TB-side)
                                         # corpus by url at init: the fetch
                                         # join then reads it with NO
                                         # Exchange — only the per-round
                                         # frontier shuffles. None = plain
                                         # parquet snapshots.
    revalidation: bool = False           # S7 If-Modified-Since: refetches of
                                         # a previously-seen URL (expired
                                         # TTL) carry IMS and the static
                                         # corpus answers 304 Not Modified —
                                         # no payload/body/links
                                         # (HttpResourceFetcher.cs:250)
    fetch_robots: bool = False           # S5 live robots acquisition: at
                                         # round start, hosts newly seen in
                                         # the deduped frontier get their
                                         # http://host/robots.txt looked up
                                         # in the corpus, parsed
                                         # (robots.parse_robots_df) and
                                         # appended to the robots table —
                                         # the same round's gate already
                                         # honors them (the reference
                                         # fetches robots before first
                                         # contact with a host; our default
                                         # keeps robots as static init
                                         # input). Attempts are recorded
                                         # once per host in robots_fetched;
                                         # both tables ride checkpoints.
    fetch_sitemaps: bool = False         # S8+ sitemap seed discovery
                                         # (requires fetch_robots; ignored
                                         # otherwise): Sitemap: URLs
                                         # collected during robots
                                         # acquisition are fetched from the
                                         # corpus the same round, their
                                         # urlset locs canonicalized and
                                         # injected into the NEXT round's
                                         # frontier (src_url = the sitemap
                                         # URL). One level: sitemapindex
                                         # children are not followed. The
                                         # reference only COLLECTS sitemap
                                         # lines (RobotsFile.cs:191-194);
                                         # this closes the loop.
    snapshot_keep_last: int | None = None  # table maintenance: after each
                                         # round's checkpoint, expire all but
                                         # the newest K snapshots of every
                                         # state table (Iceberg
                                         # expireSnapshots). None = keep full
                                         # history (tests/time travel); a
                                         # perpetual 10^10-URL crawl MUST set
                                         # this or snapshot metadata + dead
                                         # frontier overwrites grow without
                                         # bound. Resume safety: expiry runs
                                         # only after the checkpoint commit,
                                         # so the ids the latest checkpoint
                                         # references are always the newest —
                                         # always retained.
    compact_every: int | None = None     # table maintenance: every N rounds,
                                         # fold the append-only seen table
                                         # (max next_fetch per hash — the
                                         # MERGE the reference's upsert does
                                         # continuously) and bin-pack
                                         # crawl_log's per-round small files
                                         # (Catalog.rewrite_data_files).
                                         # Runs INSIDE the round, before its
                                         # checkpoint, so the checkpoint
                                         # references the compacted snapshots
                                         # and resume never undoes the work.
                                         # None = off.
    assign_global_seq: bool = True       # off for throughput benches
    collect_counters: bool = True        # off for throughput benches: skips
                                         # the per-stage count() jobs and the
                                         # crawl_log side-write; lineage
                                         # metrics still land in `metrics`
    extra: dict = field(default_factory=dict)


class CrawlEngine:
    """Drives rounds over a Catalog; all state in snapshot-versioned tables."""

    def __init__(self, spark: SparkSession, catalog: Catalog,
                 config: CrawlConfig | None = None):
        self.spark = spark
        self.catalog = catalog
        self.cfg = config or CrawlConfig()
        from .operators.cuckoo import get_core
        self.seen = SeenSet(catalog, self.cfg.n_seen_buckets,
                            self.cfg.bits_per_bucket,
                            core=get_core(self.cfg.seen_backend))
        # compiled robots rules, memoized per robots-table snapshot id:
        # one distributed compile job per snapshot, not one per round
        self._robots_rules: tuple[int | None, DataFrame] | None = None
        # P14 cumulative accepted-link count; lazily restored from the last
        # checkpoint so quota survives resume
        self._links_accepted: int | None = None
        # wall-clock per pipeline phase of the LAST run_round (observability
        # only — bench.py publishes these so the scaling artifact can NAME
        # which phase stops scaling instead of inferring it; phases are
        # delimited by the round's materialization points, since Spark's
        # laziness bills all upstream work to the action that runs it)
        self.phase_times: dict[str, float] = {}

    # ------------------------------------------------------------ lifecycle
    def logical_now(self, round_no: int) -> dt.datetime:
        return EPOCH0 + dt.timedelta(milliseconds=round_no * self.cfg.round_ms)

    def init(self, seeds: "list[str] | DataFrame", webgraph: DataFrame,
             images: DataFrame, robots: DataFrame, hosts: DataFrame) -> None:
        """Install the universe + seed frontier as snapshot 0 of each table.

        ``seeds`` is a URL list (small seed lists) or a DataFrame with a
        ``url`` column (bench-scale frontiers stay distributed end-to-end).
        """
        c = self.catalog
        if self.cfg.webgraph_buckets:
            c.overwrite_bucketed("webgraph", webgraph, "url",
                                 self.cfg.webgraph_buckets)
        else:
            c.overwrite("webgraph", webgraph)
        c.overwrite("images", images)
        c.overwrite("robots", robots)
        c.overwrite("hosts", hosts)
        if isinstance(seeds, DataFrame):
            if "src_url" in seeds.columns:      # pre-built frontier
                seed_df = seeds
            else:
                seed_df = seeds.select(
                    F.col("url"),
                    F.lit(None).cast("string").alias("src_url"),
                    F.lit(0).alias("round_added"))
        else:
            seed_rows = [(u, None, 0) for u in seeds]
            seed_df = self.spark.createDataFrame(seed_rows, FRONTIER_SCHEMA)
        c.overwrite("frontier", seed_df)
        # round -1 "init" checkpoint: without it a crash DURING round 0
        # (torn seen/frontier writes, no checkpoint row yet) would be
        # indistinguishable from a clean fresh start, and resume would build
        # on the torn state. Tables the first round creates are recorded as
        # None — rollback drops them if a torn round materialized them.
        snap_ids = {t: c.current_snapshot_id(t) if c.exists(t) else None
                    for t in _CKPT_TABLES}
        c.append_rows("checkpoints",
                      [(-1, json.dumps(snap_ids), json.dumps({}))],
                      _CKPT_ARROW, meta={"round": -1})

    def last_completed_round(self) -> int | None:
        if not self.catalog.exists("checkpoints"):
            return None
        row = (self.catalog.read("checkpoints")
               .agg(F.max("round").alias("r")).collect()[0])
        return int(row["r"]) if row["r"] is not None else None

    def _compiled_robots(self) -> DataFrame:
        """Distributed per-host LIKE-rule compile (robots.rules_like_df),
        cached per robots snapshot — rebuilt only when the robots table
        advances, materialized once, broadcast-joined every round."""
        from .operators.robots import rules_like_df
        sid = self.catalog.current_snapshot_id("robots")
        if self._robots_rules is None or self._robots_rules[0] != sid:
            if self._robots_rules is not None:
                self._robots_rules[1].unpersist()
            # phase-named so the bench artifact shows this as the one-time
            # per-snapshot cost it is (a single measured round charges the
            # whole compile; steady-state rounds reuse the memo)
            with self._phase("robots_compile"):
                rules = rules_like_df(self.spark,
                                      self.catalog.read("robots"),
                                      self.cfg.user_agent).persist()
                rules.count()  # materialize the compile once per snapshot
            self._robots_rules = (sid, rules)
        return self._robots_rules[1]

    @contextlib.contextmanager
    def _phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phase_times[name] = round(
                self.phase_times.get(name, 0.0) + time.time() - t0, 3)

    def _discover_sitemap_seeds(self, parsed: DataFrame,
                                round_no: int) -> DataFrame | None:
        """cfg.fetch_sitemaps: fetch the Sitemap: URLs collected during
        this round's robots acquisition from the corpus, parse urlset locs
        (sources/sitemaps.py; ONE level — sitemapindex children are not
        followed, the same bounded-depth stance as S7's one redirect hop),
        canonicalize against the sitemap URL via the hybrid fast/slow
        combine (the link stage's machinery), and return next-round
        frontier rows (url, src_url = the sitemap URL, round_added =
        round + 1). The corpus scan is pushed down through an IN filter
        over the collected sitemap URL list — bounded by this round's new
        hosts (the IVF-centroid class of driver collect), never
        corpus-sized."""
        from .operators.robots import robots_sitemaps
        from .sources.sitemaps import sitemap_entries
        sm_urls = [r["sitemap"] for r in
                   robots_sitemaps(parsed).select("sitemap")
                   .distinct().collect()]
        if not sm_urls:
            return None
        web = self.catalog.read("webgraph").filter(F.col("url").isin(sm_urls))
        sm_pages = (web.filter((F.col("status") == 200)
                               & F.col("body").isNotNull())
                    .select(F.col("url").alias("sitemap_url"),
                            F.col("body").alias("body")))
        locs = (sitemap_entries(sm_pages)
                .filter((F.col("kind") == "urlset")
                        & F.col("loc").isNotNull())
                .select(F.col("loc").alias("href"),
                        F.col("sitemap_key").alias("base")))
        canon = with_fast_canonical(locs)
        url = F.when(F.col("_appl"), F.col("_fast_url")).otherwise(
            canonicalize_udf(F.when(~F.col("_appl"), F.col("href")),
                             F.col("base")))
        inject = (canon.withColumn("url", url)
                  .filter(F.col("url").isNotNull())
                  .select("url", F.col("base").alias("src_url"),
                          F.lit(round_no + 1).cast("int")
                          .alias("round_added"))
                  .persist())
        return inject if inject.count() else None

    # ----------------------------------------------------------- one round
    def run_round(self, round_no: int) -> dict:
        cfg, c = self.cfg, self.catalog
        now = self.logical_now(round_no)
        counters: dict[str, int] = {}
        self.phase_times = {}

        frontier = c.read("frontier")

        # P1 — batch dedup with a deterministic survivor (min src_url; None
        # first) so the same referrer feeds the priority model at any
        # parallelism level. groupBy + min_by (NOT a window): partial
        # aggregation collapses duplicates map-side, so the shuffle carries
        # ~unique URLs, not the raw frontier — the decisive difference at a
        # 10^10-mention frontier. Keyed on the 64-bit hash (the reference's
        # seen set is likewise hash-keyed, Md5Hash semantics). The agg also
        # carries the mention count, so frontier_in needs no separate
        # full-frontier count() job: one action materializes the (small)
        # deduped set, which every downstream stage then reuses.
        frontier = frontier.withColumn("_h", F.xxhash64("url"))
        dedup_key = F.struct(
            F.when(F.col("src_url").isNull(), 0).otherwise(1).alias("k0"),
            F.coalesce(F.col("src_url"), F.lit("")).alias("k1"),
            F.col("round_added").alias("k2"))
        row = F.struct(*[F.col(c) for c in
                         ("url", "src_url", "round_added")])
        deduped = (frontier.groupBy("_h")
                   .agg(F.min_by(row, dedup_key).alias("_r"),
                        F.count("*").alias("_mentions"))
                   .select("_r.*", "_mentions")
                   .persist())
        with self._phase("dedup_agg"):
            agg = deduped.agg(F.sum("_mentions").alias("m"),
                              F.count("*").alias("u")).collect()[0]
        counters["frontier_in"] = int(agg["m"] or 0)
        counters["frontier_unique"] = int(agg["u"] or 0)
        frontier = deduped.drop("_mentions")

        # host/src_host are derived HERE, on ~unique rows, from the shared
        # frontier_host definition (urls.py) — not stored in the frontier
        # table, so the 10^10-mention dedup scan above never carries them
        frontier = (frontier
                    .withColumn("host", frontier_host_col(F.col("url")))
                    .withColumn("src_host",
                                F.when(F.col("src_url").isNotNull(),
                                       frontier_host_col(F.col("src_url")))))

        # S5 live robots acquisition (cfg.fetch_robots; mirrored in
        # simulator.py): hosts newly seen in the deduped frontier get their
        # http://host/robots.txt looked up in the corpus and parsed (the
        # zero-shuffle JVM fold) — the same round's gate sees the new rules
        # because _compiled_robots() re-keys on the robots snapshot id.
        # Attempts are recorded ONCE per host (robots_fetched, append-only
        # like seen); both tables ride the round checkpoint so a torn
        # acquisition rolls back with the round.
        sitemap_inject = None
        if cfg.fetch_robots:
            with self._phase("robots_fetch"):
                hosts_now = frontier.select("host").distinct()
                if c.exists("robots_fetched"):
                    hosts_new = hosts_now.join(
                        c.read("robots_fetched").select("host").distinct(),
                        "host", "left_anti")
                else:
                    hosts_new = hosts_now
                hosts_new = hosts_new.persist()
                n_new = hosts_new.count()
                if n_new:
                    # pre-filter the corpus scan to robots.txt rows: the
                    # predicate reaches the parquet scan, so the join reads
                    # a sliver of the 100 TB side, not the whole table
                    web = c.read("webgraph").filter(
                        F.col("url").endswith("/robots.txt"))
                    pages = (hosts_new
                             .withColumn("_rurl",
                                         F.concat(F.lit("http://"),
                                                  F.col("host"),
                                                  F.lit("/robots.txt")))
                             .join(web.select(
                                 F.col("url").alias("_rurl"),
                                 F.col("status").alias("_rst"),
                                 F.col("body").alias("_rbody")),
                                 "_rurl", "left")
                             .filter((F.col("_rst") == 200)
                                     & F.col("_rbody").isNotNull()))
                    parsed = parse_robots_df(
                        pages.select("host",
                                     F.col("_rbody").alias("body"))
                    ).persist()
                    new_rules = robots_rules(parsed)
                    if new_rules.count():
                        c.append("robots", new_rules,
                                 meta={"round": round_no})
                    if cfg.fetch_sitemaps:
                        sitemap_inject = self._discover_sitemap_seeds(
                            parsed, round_no)
                        if sitemap_inject is not None:
                            counters["sitemap_seeds"] = \
                                sitemap_inject.count()
                    parsed.unpersist()
                    c.append("robots_fetched",
                             hosts_new.withColumn(
                                 "round", F.lit(round_no).cast("int")),
                             meta={"round": round_no})
                hosts_new.unpersist()
                counters["robots_hosts_new"] = int(n_new)

        # cheap cascade (P2/P3/P5/P4), keys, synthetic IP (J3/P6)
        frontier = with_url_keys(fr.cheap_cascade(frontier))
        if cfg.blocked_extensions:
            frontier = frontier.filter(
                fr.extension_allowed(blocked=cfg.blocked_extensions))
        frontier = fr.with_ip_group(frontier)

        # P8/J1 — seen set (bloom-routed exact anti-join)
        frontier = self.seen.filter_unseen(frontier, now)

        # S7 If-Modified-Since: mark survivors whose hash IS in the seen
        # table (TTL expired → refetch → conditional request). One extra
        # equi-join on the seen table, only when revalidation is on.
        if cfg.revalidation:
            if c.exists("seen"):
                # distinct: the seen table is APPEND-only (one row per
                # attempt) — joining raw rows would fan out refetched URLs
                seen_keys = (c.read("seen").select("url_hash64").distinct()
                             .withColumn("_ws", F.lit(True)))
                frontier = (frontier.join(seen_keys, "url_hash64", "left")
                            .withColumn("_was_seen",
                                        F.coalesce(F.col("_ws"),
                                                   F.lit(False)))
                            .drop("_ws"))
            else:
                frontier = frontier.withColumn("_was_seen", F.lit(False))

        # J2 — hosts join + P10. Broadcast only while the hosts table's
        # on-disk size fits the dimension threshold (manifest stat, no
        # scan) — at millions of hosts with robots blobs the broadcast
        # would OOM the driver/executors, so past the threshold the join
        # shuffles on host instead (same guard pattern as the seen
        # filter's BROADCAST_MAX_BYTES route).
        hosts = c.read("hosts")
        if c.table_bytes("hosts") <= DIM_BROADCAST_MAX_BYTES:
            hosts = F.broadcast(hosts)
        frontier = (frontier.join(hosts, "host", "left")
                    .filter(fr.network_ok(cfg.max_network_issues)))

        # P9 — IP-seen-recently: discardable items (those with a referrer;
        # seeds are never discardable, QueueItem.CanBeDiscarded) whose IP
        # group was fetched within the window are dropped
        if cfg.ip_window_rounds > 0 and c.exists("recent_ips"):
            recent = (c.read("recent_ips")
                      .filter(F.col("round") >= round_no - cfg.ip_window_rounds)
                      .select("ip_group").distinct())
            disc = frontier.filter(F.col("src_url").isNotNull()) \
                           .join(recent, "ip_group", "left_anti")
            frontier = frontier.filter(F.col("src_url").isNull()) \
                               .unionByName(disc)

        # O1 — priority; P12 cap
        frontier = frontier.withColumn(
            "priority",
            pr.priority_col(
                cfg.seed, round_no,
                same_host_as_referrer=F.col("src_host") == F.col("host"),
                is_blocked=F.lit(False),
                has_ip=F.col("has_ip")),
        ).filter(fr.priority_acceptable(cfg.max_priority))

        # O2 — per-host ranking, salted pre-pass for skewed hosts
        if cfg.salted_prepass:
            w_salt = Window.partitionBy("host_hash", "_salt") \
                           .orderBy("priority", "url_hash64")
            frontier = (frontier
                        .withColumn("_salt", F.pmod(F.col("url_hash64"),
                                                    F.lit(cfg.n_salts)))
                        .withColumn("_sr", F.row_number().over(w_salt))
                        .filter(F.col("_sr") <= cfg.max_chunk)
                        .drop("_salt", "_sr"))
        frontier = pr.with_chunk_seq(frontier).filter(fr.chunk_cap(cfg.max_chunk))

        # P11 — robots gate, most expensive predicate last (R3)
        frontier = frontier.withColumn(
            "path", F.regexp_replace("url", r"^https?://[^/]*", ""))
        frontier = frontier.withColumn(
            "path", F.when(F.col("path") == "", "/").otherwise(F.col("path")))
        frontier = apply_robots_gate(
            self.spark, frontier, c.read("robots"), cfg.user_agent,
            compiled_rules=self._compiled_robots(),
            # compiled LIKE arrays are smaller than the raw robots rows, so
            # the raw table's manifest size is a safe over-estimate
            broadcast=c.table_bytes("robots") <= DIM_BROADCAST_MAX_BYTES)

        # O5 — politeness budget split (chunk_seq already ranks per host).
        # Persist: selected and carryover both consume the full pipeline; a
        # cache here halves the round (one evaluation instead of two).
        frontier = po.with_budget(frontier, cfg.round_ms).persist()
        selected = frontier.filter(F.col("chunk_seq") < F.col("fetch_budget"))
        carryover = (frontier
                     .filter(F.col("chunk_seq") >= F.col("fetch_budget"))
                     .select("url", "src_url", "round_added"))

        # deterministic global fetch order for lineage/golden tests —
        # two-phase range rank, never a single-task global Window (the
        # selected set is millions of rows per round at 10^10 scale)
        if cfg.assign_global_seq:
            selected = pr.with_global_seq(selected)
        else:
            selected = selected.withColumn("fetch_seq", F.lit(None).cast("int"))

        # J5 + C12 — fetch join + payload verify
        fetched = simulate_fetch(selected, c.read("webgraph"), c.read("images"))
        fetched = fetched.withColumn("round", F.lit(round_no))
        log_cols = ["round", "fetch_seq", "url", "url_hash64", "host",
                    "image_id", "status", "priority"]
        # the fetched table is the packet-file analog: payload verification
        # verdicts, header maps (F9), content type, and — for raw-body
        # corpora — the response body itself (WebDataPacketWriter stores
        # request+response+data; link extraction re-reads it like ReadLinko)
        fetched_cols = log_cols + [
            "caption", "phash", "w", "h", "fmt",
            "decode_ok", "dims_ok", "phash_ok", "psnr_db", "psnr_ok",
            "out_links", "content_type", "req_headers", "resp_headers",
            "blocked_reason"]
        if "body" in fetched.columns:
            fetched_cols.append("body")
        if "redirected_to" in fetched.columns:  # S7 hop lineage
            fetched_cols.append("redirected_to")
        with self._phase("schedule_fetch_verify"):
            c.append("fetched", fetched.select(*fetched_cols),
                     meta={"round": round_no})
        fetched = c.read_incremental("fetched",
                                     c.current_snapshot_id("fetched") - 1)
        if cfg.collect_counters:
            c.append("crawl_log", fetched.select(*log_cols),
                     meta={"round": round_no})
            counters["fetched"] = fetched.count()
            counters["fetched_ok"] = \
                fetched.filter(F.col("status") == 200).count()

        # seen-set upsert: every *attempted* URL is recorded visited before
        # the fetch outcome matters (Fetcho.cs:170,274-281 semantics).
        # The upsert, host feedback, P9 state and the lineage rollup all
        # consume ONLY the already-committed `fetched` snapshot — they are
        # independent of the link stage, so they run on driver threads
        # CONCURRENTLY with it. This is overlap, not reordering: outputs are
        # identical, the threads are joined before the round checkpoint
        # (checkpoint-last invariant intact), and the per-round fixed commit
        # latency — the Amdahl floor the 2→8 phase profile names as the
        # non-scaling component — hides under the link stage's compute.
        def _state_commits() -> None:
            with self._phase("state_commits"):
                next_fetch = now + dt.timedelta(milliseconds=self.cfg.ttl_ms)
                self.seen.record(
                    fetched.select(F.unhex(F.md5("url")).alias("url_hash"),
                                   F.col("url_hash64")),
                    next_fetch)

                # host feedback (429 penalty / network issues)
                c.overwrite("hosts",
                            po.apply_429_penalty(c.read("hosts"), fetched),
                            meta={"round": round_no})

                # P9 state: record the IP groups fetched this round
                if cfg.ip_window_rounds > 0:
                    c.append("recent_ips",
                             fetched.select(F.pmod(F.xxhash64("host"),
                                                   F.lit(fr.N_IP_GROUPS))
                                            .alias("ip_group")).distinct()
                             .withColumn("round", F.lit(round_no)),
                             meta={"round": round_no})

        # per-partition lineage metrics (north rule): counts per host bucket.
        # ≤ n_seen_buckets rows: collect ONCE (one fetched scan) — the
        # metrics append and the counter totals both come from the local rows
        lineage = (fetched.groupBy(
            F.pmod(F.col("url_hash64"), F.lit(cfg.n_seen_buckets))
             .alias("bucket"))
            .agg(F.count("*").alias("n_fetched"),
                 F.sum(F.when(F.col("status") == 200, 1).otherwise(0))
                  .alias("n_ok"))
            .withColumn("round", F.lit(round_no)))
        lin_rows: list = []

        def _lineage_collect() -> None:
            with self._phase("metrics_checkpoint"):
                lin_rows.extend(lineage.collect())

        bg_errors: list[BaseException] = []

        def _guard(fn):
            def run():
                try:
                    fn()
                except BaseException as e:  # re-raised on the main thread
                    bg_errors.append(e)
            return run

        from pyspark import InheritableThread
        bg_threads = [InheritableThread(target=_guard(fn), daemon=True)
                      for fn in (_state_commits, _lineage_collect)]
        for t in bg_threads:
            t.start()

        # C2/C3/O7 — link extraction → next frontier
        links = extract_links(fetched, cfg.seed, round_no,
                              cfg.max_links_per_page)
        new_frontier = links.select(
            "url", "src_url", F.lit(round_no + 1).alias("round_added"))
        quota_df = None
        if cfg.max_link_quota is not None:
            # P14 — global link quota. Acceptance order is a pure function
            # of data (seeded hash, then url/src_url) so the cut is identical
            # at any parallelism. Small remaining → orderBy().limit(), a
            # TakeOrderedAndProject bounded by the remaining quota. Large
            # remaining (a near-10^10 quota early in the crawl) would make
            # that a driver-side top-K, so past quota_rank_threshold the cut
            # is the same two-phase range-partitioned rank with_global_seq
            # uses — distributed, identical result (the key is total).
            if self._links_accepted is None:
                self._links_accepted = self._restore_links_accepted()
            remaining = cfg.max_link_quota - self._links_accepted
            if remaining <= 0:
                new_frontier = new_frontier.limit(0)
            else:
                qkey = F.xxhash64("url",
                                  F.lit(f"quota:{cfg.seed}:{round_no}"))
                if remaining <= cfg.quota_rank_threshold:
                    new_frontier = (new_frontier
                                    .orderBy(qkey.asc(), F.col("url").asc(),
                                             F.col("src_url").asc())
                                    .limit(remaining))
                else:
                    ranked = pr.with_global_seq(
                        new_frontier.withColumn("_qkey", qkey),
                        sort_cols=("_qkey", "url", "src_url"),
                        out_col="_qrank", out_type="long")
                    new_frontier = (ranked
                                    .filter(F.col("_qrank") < remaining)
                                    .drop("_qkey", "_qrank"))
            quota_df = new_frontier.persist()
            self._links_accepted += quota_df.count()
            counters["links_accepted_total"] = self._links_accepted
        nxt = carryover.unionByName(new_frontier)
        if sitemap_inject is not None:
            # sitemap seeds are seed-class: they join the NEXT frontier
            # after the P14 quota cut (quota bounds page LINKS, Queueo.cs
            # semantics) and dedup/seen handle re-discoveries next round
            nxt = nxt.unionByName(
                sitemap_inject.select(*[f.name for f in FRONTIER_SCHEMA]))
        with self._phase("link_stage"):
            c.overwrite("frontier", nxt, meta={"round": round_no})
        if cfg.collect_counters:
            counters["new_links"] = new_frontier.count()
            counters["carryover"] = carryover.count()

        # rejoin the overlapped commits before anything downstream reads
        # their snapshot ids — the checkpoint must describe a finished round
        for t in bg_threads:
            t.join()
        if bg_errors:
            raise bg_errors[0]

        if cfg.compact_every and (round_no + 1) % cfg.compact_every == 0:
            # BEFORE the checkpoint (unlike expiry): the checkpoint must
            # reference the compacted snapshots, or the next resume's
            # rollback would discard the compaction as a torn write
            with self._phase("maintenance"):
                self.seen.compact()
                if cfg.collect_counters and c.exists("crawl_log"):
                    c.rewrite_data_files("crawl_log")

        with self._phase("metrics_checkpoint"):
            # ≤ n_seen_buckets local rows → driver-local parquet append: a
            # full Spark write job for this was pure fixed per-round latency
            # (phase_efficiency 0.285 in the BENCH_r04 2→8 profile)
            c.append_rows("metrics",
                          [(r["bucket"], r["n_fetched"], r["n_ok"],
                            r["round"]) for r in lin_rows],
                          _METRICS_ARROW,
                          meta={"round": round_no, "counters": counters})
            if not cfg.collect_counters:
                counters["fetched"] = sum(r["n_fetched"] for r in lin_rows)
                counters["fetched_ok"] = sum(r["n_ok"] for r in lin_rows)

        frontier.unpersist()
        deduped.unpersist()
        if quota_df is not None:
            quota_df.unpersist()

        # checkpoint LAST → a round is complete iff its checkpoint row exists
        snap_ids = {t: (self.catalog.current_snapshot_id(t)
                        if self.catalog.exists(t) else None)
                    for t in _CKPT_TABLES}
        with self._phase("metrics_checkpoint"):
            c.append_rows("checkpoints",
                          [(round_no, json.dumps(snap_ids),
                            json.dumps(counters))],
                          _CKPT_ARROW, meta={"round": round_no})
        if cfg.snapshot_keep_last is not None:
            with self._phase("maintenance"):
                for t in (*snap_ids, "checkpoints"):
                    if c.exists(t):
                        c.expire_snapshots(
                            t, keep_last=cfg.snapshot_keep_last)
        return counters

    def _restore_links_accepted(self) -> int:
        """P14 resume: the cumulative accepted-link count rides the round
        checkpoint counters, so quota state survives engine restarts."""
        if not self.catalog.exists("checkpoints"):
            return 0
        rows = (self.catalog.read("checkpoints")
                .orderBy(F.col("round").desc()).limit(1).collect())
        if not rows:
            return 0
        counters = json.loads(rows[0]["counters"])
        return int(counters.get("links_accepted_total", 0))

    def rollback_to_last_checkpoint(self) -> dict[str, int]:
        """Crash recovery: a round is complete iff its checkpoint row exists
        (the checkpoint is committed LAST), so any table snapshot NEWER than
        the ids the latest checkpoint records is a torn write from a round
        that never finished. Roll those tables back (Catalog.rollback —
        metadata-only manifest truncation, O(1) in table size) so resume
        re-runs the torn round from clean state instead of building on it
        (e.g. double-appended seen rows would mis-drop that round's URLs).
        Returns {table: snapshot_id rolled back to}; empty when clean."""
        if not self.catalog.exists("checkpoints"):
            return {}
        rows = (self.catalog.read("checkpoints")
                .orderBy(F.col("round").desc()).limit(1).collect())
        if not rows:
            return {}
        snap_ids = json.loads(rows[0]["snapshots"])
        rolled: dict[str, int] = {}
        for t, sid in snap_ids.items():
            if not self.catalog.exists(t):
                continue
            if sid is None:              # table created by the torn round
                self.catalog.drop(t)
                rolled[t] = -1
                continue
            cur = self.catalog.current_snapshot_id(t)
            if cur is not None and cur > sid:
                self.catalog.rollback(t, sid)
                rolled[t] = sid
        if rolled:
            # torn-round quota state must not leak into the re-run; the
            # robots memo is untouched (robots is static — never in snap_ids)
            self._links_accepted = None
        return rolled

    def run(self, n_rounds: int) -> list[dict]:
        self.rollback_to_last_checkpoint()
        start = (self.last_completed_round() + 1
                 if self.last_completed_round() is not None else 0)
        return [self.run_round(r) for r in range(start, start + n_rounds)]


def _host_py(url: str) -> str:
    from .functions.urls import host_of
    return host_of(url) or ""
