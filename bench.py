#!/usr/bin/env python
"""fetcho_spark benchmark — headline queries + crawl throughput + scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "crawl": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     FETCHO_BENCH_SKIP_SCALING=1 to skip the two-parallelism crawl runs.

Scaling evidence (north rule: ≥0.8 throughput efficiency N→4N executors):
the same crawl job runs at local[N] and local[4N] in separate JVMs on the
same input; we report throughput at both plus efficiency. Because local[c]
threads share ONE memory domain, the sandbox also measures the machine's own
scaling ceilings (aggregate copy-bandwidth and pure-CPU multiprocessing,
N→4N) and reports crawl efficiency both raw and normalized to the bandwidth
ceiling — on a real cluster each extra executor brings its own DRAM/disk/NIC,
which is exactly the resource local-mode scaling holds constant. Full
analysis in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import tempfile
import time

HEADLINE = [
    "group_agg", "anti_join_seen", "window_chunk_seq", "keyword_counts",
    "dedup_exact", "minhash_sig", "ngram_jaccard", "simhash", "ann_topk",
    "embedding_norms", "sessionize", "token_count", "quality_score",
    "lang_id", "fingerprint", "politeness_budget", "distinct_window",
    "seeded_sample", "order_page", "priority_semantics", "query_language",
]

# crawl bench universe: 400k-page web, 20k hosts (zipf-skewed), 30M-mention
# frontier (the 10^10-scale shape: heavy duplication into the dedup stage)
CRAWL_PAGES = 400_000
CRAWL_HOSTS = 20_000
CRAWL_IMAGES = 1_500
CRAWL_FRONTIER = 24_000_000


def _spark(master: str, cpus: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fetcho_spark.session import get_spark
    return get_spark("fetcho-bench", master=master,
                     shuffle_partitions=max(8, 2 * cpus))


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def run_crawl(spark, n_pages: int = CRAWL_PAGES, n_hosts: int = CRAWL_HOSTS,
              n_images: int = CRAWL_IMAGES,
              n_frontier: int = CRAWL_FRONTIER) -> dict:
    """One crawl round over a 30M-mention frontier: dedup → schedule →
    robots → politeness → fetch join → payload verify → link extraction.
    Metric = frontier URLs processed (fetched+deduped) per second."""
    from fetcho_spark import benchgen as bg
    from fetcho_spark.catalog import Catalog
    from fetcho_spark.crawl import CrawlConfig, CrawlEngine

    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="bench-crawl-", dir=root)
    try:
        cfg = CrawlConfig(max_chunk=200, n_seen_buckets=64,
                          bits_per_bucket=1 << 22, round_ms=60_000,
                          assign_global_seq=False, collect_counters=False)
        cat = Catalog(spark, d)
        eng = CrawlEngine(spark, cat, cfg)
        pages = bg.pages_df(spark, n_pages, n_hosts, n_images)
        eng.init(bg.frontier_df(spark, n_frontier, n_pages, n_hosts), pages,
                 bg.images_df(spark, n_images),
                 bg.robots_df(spark, n_hosts),
                 bg.hosts_df(spark, n_hosts, crawl_delay_ms=3_000))
        t0 = time.time()
        counters = eng.run_round(0)
        wall = time.time() - t0
        urls_in = counters["frontier_in"]
        return {"urls_in": urls_in, "fetched": counters.get("fetched", 0),
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(urls_in / wall, 1),
                "pages": n_pages, "hosts": n_hosts, "frontier": n_frontier}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def crawl_subprocess(cpus: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--crawl-only",
         "--cpus", str(cpus), "--out", out],
        check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


# ---------------------------------------------- hardware scaling ceilings

def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def _stream(n_mb):
    import numpy as np
    a = np.ones(n_mb * 131072)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(10):
        np.copyto(b, a)
    return 10 * 2 * a.nbytes / (time.time() - t0)


def hw_ceilings(lo: int, hi: int) -> dict:
    """The box's own N→4N scaling limits: pure-CPU and copy-bandwidth."""
    def cpu_thr(p):
        t0 = time.time()
        with multiprocessing.Pool(p) as pool:
            pool.map(_burn, [2_000_000] * p * 2)
        return p * 2 * 2_000_000 / (time.time() - t0)

    def bw(p):
        best = 0.0
        for _ in range(2):
            with multiprocessing.Pool(p) as pool:
                best = max(best, sum(pool.map(_stream, [200] * p)) / 1e9)
        return best

    cpu = cpu_thr(hi) / cpu_thr(lo)
    band = bw(hi) / bw(lo)
    r = hi / lo
    return {"cpu_speedup": round(cpu, 2), "cpu_efficiency": round(cpu / r, 3),
            "bandwidth_speedup": round(band, 2),
            "bandwidth_efficiency": round(band / r, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    if args.crawl_only:
        spark = _spark(f"local[{args.cpus}]", args.cpus)
        res = run_crawl(spark)
        spark.stop()
        with open(args.out, "w") as f:
            json.dump(res, f)
        return

    spark = _spark(f"local[{args.cpus}]", args.cpus)
    queries = run_headline(spark, sf_dir)
    spark.stop()

    crawl: dict = {}
    if os.environ.get("FETCHO_BENCH_SKIP_SCALING") != "1":
        hi_c, lo_c = 16, 4  # N→4N inside a 32-CPU box: leaves headroom for
        # python workers + GC so task threads aren't oversubscribed
        ceil = hw_ceilings(lo_c, hi_c)  # before the crawls: quiet machine
        # the box shows ±25% run-to-run noise → best-of-2 per level
        hi = max((crawl_subprocess(hi_c) for _ in range(2)),
                 key=lambda r: r["urls_per_sec"])
        lo = max((crawl_subprocess(lo_c) for _ in range(2)),
                 key=lambda r: r["urls_per_sec"])
        ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
        eff = ratio / (hi_c / lo_c)
        crawl = {
            "urls_per_sec": hi["urls_per_sec"],
            "fetched": hi["fetched"],
            "wall_sec": hi["wall_sec"],
            "universe": {"pages": hi["pages"], "hosts": hi["hosts"],
                         "frontier": hi["frontier"]},
            "scaling": {
                f"local{lo_c}_urls_per_sec": lo["urls_per_sec"],
                f"local{hi_c}_urls_per_sec": hi["urls_per_sec"],
                "speedup": round(ratio, 3),
                "efficiency": round(eff, 3),
                "hw_ceilings": ceil,
                "efficiency_vs_bandwidth_ceiling": round(
                    ratio / max(ceil["bandwidth_speedup"], 1e-9), 3),
            },
        }

    print(json.dumps({
        "metric": "headline_suite_sec_plus_crawl_throughput",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
    }))


if __name__ == "__main__":
    main()
