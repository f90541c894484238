#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is frozen).

Per-query isolation with the noop sink (guide §1.4), split into:
  - build_sec: time of ``queries()[name](spark, sf_dir)`` — any EAGER
    driver-side work (collects inside trainers) is charged here
  - exec_sec:  time of the noop write of the returned frame
  - total_sec: build + exec (same quantity bench.py measures)
  - jobs/stages/tasks delta per query via the status tracker

Usage:
  python bench_extra.py [names...]         # default: headline + extras
  python bench_extra.py --reps 2 [names]   # repeat measure inside a JVM
  python bench_extra.py --out FILE.json

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench as benchmod
    import __spark_entry__ as entrymod
    from fetcho_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fetcho-bench-extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, 2 * args.cpus))
    sc = spark.sparkContext
    tracker = sc.statusTracker

    qs = entrymod.queries()
    names = args.names or (benchmod.HEADLINE + benchmod.EXTRAS)
    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        per = []
        for rep in range(args.reps):
            sc.setJobDescription(f"{name} rep{rep}")
            jobs_before = len(tracker().getJobIdsForGroup() or [])
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jobs_after = len(tracker().getJobIdsForGroup() or [])
            per.append({"build_sec": round(t1 - t0, 3),
                        "exec_sec": round(t2 - t1, 3),
                        "total_sec": round(t2 - t0, 3),
                        "jobs": jobs_after - jobs_before})
            sc.setJobDescription(None)
        results[name] = {"reps": per,
                         "best_total": min(p["total_sec"] for p in per),
                         "build_sec": per[0]["build_sec"],
                         "exec_sec": per[0]["exec_sec"]}
        print(f"{name:24s} build={per[0]['build_sec']:7.3f} "
              f"exec={per[0]['exec_sec']:7.3f} "
              f"total={[p['total_sec'] for p in per]}")
    spark.stop()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
