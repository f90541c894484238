#!/usr/bin/env python
"""N-vs-4N crawl scaling probe at an arbitrary frontier size.

Generalizes the 64M probe that produced BENCH/scaling_64M_r04.json: the
same crawl round runs at local[lo] and local[hi] in INTERLEAVED fresh-JVM
blocks (never two masters in one JVM — CLAUDE.md box quirks), with every
sample's throughput and per-phase wall times riding the artifact, plus the
box's own same-session hw ceilings so the number is self-contained
evidence (VERDICT r2 #5 / r3 #3).

Usage:
    python scripts/scaling_probe.py --frontier 256000000 \
        --out BENCH/scaling_256M_r04.json [--lo 2 --hi 8] [--blocks 2 1]

The bigger the frontier, the more the data-proportional phases (dedup agg,
link stage) dominate the fixed per-round costs (commits, metrics) — the
asymptote that matters at the north rule's 10^10 scale.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _crawl(cpus: int, frontier: int, reps: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only",
         "--cpus", str(cpus), "--out", out,
         "--frontier", str(frontier), "--reps", str(reps)],
        check=True, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


def _merge(blocks: list[dict]) -> dict:
    out = max(blocks, key=lambda b: b["urls_per_sec"]).copy()
    out["samples_urls_per_sec"] = [
        s for b in blocks for s in b["samples_urls_per_sec"]]
    ph = [p for b in blocks for p in b.get("phase_samples", [])]
    keys = sorted({k for p in ph for k in p})
    out["phase_best_sec"] = {k: min(p[k] for p in ph if k in p)
                             for k in keys}
    out["phase_samples"] = ph
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier", type=int, required=True)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--blocks", type=int, nargs="+", default=[2])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    lo_blocks, hi_blocks = [], []
    for reps in args.blocks:  # interleaved lo/hi fresh-JVM blocks
        lo_blocks.append(_crawl(args.lo, args.frontier, reps))
        hi_blocks.append(_crawl(args.hi, args.frontier, reps))
    lo, hi = _merge(lo_blocks), _merge(hi_blocks)

    factor = args.hi / args.lo
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
    phase_eff = {
        k: round(lo["phase_best_sec"][k] / hi["phase_best_sec"][k] / factor,
                 3)
        for k in lo["phase_best_sec"]
        if k in hi["phase_best_sec"] and hi["phase_best_sec"][k] > 0}

    from scripts.hw_calibrate import hw_ceilings
    ceiling = hw_ceilings(args.lo, args.hi)

    mm = args.frontier // 1_000_000
    res = {
        "what": (f"{args.lo}-vs-{args.hi}-core crawl scaling at {mm}M "
                 "mentions, interleaved lo/hi fresh-JVM blocks, "
                 f"best-of-{sum(args.blocks)}/level; same 400k-page "
                 "universe so only the frontier-proportional phases grow"),
        "frontier": args.frontier,
        f"local{args.lo}": {
            "best_urls_per_sec": lo["urls_per_sec"],
            "samples_urls_per_sec": lo["samples_urls_per_sec"],
            "phase_best_sec": lo["phase_best_sec"],
        },
        f"local{args.hi}": {
            "best_urls_per_sec": hi["urls_per_sec"],
            "samples_urls_per_sec": hi["samples_urls_per_sec"],
            "phase_best_sec": hi["phase_best_sec"],
        },
        "speedup": round(ratio, 3),
        "efficiency": round(ratio / factor, 3),
        "phase_efficiency": phase_eff,
        "hw_ceiling_same_session": ceiling,
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in
                      ("frontier", "speedup", "efficiency",
                       "phase_efficiency", "hw_ceiling_same_session")}))


if __name__ == "__main__":
    main()
