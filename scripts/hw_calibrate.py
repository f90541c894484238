"""One-time hardware scaling calibration for this box (see BENCH/BASELINE.md).

Measures the machine's own N->4N ceilings: pure-CPU multiprocessing speedup
and aggregate DRAM copy bandwidth. Run on an idle machine:

    python scripts/hw_calibrate.py [lo] [hi]
"""

from __future__ import annotations

import json
import multiprocessing
import sys
import time

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




if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(json.dumps({"lo": lo, "hi": hi, **hw_ceilings(lo, hi)}))
