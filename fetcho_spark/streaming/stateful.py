"""Custom stateful streaming: a URL-seen filter over an unbounded mention
stream (SURVEY.md §2.9 "stateful seen-set", §2.10 custom-operator surface).

The batch engine keeps the seen set in tables (operators/seen.py) because
resumability demands state-in-storage. This module is the *streaming-native*
form of the same primitive for pipelines that want first-occurrence semantics
inline: ``applyInPandasWithState`` with the stream grouped by url-hash bucket,
each group's state holding its bucket's (hash → expiry) map — the reference's
FIFO visited cache (common/FastLookupCache.cs semantics) as Spark GroupState.

Scale shape: state is partitioned by bucket (pmod of the 64-bit hash), so it
spreads across executors like any keyed state; per-bucket state is a dict of
int64→int64 kept in the state store between micro-batches. TTL eviction runs
per invocation against the batch's max event time (reusing the crawl's
logical-time discipline — no wall clock, so replays are deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("url_hash64", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
])

# state per bucket: parallel arrays (hashes, expiries) — state-store types
# must be Spark SQL types, so two long arrays, not a Python dict
STATE_SCHEMA = T.StructType([
    T.StructField("hashes", T.ArrayType(T.LongType())),
    T.StructField("expiries", T.ArrayType(T.LongType())),
])


def _dedup_group(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState, ttl_ms: int) -> Iterator[pd.DataFrame]:
    if state.exists:
        hashes, expiries = state.get
        seen = dict(zip(hashes, expiries))
    else:
        seen = {}
    out_rows: list[tuple] = []
    max_ts = 0
    for pdf in pdfs:
        # deterministic intra-batch order: by (ts, hash, url), first wins
        pdf = pdf.sort_values(["ts_ms", "url_hash64", "url"])
        for h, url, ts in zip(pdf["url_hash64"], pdf["url"], pdf["ts_ms"]):
            h, ts = int(h), int(ts)
            max_ts = max(max_ts, ts)
            exp = seen.get(h)
            if exp is not None and exp > ts:
                continue                      # seen and not yet expired
            seen[h] = ts + ttl_ms
            out_rows.append((key[0], h, url, ts))
    # TTL eviction against the batch's max event time (logical, not wall)
    seen = {h: e for h, e in seen.items() if e > max_ts}
    state.update((list(seen.keys()), list(seen.values())))
    if out_rows:
        out = pd.DataFrame(out_rows,
                           columns=["bucket", "url_hash64", "url", "ts_ms"])
        out["url_hash64"] = out["url_hash64"].astype("int64")
        out["ts_ms"] = out["ts_ms"].astype("int64")
        yield out


def streaming_seen_filter(mentions: DataFrame, n_buckets: int = 32,
                          ttl_ms: int = 3_600_000) -> DataFrame:
    """First-occurrence filter over a streaming (or batch-testable) mention
    DataFrame with columns (url string, ts_ms long): emits each URL once per
    TTL window, carrying its hash bucket. State lives in the streaming state
    store, keyed by bucket."""
    keyed = (mentions
             .withColumn("url_hash64", F.xxhash64("url"))
             .withColumn("bucket",
                         F.pmod(F.col("url_hash64"),
                                F.lit(n_buckets)).cast("int")))

    def fn(key, pdfs, state):
        return _dedup_group(key, pdfs, state, ttl_ms)

    return (keyed.groupBy("bucket")
            .applyInPandasWithState(fn,
                                    outputStructType=OUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
