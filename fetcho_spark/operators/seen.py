"""Partitioned-bloom URL-seen set (SURVEY.md §2.1 S4, §2.2 P8, §2.4 J1).

The reference keeps the seen set in Postgres ``WebResource(urihash,
next_fetch)`` probed in bulk (common/Database.cs:270-310) behind an in-memory
FIFO cache (common/FastLookupCache.cs). At 10^10-URL scale the rebuild keeps
state in tables, not executors (resumability):

- ``seen``        — exact set: ``(url_hash binary(16), url_hash64 long,
                    next_fetch timestamp)``, bucketed by ``pmod(url_hash64,
                    n_buckets)`` (Iceberg ``bucket()`` transform in prod).
- ``seen_filter`` — one approximate filter **per bucket** as a binary blob
                    row: ``(bucket, bits, n_items, n_bits)``; rebuilt
                    *incrementally* (new keys folded into the blob) each round
                    and snapshot-versioned with everything else. The blob
                    format is a pluggable core (operators/cuckoo.py): the
                    default bloom, or a cuckoo filter whose deletion support
                    lets :meth:`SeenSet.expire` shed TTL-expired keys without
                    a full rebuild (north star names "bloom/cuckoo" — both
                    ship, golden-tested to identical crawl output).

Probe = bloom pre-filter → exact left-anti join for the "maybe seen" subset
only. The bloom is ONLY a router: false positives just pay the exact join;
the final seen-set semantics stay exact (SURVEY.md §7.4). The probe is a
**cogrouped applyInPandas on the bucket key** — filter blobs are never
broadcast, so per-bucket blobs can be arbitrarily large and the probe scales
with the number of buckets, not driver memory.

TTL: a hash is "recently visited" while ``next_fetch > logical_now``
(28-day TTL, fetcho/Fetcho.cs:278); expired rows are re-fetchable but stay in
the bloom (supersets are safe — the exact join re-checks the TTL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..functions.hashing import splitmix64

FILTER_SCHEMA = T.StructType([
    T.StructField("bucket", T.LongType()),
    T.StructField("bits", T.BinaryType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("n_bits", T.LongType()),
])


def bucket_col(hash_col: str = "url_hash64", n_buckets: int = 64) -> Column:
    return F.pmod(F.col(hash_col), F.lit(n_buckets))


def _positions(keys: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(k, n) probe positions from signed-int64 keys — double hashing via two
    splitmix64 mixes; identical numpy code builds and probes, so membership of
    an inserted key is exact by construction."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = splitmix64(u)
    h2 = splitmix64(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    with np.errstate(over="ignore"):
        return ((h1 + i * h2) % np.uint64(n_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """AND over the k rows of ``pos`` → per-key maybe-membership."""
    probed = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return probed.all(axis=0)


class SeenSet:
    """Seen-set lifecycle over a :class:`~fetcho_spark.catalog.Catalog`."""

    def __init__(self, catalog: Catalog, n_buckets: int = 64,
                 bits_per_bucket: int = 1 << 20, n_hashes: int = 7,
                 table: str = "seen", filter_table: str = "seen_filter",
                 bloom_min_seen: int = 0, core=None):
        from .cuckoo import BloomCore
        self.catalog = catalog
        self.n_buckets = n_buckets
        self.bits_per_bucket = bits_per_bucket
        self.k = n_hashes
        self.core = core if core is not None else BloomCore(n_hashes)
        self.table = table
        self.filter_table = filter_table
        # below this seen-set size the bloom route costs more than it saves
        # (the exact anti-join broadcasts); past it the bloom pre-filter
        # prunes the join input — the 10^10 fast path
        self.bloom_min_seen = bloom_min_seen
        self._seen_rows = 0

    # ------------------------------------------------------------- probing
    def filter_unseen(self, frontier: DataFrame, logical_now) -> DataFrame:
        """Drop frontier rows whose hash is seen with an unexpired TTL.

        bloom-maybe rows → exact anti-join; bloom-definite-no rows skip the
        join entirely (the 99% fast path once the crawl is warm).
        """
        if not self.catalog.exists(self.table):
            return frontier
        frontier = frontier.withColumn("_bucket",
                                       bucket_col(n_buckets=self.n_buckets))
        use_bloom = self.catalog.exists(self.filter_table) and (
            self.bloom_min_seen == 0
            # parquet footer count — metadata-only, no scan
            or self.catalog.read(self.table).count() >= self.bloom_min_seen)
        if use_bloom:
            total_bloom_bytes = self.n_buckets * (self.bits_per_bucket // 8)
            if total_bloom_bytes <= self.BROADCAST_MAX_BYTES:
                probed = self._probe_broadcast(frontier)
            else:
                probed = self._probe_cogroup(frontier)
            clean = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
            maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        else:
            clean = frontier.limit(0)
            maybe = frontier
        recent = (self.catalog.read(self.table)
                  .filter(F.col("next_fetch") > F.lit(logical_now))
                  .select("url_hash64"))
        survived = maybe.join(recent, "url_hash64", "left_anti")
        return clean.unionByName(survived).drop("_bucket")

    # probe routes: same numpy membership test, different data movement.
    # broadcast (blobs fit in memory: one map-side pandas UDF, no shuffle) vs
    # cogroup (blobs too big to ship: frontier shuffles to its bucket's blob).
    BROADCAST_MAX_BYTES = 64 << 20

    def _probe_broadcast(self, frontier: DataFrame) -> DataFrame:
        spark = frontier.sparkSession
        flt = {int(r["bucket"]): (np.frombuffer(r["bits"], dtype=np.uint8),
                                  int(r["n_bits"]))
               for r in self.catalog.read(self.filter_table).collect()}
        bc = spark.sparkContext.broadcast(flt)
        core, nb = self.core, self.n_buckets

        @F.pandas_udf(T.BooleanType())
        def maybe_seen(url_hash64: pd.Series) -> pd.Series:
            table = bc.value
            keys = url_hash64.to_numpy()
            buckets = keys % nb  # python % == Spark pmod on int64
            out = np.zeros(len(keys), dtype=bool)
            for b in np.unique(buckets):
                ent = table.get(int(b))
                if ent is None:
                    continue
                bits, n_bits = ent
                m = buckets == b
                out[m] = core.contains(bits, n_bits, keys[m])
            return pd.Series(out)

        return frontier.withColumn("_maybe_seen",
                                   maybe_seen(F.col("url_hash64")))

    def _probe_cogroup(self, frontier: DataFrame) -> DataFrame:
        filters = self.catalog.read(self.filter_table)
        out_schema = T.StructType(
            [f for f in frontier.schema.fields] +
            [T.StructField("_maybe_seen", T.BooleanType())])
        core = self.core

        def probe(keys_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
            if keys_pdf.empty:
                keys_pdf["_maybe_seen"] = pd.Series([], dtype=bool)
                return keys_pdf
            if flt_pdf.empty:
                keys_pdf["_maybe_seen"] = False
                return keys_pdf
            bits = np.frombuffer(flt_pdf["bits"].iloc[0], dtype=np.uint8)
            n_bits = int(flt_pdf["n_bits"].iloc[0])
            keys_pdf["_maybe_seen"] = core.contains(
                bits, n_bits, keys_pdf["url_hash64"].to_numpy())
            return keys_pdf

        return (frontier.groupBy("_bucket")
                .cogroup(filters.withColumnRenamed("bucket", "_bucket")
                         .groupBy("_bucket"))
                .applyInPandas(probe, out_schema))

    # ------------------------------------------------------------- updates
    def record(self, fetched: DataFrame, next_fetch) -> None:
        """Record fetched hashes with the TTL and OR them into the blooms.

        APPEND-only: re-recording a hash after TTL expiry appends a fresher
        row; the probe's ``next_fetch > now`` filter makes any unexpired row
        block, so history rows are harmless. This is deliberate at 10^10
        scale — rewriting the seen table per round is not an option; a
        periodic :meth:`compact` (Iceberg MERGE in prod) folds history.
        """
        rows = (fetched.select("url_hash", "url_hash64").distinct()
                .withColumn("next_fetch", F.lit(next_fetch)))
        self.catalog.append(self.table, rows)
        self._update_filters(rows)

    def compact(self) -> None:
        """Fold append history: keep max(next_fetch) per hash (MERGE INTO)."""
        cur = self.catalog.read(self.table)
        folded = cur.groupBy("url_hash64").agg(
            F.max_by("url_hash", "next_fetch").alias("url_hash"),
            F.max("next_fetch").alias("next_fetch"))
        self.catalog.overwrite(self.table,
                               folded.select("url_hash", "url_hash64",
                                             "next_fetch"))

    def expire(self, logical_now) -> None:
        """Drop TTL-expired hashes from BOTH the exact table and the blobs.

        Long-crawl maintenance (the reference ages rows out of Postgres via
        ``next_fetch``; an approximate filter has no such luxury): without
        this, expired keys accumulate in the blobs until the false-positive
        rate sends every frontier row to the exact join. Cost profile is the
        point of the cuckoo backend:

        - **cuckoo** (``core.supports_delete``): delete the expired
          fingerprints in place, then re-probe the survivors and re-insert
          any that a fingerprint-collision delete took out (restores the
          no-false-negative invariant exactly — the standard cuckoo deletion
          caveat, handled, not ignored). O(expired) mutation + one
          vectorized survivor probe.
        - **bloom**: bits cannot be unset; the blob is rebuilt from the
          survivors. O(survivors) k-hash inserts every time.

        Both run per bucket inside the same cogrouped ``applyInPandas`` as
        the round updates — blobs never leave their bucket, nothing funnels
        through the driver. The exact table is folded (compact) and the
        expired rows dropped in the same pass. Like ``compact``, call this
        only AFTER a round checkpoint (CLAUDE.md maintenance rule)."""
        if not self.catalog.exists(self.table):
            return
        folded = (self.catalog.read(self.table)
                  .groupBy("url_hash64")
                  .agg(F.max_by("url_hash", "next_fetch").alias("url_hash"),
                       F.max("next_fetch").alias("next_fetch"))
                  .withColumn("bucket", bucket_col(n_buckets=self.n_buckets))
                  .withColumn("_expired",
                              F.col("next_fetch") <= F.lit(logical_now)))
        core, n_bits = self.core, self.bits_per_bucket
        if self.catalog.exists(self.filter_table):
            existing = self.catalog.read(self.filter_table)
        else:
            existing = folded.sparkSession.createDataFrame([], FILTER_SCHEMA)

        def rebuild(keys_pdf: pd.DataFrame,
                    flt_pdf: pd.DataFrame) -> pd.DataFrame:
            if keys_pdf.empty and flt_pdf.empty:
                return pd.DataFrame(
                    columns=["bucket", "bits", "n_items", "n_bits"])
            nb = int(flt_pdf["n_bits"].iloc[0]) if not flt_pdf.empty else n_bits
            bucket = int(flt_pdf["bucket"].iloc[0]) if not flt_pdf.empty \
                else int(keys_pdf["bucket"].iloc[0])
            kept = keys_pdf.loc[~keys_pdf["_expired"],
                                "url_hash64"].to_numpy()
            blob = np.frombuffer(flt_pdf["bits"].iloc[0],
                                 dtype=np.uint8) if not flt_pdf.empty \
                else None
            if (core.supports_delete and blob is not None
                    and not core.is_saturated(blob)):
                bits = blob.copy()
                gone = keys_pdf.loc[keys_pdf["_expired"],
                                    "url_hash64"].to_numpy()
                core.delete(bits, nb, gone)
                missing = kept[~core.contains(bits, nb, kept)]
                core.insert(bits, nb, missing)
            else:
                # bloom (bits can't be unset) or a saturated cuckoo blob
                # (its contents are unreachable — expiry may bring the key
                # count back under capacity): rebuild from the survivors
                bits = core.empty(nb)
                core.insert(bits, nb, kept)
            return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()],
                                 "n_items": [len(kept)], "n_bits": [nb]})

        merged = (folded.select("bucket", "url_hash64", "_expired")
                  .groupBy("bucket")
                  .cogroup(existing.groupBy("bucket"))
                  .applyInPandas(rebuild, FILTER_SCHEMA))
        self.catalog.overwrite(self.filter_table, merged)
        self.catalog.overwrite(
            self.table,
            folded.filter(~F.col("_expired"))
                  .select("url_hash", "url_hash64", "next_fetch"))

    def _update_filters(self, rows: DataFrame) -> None:
        spark = rows.sparkSession
        keyed = rows.select("url_hash64").withColumn(
            "bucket", bucket_col(n_buckets=self.n_buckets))
        if self.catalog.exists(self.filter_table):
            existing = self.catalog.read(self.filter_table)
        else:
            existing = spark.createDataFrame([], FILTER_SCHEMA)
        n_bits, core = self.bits_per_bucket, self.core

        def merge(new_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
            if new_pdf.empty and flt_pdf.empty:
                return pd.DataFrame(columns=["bucket", "bits", "n_items", "n_bits"])
            if flt_pdf.empty:
                bits = core.empty(n_bits)
                n_items, nb = 0, n_bits
                bucket = int(new_pdf["bucket"].iloc[0])
            else:
                bits = np.frombuffer(flt_pdf["bits"].iloc[0], dtype=np.uint8).copy()
                n_items = int(flt_pdf["n_items"].iloc[0])
                nb = int(flt_pdf["n_bits"].iloc[0])
                bucket = int(flt_pdf["bucket"].iloc[0])
            if not new_pdf.empty:
                core.insert(bits, nb, new_pdf["url_hash64"].to_numpy())
                n_items += len(new_pdf)
            return pd.DataFrame({"bucket": [bucket], "bits": [bits.tobytes()],
                                 "n_items": [n_items], "n_bits": [nb]})

        merged = (keyed.groupBy("bucket")
                  .cogroup(existing.groupBy("bucket"))
                  .applyInPandas(merge, FILTER_SCHEMA))
        self.catalog.overwrite(self.filter_table, merged)
