"""Hash-range sharding math (SURVEY.md §1.1 ServerNode, §2.2 P7/S9).

The reference slices the MD5 keyspace across crawler nodes
(/root/reference/common/HashRange.cs:73-134; entity ServerNode.cs:8-34) and
exports out-of-range URLs to ``outbox.txt`` (fetcho/Program.cs:104-120). In
Spark the shuffle IS the shard router — this module exists for (a) parity
with the reference's boundary math (pinned by commonTest/HashRangeTest.cs)
and (b) explicit multi-cluster export when a deployment really does split
one keyspace across independent Spark clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_HASH = 0
MAX_HASH = (1 << 128) - 1


def segment_range(percentages: list[float]) -> list[tuple[int, int]]:
    """Split the 128-bit MD5 keyspace by percentage weights —
    ``HashRange.SegmentRange`` semantics: contiguous, gap-free, covering."""
    if abs(sum(percentages) - 1.0) > 1e-9:
        raise ValueError("percentages must sum to 1")
    out = []
    lo = MIN_HASH
    acc = 0.0
    for i, p in enumerate(percentages):
        acc += p
        hi = MAX_HASH if i == len(percentages) - 1 else int(MAX_HASH * acc)
        out.append((lo, hi))
        lo = hi + 1
    return out


def hash_in_range(lo: int, hi: int, hash_hex_col: Column) -> Column:
    """Contains-check on the hex MD5 string — string comparison on
    fixed-width lowercase hex IS the 128-bit integer order."""
    lo_hex = format(lo, "032x")
    hi_hex = format(hi, "032x")
    return (hash_hex_col >= F.lit(lo_hex)) & (hash_hex_col <= F.lit(hi_hex))


def split_by_range(frontier: DataFrame, lo: int, hi: int,
                   url_col: str = "url") -> tuple[DataFrame, DataFrame]:
    """(in-range, out-of-range) — the outbox export (S9). In a single-cluster
    deployment use Spark partitioning instead; this is the cross-cluster
    escape hatch."""
    h = F.md5(F.col(url_col))
    mine = frontier.filter(hash_in_range(lo, hi, h))
    outbox = frontier.filter(~hash_in_range(lo, hi, h))
    return mine, outbox
