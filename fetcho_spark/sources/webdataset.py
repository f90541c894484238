"""WebDataset tar-shard sink + source — the training-loader boundary.

A 100 TB multimodal pipeline doesn't end at a parquet table: the GPU
loaders (webdataset / torchdata-style) stream POSIX tars whose members
group by sample key — ``{key}.jpg`` + ``{key}.txt`` + ``{key}.json`` —
sequential I/O, no random access, resumable by shard. This module writes
that layout from any DataFrame and reads it back, completing the chain
the batching/packing operators prepare (aspect_bucket_batches,
pack_sequences order the samples; this is the sink their output feeds).

Reference context: the reference's nearest analog is the WebDataPacket
writer (S2, common/ — 100k-resource rotating XML files); tar shards are
the same rotation idea at the loader boundary, part of the
LLM-training-data axis the north rule adds.

Determinism (the repo's crawl-grade discipline, applied to BYTES on
disk): sample order is the md5-seeded total order over keys (the
token_budget/pack_sequences trick), shard id = ``seq div shard_size``
via the two-phase range-partitioned global rank (never a single-task
window), and every tar member is written with zeroed metadata (mtime 0,
uid/gid 0, mode 0644, empty uname/gname) in PAX-free ustar format — so
each shard's bytes, and hence its md5, are a pure function of the data:
two runs at any parallelism produce identical shards (tested).

Scale shape: one range-partition shuffle for the global rank, one hash
shuffle on shard id so each shard's rows land in one task, then a
mapInPandas (Arrow-batched) writer that streams members into the tar —
per-task memory is ONE in-flight tar (bounded by ``shard_size`` ×
sample size, the operator's documented knob, default ~ a few hundred
MB at LAION-scale samples). Writers emit a manifest row per shard
(path, n_samples, n_bytes, md5) — the audit artifact, not a side
effect. Paths must be on shared storage in a real cluster (same
contract as any file sink).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_webdataset", "read_webdataset"]

_MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard_id", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("md5", T.StringType()),
])

_READ_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def _to_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return str(v).encode("utf-8")


def write_webdataset(df: DataFrame, out_dir: str,
                     exts: dict[str, str],
                     key_col: str = "doc_id",
                     shard_size: int = 1000,
                     seed: int = 42,
                     name_fmt: str = "shard-{:06d}.tar") -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``out_dir``; returns
    the manifest DataFrame (one row per shard: path, n_samples, n_bytes,
    md5). ``exts`` maps tar member extension → source column (string
    columns are UTF-8 encoded, binary pass through, null → empty member;
    iteration order of the dict = member order within a sample, so pass
    it in the order the loader expects). The write is EAGER — the shard
    job runs before this returns (the manifest is tiny; returning a lazy
    plan would mean a caller who drops the return value writes
    nothing)."""
    ext_items = list(exts.items())
    from ..operators.priority import with_global_seq
    staged = df.select(
        F.col(key_col).cast("string").alias("_key"),
        F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(f":wds:{seed}"))).alias("_rk"),
        *[F.col(c).alias(f"_v{i}") for i, (_e, c) in enumerate(ext_items)])
    ranked = with_global_seq(staged, sort_cols=("_rk", "_key"),
                             out_col="_seq", out_type="long")
    sharded = (ranked
               .withColumn("_shard", F.expr(f"_seq div {int(shard_size)}"))
               .repartition("_shard")
               .sortWithinPartitions("_shard", "_seq")
               .select("_shard", "_key",
                       *[f"_v{i}" for i in range(len(ext_items))]))

    exts_only = [e for e, _c in ext_items]
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import pandas as pd

        open_shard: list = [None, None, None, None]  # id, buf, tar, count

        def _finish():
            sid, buf, tar, count = open_shard
            tar.close()
            data = buf.getvalue()
            path = os.path.join(out_dir, name_fmt.format(sid))
            # attempt-unique tmp name: concurrent attempts of the same
            # task (speculation / zombie retry) must not share an inode
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
            open_shard[0] = None
            return {"shard_id": sid, "path": path, "n_samples": count,
                    "n_bytes": len(data),
                    "md5": hashlib.md5(data).hexdigest()}

        out = []
        for pdf in batches:
            # positional tuples: pandas itertuples mangles _-prefixed
            # names; column order is pinned by the select above
            for row in pdf.itertuples(index=False, name=None):
                sid, key = int(row[0]), row[1]
                if open_shard[0] is not None and open_shard[0] != sid:
                    out.append(_finish())
                if open_shard[0] is None:
                    buf = io.BytesIO()
                    open_shard[:] = [sid, buf,
                                     tarfile.open(fileobj=buf, mode="w",
                                                  format=tarfile.USTAR_FORMAT),
                                     0]
                tar = open_shard[2]
                for i, ext in enumerate(exts_only):
                    payload = _to_bytes(row[2 + i])
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(payload))
                open_shard[3] += 1
        if open_shard[0] is not None:
            out.append(_finish())
        if out:
            yield pd.DataFrame(out)

    spark = df.sparkSession
    manifest_rows = [tuple(r) for r in
                     sharded.mapInPandas(_write,
                                         schema=_MANIFEST_SCHEMA).collect()]
    return spark.createDataFrame(manifest_rows, _MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset shards back as ``(shard, key, ext, payload)`` rows
    — one bounded tar per task (binaryFile scan, the packets/warc
    pattern), members streamed without extracting to disk."""
    files = (spark.read.format("binaryFile")
             .load(os.path.join(path, "*.tar"))
             .select("path", "content"))

    def _parse(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        payload = tar.extractfile(m).read()
                        rows.append((shard, key if dot else m.name,
                                     ext if dot else "", payload))
            if rows:
                yield pd.DataFrame(rows,
                                   columns=["shard", "key", "ext", "payload"])

    return files.mapInPandas(_parse, schema=_READ_SCHEMA)
