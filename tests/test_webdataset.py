"""WebDataset sink/source (sources/webdataset.py): byte-determinism
across runs and partitionings, round-trip fidelity, shard sizing,
manifest correctness, seeded-order layout."""

import hashlib
import os
import tarfile
import tempfile

import pytest
from pyspark.sql import functions as F

from fetcho_spark.sources.webdataset import read_webdataset, write_webdataset

pytestmark = [pytest.mark.spark]


def _df(spark, n=25, parts=4):
    rows = [(i, f"caption text {i} of the sample",
             bytes([i % 256, (i * 7) % 256, 0x89]) * (i % 5 + 1),
             '{"id": %d}' % i) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, caption string, img binary, meta string") \
        .repartition(parts)


EXTS = {"txt": "caption", "img": "img", "json": "meta"}


def _write(spark, df, td, **kw):
    out = os.path.join(td, "shards")
    manifest = sorted(
        tuple(r) for r in
        write_webdataset(df, out, EXTS, shard_size=8, **kw).collect())
    return out, manifest


def test_round_trip_and_manifest(spark):
    with tempfile.TemporaryDirectory() as td:
        df = _df(spark)
        out, manifest = _write(spark, df, td)
        # 25 samples / shard_size 8 -> shards of 8,8,8,1
        assert [m[2] for m in manifest] == [8, 8, 8, 1]
        assert all(os.path.exists(m[1]) for m in manifest)
        # manifest md5 == bytes on disk
        for m in manifest:
            with open(m[1], "rb") as fh:
                data = fh.read()
            assert len(data) == m[3] and hashlib.md5(data).hexdigest() == m[4]
        back = read_webdataset(spark, out)
        rows = back.collect()
        assert len(rows) == 25 * 3
        src = {(str(r["doc_id"]), "txt"): r["caption"].encode()
               for r in df.collect()}
        src.update({(str(r["doc_id"]), "img"): bytes(r["img"])
                    for r in df.collect()})
        src.update({(str(r["doc_id"]), "json"): r["meta"].encode()
                    for r in df.collect()})
        for r in rows:
            assert bytes(r["payload"]) == src[(r["key"], r["ext"])]


def test_shard_bytes_are_deterministic(spark):
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        _, m1 = _write(spark, _df(spark, parts=2), t1)
        _, m2 = _write(spark, _df(spark, parts=9), t2)
        assert [(m[0], m[2], m[3], m[4]) for m in m1] == \
               [(m[0], m[2], m[3], m[4]) for m in m2], \
            "tar bytes must not depend on input partitioning"


def test_sample_grouping_and_order(spark):
    """Members of one sample are adjacent (loader contract) and samples
    follow the md5-seeded order within and across shards."""
    with tempfile.TemporaryDirectory() as td:
        out, manifest = _write(spark, _df(spark), td)
        seen_keys = []
        for m in manifest:
            with tarfile.open(m[1]) as tar:
                names = [t.name for t in tar if t.isfile()]
            assert len(names) % 3 == 0
            for i in range(0, len(names), 3):
                ks = {n.rpartition(".")[0] for n in names[i:i + 3]}
                assert len(ks) == 1, "sample members must be adjacent"
                assert [n.rpartition(".")[2] for n in names[i:i + 3]] == \
                    ["txt", "img", "json"], "member order = exts order"
                seen_keys.append(ks.pop())
        expected = sorted(
            (hashlib.md5(f"{i}:wds:42".encode()).hexdigest(), str(i))
            for i in range(25))
        assert seen_keys == [k for _rk, k in expected]
        assert len(set(seen_keys)) == 25


def test_zeroed_tar_metadata(spark):
    with tempfile.TemporaryDirectory() as td:
        out, manifest = _write(spark, _df(spark, n=5), td)
        with tarfile.open(manifest[0][1]) as tar:
            for t in tar:
                assert t.mtime == 0 and t.uid == 0 and t.gid == 0
                assert t.mode == 0o644 and t.uname == "" and t.gname == ""


def test_null_and_binary_payloads(spark):
    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(1, None, None, "x")],
            "doc_id long, caption string, img binary, meta string")
        out, manifest = _write(spark, df, td)
        rows = {r["ext"]: bytes(r["payload"])
                for r in read_webdataset(spark, out).collect()}
        assert rows == {"txt": b"", "img": b"", "json": b"x"}


def test_write_is_eager(spark):
    """Dropping the returned manifest must still produce shards on disk
    (the review-found lazy-side-effect hazard)."""
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "shards")
        write_webdataset(_df(spark, n=5), out, EXTS, shard_size=8)
        tars = [f for f in os.listdir(out) if f.endswith(".tar")]
        assert tars, "write_webdataset must not require materialization"
