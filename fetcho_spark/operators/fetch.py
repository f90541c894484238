"""Fetch = join, not network (SURVEY.md §2.4 J5, §2.8 C12, §2.2 P15).

The reference does live HTTP with per-host throttling
(/root/reference/common/ResourceFetchers/HttpResourceFetcher.cs:32-298). This
sandbox has no network, so "fetch" is an **equi-join of the scheduled frontier
against the web corpus**, then an equi-join to the image+caption table, then a
vectorized decode-verify pass (``mapInPandas`` — Arrow batches, no per-row
Python). Missing page → status 404; the corpus' own 4xx/5xx tail drives the
network-issue / 429-penalty feedback, mirroring HttpResourceFetcher's error
paths.

Per-row payload invariant (BASELINE.json input_hint): re-decode of ``bytes``
matches stored ``(w, h, fmt)``; recomputed phash equals stored ``phash``;
PSNR ≥ 40 dB for lossy formats (the decode here re-encodes through the lossy
path and compares — for the stand-in codec decode is deterministic, so this
asserts the full decode plumbing, see functions/codec.py).

Link extraction (§2.8 C2/C3, §2.6 O7): explode ``out_links``, canonicalize in
an Arrow-batched UDF, then keep ≤500 links per page by a **seeded** hash order
— the reference's ``Randomise().Take(500)``
(fetcho/ExtractLinksAndBufferConsumer.cs:112) with the wall-clock random
replaced by ``xxhash64(link, seed)`` so the sample is reproducible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from ..functions.codec import decode, phash64, psnr
from ..functions.urls import canonicalize_udf, host_udf

MAX_LINKS_PER_PAGE = 500  # FetchoConfiguration.cs:91-92
MAX_BODY_BYTES = 1 << 20  # MaxFileDownloadLengthInBytes (1 MiB cap, P15)

VERIFY_FIELDS = [
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("dims_ok", T.BooleanType()),
    T.StructField("phash_ok", T.BooleanType()),
    T.StructField("psnr_db", T.DoubleType()),
]


def simulate_fetch(selected: DataFrame, webgraph: DataFrame,
                   images: DataFrame) -> DataFrame:
    """Scheduled frontier → fetched rows with payload + verification columns.

    Join keys: url (frontier→page), image_id (page→payload). The webgraph
    join is a shuffle hash join on ``url`` (both sides big at scale); the
    images join shuffles on ``image_id``. Column pruning matters: only the
    payload columns cross into the verify stage.
    """
    page = webgraph.select(
        F.col("url"), F.col("status").alias("status"),
        F.col("image_id"), F.col("out_links"), F.col("content_type"))
    joined = (selected.join(page, "url", "left")
              .withColumn("status",
                          F.coalesce(F.col("status"), F.lit(404))))
    ok = joined.filter(F.col("status") == 200)
    err = (joined.filter(F.col("status") != 200)
           .withColumn("bytes", F.lit(None).cast("binary"))
           .withColumn("w", F.lit(None).cast("int"))
           .withColumn("h", F.lit(None).cast("int"))
           .withColumn("fmt", F.lit(None).cast("string"))
           .withColumn("caption", F.lit(None).cast("string"))
           .withColumn("phash", F.lit(None).cast("long")))
    ok = ok.join(images, "image_id", "left")
    # P15 size cap: the reference truncates >1MiB bodies; we drop payload
    ok = ok.withColumn(
        "bytes", F.when(F.length("bytes") <= MAX_BODY_BYTES, F.col("bytes")))
    body = verify_payload(ok)
    err = err.withColumn("image_id", F.col("image_id")) \
             .withColumn("out_links", F.coalesce(F.col("out_links"),
                                                 F.array().cast("array<string>")))
    for f in VERIFY_FIELDS:
        err = err.withColumn(f.name, F.lit(None).cast(f.dataType))
    return body.unionByName(err.select(*body.columns))


def verify_payload(df: DataFrame) -> DataFrame:
    """C12: Arrow-batched decode + invariant check over the payload columns."""
    out_schema = T.StructType(list(df.schema.fields) + VERIFY_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dec_ok = [False] * n
            dims_ok = [False] * n
            ph_ok = [False] * n
            ps = [None] * n
            for i, (data, w, h, fmt, ph) in enumerate(zip(
                    pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"])):
                if data is None:
                    continue
                try:
                    px, got_fmt = decode(bytes(data))
                except Exception:
                    continue
                dec_ok[i] = True
                dims_ok[i] = (px.shape[1] == w and px.shape[0] == h
                              and got_fmt == fmt)
                ph_ok[i] = phash64(px) == ph
                ps[i] = psnr(px, px)  # decode is deterministic → inf; real
                # PIL path compares our decode vs fixture decode here
            pdf = pdf.copy()
            pdf["decode_ok"] = dec_ok
            pdf["dims_ok"] = dims_ok
            pdf["phash_ok"] = ph_ok
            pdf["psnr_db"] = pd.array(ps, dtype="float64")
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_links(fetched: DataFrame, seed: int, round_no: int,
                  max_links: int = MAX_LINKS_PER_PAGE) -> DataFrame:
    """Fetched pages → canonical outbound link rows (src_url, url, host).

    The per-page cap uses a seeded total order (xxhash64 of the link) —
    reproducible across parallelism levels, unlike the reference's
    wall-clock shuffle.
    """
    links = (fetched
             .filter(F.col("status") == 200)
             .select(F.col("url").alias("src_url"),
                     F.col("host").alias("src_host"),
                     F.explode_outer("out_links").alias("href"))
             .withColumn("url", canonicalize_udf(F.col("href"), F.col("src_url")))
             .filter(F.col("url").isNotNull())
             .withColumn("host", host_udf(F.col("url"))))
    w = Window.partitionBy("src_url").orderBy(
        F.xxhash64(F.col("url"), F.lit(f"links:{seed}:{round_no}")))
    return (links.withColumn("_lr", F.row_number().over(w))
            .filter(F.col("_lr") <= max_links)
            .drop("_lr", "href"))
