"""WARC 1.0/1.1 reader + writer (ISO 28500 — the Common Crawl / Internet
Archive web-archive format), pure stdlib + Spark.

The reference stores crawl history in its own gzip-XML packet files
(sources/packets.py implements that parity path); WARC is the
industry-standard equivalent, and an engine claiming to replace a crawler
should ingest the archives every public web corpus ships in. This module
reads ``.warc`` and ``.warc.gz`` (the per-record-gzip-member convention —
each record its own deflate stream, so archives are seekable/splittable)
into a DataFrame shaped for the rest of the pipeline, and writes valid
WARC response records back out.

Scale model mirrors packets.py: **one WARC file = one Spark task** via the
``binaryFile`` source (Common Crawl caps files at ~1 GB — bounded by
construction); parsing is record-streaming, memory per task is one record.
``warc_response_pages`` bridges straight into ``operators/fetch
.extract_links``, so a Common-Crawl-style archive can seed link extraction
/ the frontier without touching the simulated fetcher.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


# ----------------------------------------------------------------- writer

def build_warc_record(url: str, date: str, status: int,
                      resp_headers: dict[str, str], body: bytes,
                      warc_type: str = "response",
                      record_id: str | None = None) -> bytes:
    """One WARC record (uncompressed bytes): WARC headers + an HTTP/1.1
    response block + the mandatory trailing CRLF CRLF."""
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found",
              304: "Not Modified", 404: "Not Found",
              429: "Too Many Requests", 500: "Internal Server Error"} \
        .get(status, "Status")
    http = bytearray(f"HTTP/1.1 {status} {reason}".encode()) + _CRLF
    for k, v in resp_headers.items():
        http += f"{k}: {v}".encode() + _CRLF
    http += _CRLF + body
    rid = record_id or f"<urn:uuid:{abs(hash((url, date))):032x}>"
    hdr = bytearray(b"WARC/1.0") + _CRLF
    for k, v in (("WARC-Type", warc_type),
                 ("WARC-Target-URI", url),
                 ("WARC-Date", date),
                 ("WARC-Record-ID", rid),
                 ("Content-Type", "application/http; msgtype=response"),
                 ("Content-Length", str(len(http)))):
        hdr += f"{k}: {v}".encode() + _CRLF
    return bytes(hdr + _CRLF + http + _CRLF + _CRLF)


def write_warc(records: list[tuple], path: str,
               compress: bool = True) -> None:
    """Write (url, date, status, headers_dict, body_bytes) tuples as a
    ``.warc``/``.warc.gz`` file. With ``compress`` each record becomes its
    OWN gzip member (the standard warc.gz convention that keeps archives
    record-seekable)."""
    with open(path, "wb") as f:
        for url, date, status, headers, body in records:
            rec = build_warc_record(url, date, status, headers, body)
            f.write(gzip.compress(rec) if compress else rec)


# ----------------------------------------------------------------- parser

def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member stream → concatenated plain bytes."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        tail = d.unused_data
        pos = len(data) - len(tail) if tail else len(data)
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """WARC bytes (plain or gzipped, any member layout) → one dict per
    record: warc_type, url, date, http_status, resp_headers, body,
    content_type. Non-HTTP records (warcinfo, request, metadata) yield
    with ``http_status`` None and the raw block as ``body``."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    stream = io.BytesIO(data)
    while True:
        line = stream.readline()
        while line in (_CRLF, b"\n"):          # skip inter-record gaps
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line {line[:20]!r}")
        headers: dict[str, str] = {}
        while True:
            hl = stream.readline()
            if hl in (_CRLF, b"\n", b""):
                break
            k, _, v = hl.decode("utf-8", "replace").partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers.get("Content-Length", "0"))
        block = stream.read(length)
        rec = {"warc_type": headers.get("WARC-Type", ""),
               "url": headers.get("WARC-Target-URI"),
               "date": headers.get("WARC-Date"),
               "http_status": None,
               "resp_headers": {},
               "body": block,
               "content_type": None}
        ctype = headers.get("Content-Type", "")
        if ctype.startswith("application/http") and block[:5] == b"HTTP/":
            head, _, body = block.partition(_CRLF + _CRLF)
            lines = head.split(_CRLF)
            parts = lines[0].split(b" ", 2)
            rec["http_status"] = int(parts[1]) if len(parts) > 1 else None
            rh = {}
            for hl in lines[1:]:
                k, _, v = hl.decode("utf-8", "replace").partition(":")
                if k:
                    rh.setdefault(k.strip(), v.strip())
            rec["resp_headers"] = rh
            rec["body"] = body
            rec["content_type"] = rh.get("Content-Type")
        yield rec


# ------------------------------------------------------------ Spark reader

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("resp_headers", T.MapType(T.StringType(), T.StringType())),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingest: ``binaryFile`` scan (one file per task,
    files bounded by the WARC rotation convention) → record-streaming
    parse in ``mapInPandas`` → one row per record."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc(bytes(content)):
                    rows.append((fpath, r["warc_type"], r["url"],
                                 r["date"], r["http_status"],
                                 r["resp_headers"], r["content_type"],
                                 bytearray(r["body"])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_SCHEMA.fields])

    return files.mapInPandas(run, WARC_SCHEMA)


def warc_webgraph(warc_df: DataFrame) -> DataFrame:
    """WARC rows → the engine's WEBGRAPH table shape: a Common-Crawl-style
    archive becomes the web the crawl loop runs over. Bodies of textual
    payloads ride as the C3 raw-body corpus (the engine's HTML extractor
    pulls the links); redirects map from the Location header of 3xx
    responses; the Rating header feeds the P15 content block; URLs absent
    from the archive 404 naturally in the fetch join. image_id stays null
    (archives carry no fixture payload corpus — payload verify no-ops)."""
    from ..functions.urls import frontier_host_col
    textual = (F.lower(F.coalesce(F.col("content_type"), F.lit("")))
               .rlike("text/|html|xml|json|javascript"))
    is_3xx = F.col("http_status").between(300, 399)
    return (warc_df
            .filter((F.col("warc_type") == "response")
                    & F.col("http_status").isNotNull()
                    & F.col("url").isNotNull())
            .dropDuplicates(["url"])
            .select(F.col("url"),
                    frontier_host_col(F.col("url")).alias("host"),
                    F.lit(None).cast("string").alias("image_id"),
                    F.lit(None).cast(T.ArrayType(T.StringType()))
                     .alias("out_links"),
                    F.col("http_status").alias("status"),
                    F.col("content_type"),
                    F.when(textual, F.col("body").cast("string"))
                     .alias("body"),
                    F.col("resp_headers").getItem("Rating").alias("rating"),
                    F.when(is_3xx,
                           F.col("resp_headers").getItem("Location"))
                     .alias("redirect_to")))


def warc_response_pages(warc_df: DataFrame) -> DataFrame:
    """WARC rows → the ``fetched``-shaped frame ``operators/fetch
    .extract_links`` consumes (url, host, status, content_type, body,
    out_links) — a Common Crawl archive becomes a link-extraction /
    frontier-seeding input with no fetcher involved."""
    from ..functions.urls import frontier_host_col
    # only TEXTUAL payloads become the string body the link extractor
    # scans — casting arbitrary binary (images, archives) to string
    # produces invalid-UTF8 data the Arrow UDF crossing rejects, and
    # binary payloads carry no hrefs anyway
    textual = (F.lower(F.coalesce(F.col("content_type"), F.lit("")))
               .rlike("text/|html|xml|json|javascript"))
    return (warc_df
            .filter((F.col("warc_type") == "response")
                    & F.col("http_status").isNotNull())
            .select(F.col("url"),
                    frontier_host_col(F.col("url")).alias("host"),
                    F.col("http_status").alias("status"),
                    F.col("content_type"),
                    F.when(textual, F.col("body").cast("string"))
                     .alias("body"),
                    F.lit(None).cast(T.ArrayType(T.StringType()))
                     .alias("out_links")))
