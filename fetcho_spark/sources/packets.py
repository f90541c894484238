"""WebDataPacket gzip-XML parity reader/writer (SURVEY.md §2.1 S1/S2).

The engine's native state store is parquet snapshots (catalog.py), but real
fetcho deployments hold their history in *packet files*: gzip-compressed XML
streams of ``<resource><request>…</request><response><header>…</header>
<data>base64</data></response></resource>`` records, rotated every ~100k
resources and capped at 500k (common/WebDataPacketWriter.cs:58-160,
common/WebDataPacketReader.cs:11-275). This module lets such files be
ingested directly: a pure-Python parser plus a distributed Spark reader.

Scale model: **one packet file = one Spark task.** Packet files are bounded
by construction (the reference rotates them), so a 100 TB packet corpus is
hundreds of thousands of files fanning out across executors via the
``binaryFile`` source; no single file can blow a task. Parsing streams
through ``iterparse`` with element eviction, so memory per task is one
resource, not one file.

Parity helpers mirror the reference's static extractors and are tested with
the same inputs as commonTest/WebPacketDataReaderTest.cs:
- ``uri_from_request``      ↔ GetUriFromRequestString (reader :171-190)
- ``referer_from_request``  ↔ GetRefererUriFromRequestString (:192-211)
- ``content_type_from_headers`` ↔ GetContentTypeFromResponseHeaders (:213-235)
- ``headers_map``           ↔ GetHeaders (:237-265); note the reference's
  duplicate-key guard is inverted (it Adds only when the key already exists,
  which throws) — the evident intent, first key wins, is implemented here.
"""

from __future__ import annotations

import base64
import gzip
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_RESOURCES_IN_A_FILE = 500_000  # WebDataPacketReader.cs:16

PACKET_SCHEMA = T.StructType([
    T.StructField("packet_file", T.StringType()),
    T.StructField("resource_seq", T.LongType()),
    T.StructField("uri", T.StringType()),
    T.StructField("referer", T.StringType()),
    T.StructField("request", T.StringType()),
    T.StructField("response_headers", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("exception", T.StringType()),
])


# --------------------------------------------------------- parity extractors

def uri_from_request(request: str | None) -> str | None:
    """GetUriFromRequestString: the request text must START with ``Uri:``;
    the URI is everything up to the first newline, trimmed."""
    if not request or not request.strip():
        return None
    if not request.startswith("Uri:"):
        return None
    i = request.find("\n")
    if i < 0:
        return None
    uri = request[len("Uri:"):i].strip()
    return uri or None


def referer_from_request(request: str | None) -> str | None:
    """GetRefererUriFromRequestString: case-insensitive ``referer:`` anywhere
    in the request text; value runs to the next newline, trimmed."""
    if not request or not request.strip():
        return None
    low = request.lower()
    idx = low.find("referer:")
    if idx < 0:
        return None
    rest = request[idx:]
    i = rest.find("\n")
    if i < 0:
        return None
    ref = rest[len("referer:"):i].strip()
    return ref or None


def content_type_from_headers(response_headers: str | None) -> str:
    """GetContentTypeFromResponseHeaders: case-insensitive ``content-type:``
    prefix; value to the next newline (or end), trimmed; '' = Unknown."""
    if not response_headers:
        return ""
    low = response_headers.lower()
    idx = low.find("content-type:")
    if idx < 0:
        return ""
    start = idx + len("content-type:")
    end = response_headers.find("\n", start)
    value = response_headers[start:] if end < 0 else response_headers[start:end]
    return value.strip()


def headers_map(response_headers: str | None) -> dict[str, str]:
    """GetHeaders: one ``key: value`` per line, key lower-cased and trimmed,
    first occurrence wins (see module docstring on the reference's guard)."""
    d: dict[str, str] = {}
    if not response_headers:
        return d
    for line in response_headers.splitlines():
        idx = line.find(":")
        if idx > -1:
            key = line[:idx].lower().strip()
            if key not in d:
                d[key] = line[idx + 1:]
    return d


# ------------------------------------------------------------------- writer

def write_packet(path: str, resources: list[dict],
                 start_time: str = "2026-01-01T00:00:00Z",
                 end_time: str = "2026-01-01T00:01:00Z") -> None:
    """Write a reference-shaped packet file. Each resource dict:
    ``{"request": str, "response_headers": str, "data": bytes}`` or
    ``{"request": str, "exception": str}`` (the writer emits either a
    response or an exception per resource, WebDataPacketWriter.cs:95-148)."""
    if len(resources) > MAX_RESOURCES_IN_A_FILE:
        raise ValueError(f"packet exceeds {MAX_RESOURCES_IN_A_FILE} resources")
    buf = io.StringIO()
    buf.write("<resources>")
    buf.write(f"<startTime>{escape(start_time)}</startTime>")
    for r in resources:
        buf.write("<resource>")
        buf.write(f"<request>{escape(r.get('request') or '')}</request>")
        if r.get("exception") is not None:
            buf.write(f"<exception>{escape(r['exception'])}</exception>")
        else:
            buf.write("<response>")
            buf.write("<header>"
                      f"{escape(r.get('response_headers') or '')}</header>")
            data = r.get("data") or b""
            buf.write(f"<data>{base64.b64encode(data).decode()}</data>")
            buf.write("</response>")
        buf.write("</resource>")
    buf.write(f"<endTime>{escape(end_time)}</endTime>")
    buf.write("</resources>")
    with gzip.open(path, "wb") as f:
        f.write(buf.getvalue().encode("utf-8"))


# ------------------------------------------------------------------- reader

def parse_packet_bytes(raw: bytes) -> Iterator[dict]:
    """Stream one packet file's resources. Forward-only like the reference's
    XmlReader: iterparse end-events, elements cleared after use so memory is
    one resource regardless of file size. Tolerates both gzip and plain XML
    (GetDecompressedStream sniffs too)."""
    if raw[:2] == b"\x1f\x8b":
        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    seq = 0
    for _event, elem in ET.iterparse(stream, events=("end",)):
        if elem.tag != "resource":
            continue
        req = elem.findtext("request")
        exc = elem.findtext("exception")
        resp = elem.find("response")
        hdr = resp.findtext("header") if resp is not None else None
        data_b64 = resp.findtext("data") if resp is not None else None
        if exc is None and resp is not None:
            exc = resp.findtext("exception")
        yield {
            "resource_seq": seq,
            "uri": uri_from_request(req),
            "referer": referer_from_request(req),
            "request": req,
            "response_headers": hdr,
            "content_type": content_type_from_headers(hdr),
            "data": (base64.b64decode(data_b64)
                     if data_b64 is not None else None),
            "exception": exc,
        }
        seq += 1
        if seq > MAX_RESOURCES_IN_A_FILE:   # "use this to catch wierd errors"
            raise ValueError("packet exceeds MaxResourcesInAFile")
        elem.clear()


def read_packets(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed packet ingest: ``binaryFile`` scan (one file per task) →
    Arrow-batched parse. Only ``path``/``content`` are read from the source;
    the parse never touches the driver."""
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PACKET_SCHEMA.fields]
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in parse_packet_bytes(bytes(content)):
                    rec["packet_file"] = path
                    rows.append(rec)
                if rows:
                    out = pd.DataFrame(rows, columns=cols)
                    # exact int64 discipline: never a nullable upcast
                    out["resource_seq"] = out["resource_seq"].astype("int64")
                    yield out

    return files.mapInPandas(_parse, schema=PACKET_SCHEMA)
