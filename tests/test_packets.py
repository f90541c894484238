"""WebDataPacket parity reader/writer (S1/S2 parity path).

Extractor cases mirror commonTest/WebPacketDataReaderTest.cs; the round-trip
test writes a reference-shaped gzip-XML packet and reads it back through the
distributed Spark reader.
"""

import os

import pytest

from fetcho_spark.sources import packets as P

# the reference test's request string (WebPacketDataReaderTest.cs:10-12)
TESTSTRING1 = (
    "Uri: https://www.ign.com/articles/2016/05/10/halo-5s-infection-mode-detailed\n"
    "ResponseTime: 00:00:00.3426005\n"
    "Date: 26/02/2019 8:18:46 PM\nUser-Agent: ResearchBot 0.1\n"
    "Referer: https://en.wikipedia.org/wiki/Flood_(Halo)\nHost: www.ign.com\n"
    "Accept-Encoding: gzip, deflate\nConnection: Close\n")


def test_uri_from_request():
    assert P.uri_from_request(TESTSTRING1) == \
        "https://www.ign.com/articles/2016/05/10/halo-5s-infection-mode-detailed"
    assert P.uri_from_request(None) is None
    assert P.uri_from_request("   ") is None
    assert P.uri_from_request("GET /x\nUri: http://a/") is None  # must START
    assert P.uri_from_request("Uri: http://a/ no newline") is None


def test_referer_from_request():
    # GetRefererUriFromRequestStringTest — case-insensitive, anywhere
    assert P.referer_from_request(TESTSTRING1) == \
        "https://en.wikipedia.org/wiki/Flood_(Halo)"
    assert P.referer_from_request("Uri: http://a/\n") is None
    assert P.referer_from_request(None) is None


def test_content_type_from_headers():
    # GetContentTypeFromResponseHeadersTest
    assert P.content_type_from_headers("content-type:") == ""
    assert P.content_type_from_headers("") == ""
    assert P.content_type_from_headers("Content-Type: text/html") == \
        "text/html"
    assert P.content_type_from_headers(
        "server: x\nCONTENT-TYPE: image/png\ndate: y\n") == "image/png"


def test_headers_map_first_wins():
    m = P.headers_map("Content-Type: text/html\nServer: a\nserver: b\n")
    assert m["content-type"] == " text/html"
    assert m["server"] == " a"          # first occurrence wins
    assert P.headers_map(None) == {}


def _fixture_resources():
    return [
        {"request": TESTSTRING1,
         "response_headers": "HTTP/1.1 200 OK\nContent-Type: text/html\n",
         "data": b"<html><body>halo</body></html>"},
        {"request": "Uri: http://b.example/x\nHost: b.example\n",
         "response_headers": "HTTP/1.1 200 OK\nContent-Type: image/png\n",
         "data": bytes(range(256))},
        {"request": "Uri: http://c.example/err\n",
         "exception": "System.Net.WebException: timed out"},
    ]


def test_packet_roundtrip_pure_python(tmp_path):
    p = str(tmp_path / "packet-0.xml.gz")
    P.write_packet(p, _fixture_resources())
    got = list(P.parse_packet_bytes(open(p, "rb").read()))
    assert [g["resource_seq"] for g in got] == [0, 1, 2]
    assert got[0]["uri"].startswith("https://www.ign.com/")
    assert got[0]["referer"] == "https://en.wikipedia.org/wiki/Flood_(Halo)"
    assert got[0]["content_type"] == "text/html"
    assert got[0]["data"] == b"<html><body>halo</body></html>"
    assert got[0]["exception"] is None
    assert got[1]["data"] == bytes(range(256))   # binary-safe via base64
    assert got[2]["exception"].startswith("System.Net.WebException")
    assert got[2]["data"] is None


def test_parse_plain_xml_not_gzip(tmp_path):
    """GetDecompressedStream also accepts uncompressed packets."""
    import gzip
    p = str(tmp_path / "packet.xml.gz")
    P.write_packet(p, _fixture_resources()[:1])
    raw = gzip.open(p, "rb").read()
    got = list(P.parse_packet_bytes(raw))
    assert len(got) == 1 and got[0]["uri"] is not None


@pytest.mark.spark
def test_read_packets_distributed(spark, tmp_path):
    """Multiple packet files → one DataFrame; one task per file; every field
    survives the Arrow crossing (incl. exact bytes)."""
    for i in range(3):
        P.write_packet(str(tmp_path / f"packet-{i}.xml.gz"),
                       _fixture_resources())
    df = P.read_packets(spark, str(tmp_path) + "/*.xml.gz")
    rows = df.orderBy("packet_file", "resource_seq").collect()
    assert len(rows) == 9
    assert {os.path.basename(r["packet_file"]).split("?")[0].rstrip("/")
            .split("/")[-1][:7] for r in rows} == {"packet-"}
    first = [r for r in rows if r["resource_seq"] == 0]
    assert all(r["uri"].startswith("https://www.ign.com/") for r in first)
    assert all(bytes(r["data"]) == b"<html><body>halo</body></html>"
               for r in first)
    exc = [r for r in rows if r["exception"] is not None]
    assert len(exc) == 3 and all(r["data"] is None for r in exc)
    # header map parity through the parsed header text
    assert P.headers_map(first[0]["response_headers"])["content-type"] \
        .strip() == "text/html"
