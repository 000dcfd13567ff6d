"""WARC source (sources/warc.py): ISO 28500 record parsing + distributed
ingest into the pages schema, plain and gzip, registered as --source warc."""

from __future__ import annotations

import gzip

import pyarrow.parquet as pq

from core_ray.sources.warc import parse_warc


def _record(wtype: str, uri: str, date: str, body: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode()
    return head + b"\r\n" + body + b"\r\n\r\n"


def _warc_bytes() -> bytes:
    http1 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>page one</html>"
    http2 = b"HTTP/1.1 200 OK\r\n\r\n<html>page two</html>"
    return (
        _record("warcinfo", "", "2025-03-01T00:00:00Z", b"software: test\r\n")
        + _record("request", "https://a.example.com/1", "2025-03-01T10:00:00Z",
                  b"GET /1 HTTP/1.1\r\n\r\n")
        + _record("response", "https://a.example.com/1", "2025-03-01T10:00:00Z", http1)
        + _record("response", "https://b.example.com/2", "2025-03-02T11:30:00Z", http2)
    )


def test_parse_warc_responses_only_headers_stripped():
    recs = parse_warc(_warc_bytes())
    assert [(u, t) for u, t, _ in recs] == [
        ("https://a.example.com/1", "2025-03-01T10:00:00Z"),
        ("https://b.example.com/2", "2025-03-02T11:30:00Z"),
    ]
    assert recs[0][2] == b"<html>page one</html>"
    assert recs[1][2] == b"<html>page two</html>"


def test_parse_warc_gzip_and_garbage_tolerance():
    gz = gzip.compress(_warc_bytes())
    assert len(parse_warc(gz)) == 2
    # truncated tail: the complete prefix records still parse
    blob = _warc_bytes() + b"WARC/1.0\r\nWARC-Type: response\r\nConten"
    assert len(parse_warc(blob)) == 2
    assert parse_warc(b"") == []


def test_warc_source_ingest_end_to_end(ray_session, tmp_path):
    from core_ray.sources import open_source

    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_warc_bytes()))
    out = tmp_path / "pages"
    with open_source("warc", str(tmp_path), out_dir=str(out)) as src:
        assert src.n_pages == 4  # 2 responses per file
        files = src.pages()
        assert files
        t = pq.read_table(files[0])
        assert set(t.column_names) == {"url", "warc_ts", "html", "lang"}
        urls = sorted(t["url"].to_pylist())
        assert urls == sorted(
            ["https://a.example.com/1", "https://b.example.com/2"] * 2
        )
        htmls = set(t["html"].to_pylist())
        assert htmls == {b"<html>page one</html>", b"<html>page two</html>"}
        ts = sorted(str(x) for x in t["warc_ts"].to_pylist())
        assert ts[0].startswith("2025-03-01 10:00:00")


def test_parse_warc_negative_content_length_terminates():
    # corrupt length must not cycle the cursor backwards (infinite loop)
    blob = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/1\r\n"
        b"WARC-Date: 2025-03-01T00:00:00Z\r\nContent-Length: -54\r\n\r\nbody"
    )
    assert parse_warc(blob) == []


def test_warc_ingest_tolerates_offset_and_bad_dates(ray_session, tmp_path):
    from core_ray.sources.warc import ingest_warc

    http = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
    blob = _record("response", "https://x/1", "2025-03-01T10:00:00+00:00", http) + _record(
        "response", "https://x/2", "not-a-date", http
    )
    (tmp_path / "c.warc").write_bytes(blob)
    out = tmp_path / "pages"
    n = ingest_warc(str(tmp_path), str(out))
    assert n == 2  # neither record fails the ingest
    t = pq.read_table(sorted(out.glob("*.parquet"))[0])
    ts = sorted(str(x) for x in t["warc_ts"].to_pylist())
    assert ts[0].startswith("1970-01-01")      # fallback for the bad date
    assert ts[1].startswith("2025-03-01 10")   # offset form parsed


def _wet_bytes() -> bytes:
    txt1 = "First line & second <tag> line\nparagraph two".encode()
    txt2 = "plain text only".encode()
    return (
        _record("warcinfo", "", "2025-03-01T00:00:00Z", b"format: WET\r\n")
        + _record("conversion", "https://a.example.com/1",
                  "2025-03-01T10:00:00Z", txt1)
        + _record("conversion", "https://b.example.com/2",
                  "2025-03-02T11:30:00Z", txt2)
        + _record("response", "https://c.example.com/3",
                  "2025-03-02T11:30:00Z", b"HTTP/1.1 200 OK\r\n\r\nhtml")
    )


def test_parse_wet_conversion_records_only():
    from core_ray.sources.warc import parse_wet

    recs = parse_wet(_wet_bytes())
    assert [(u, t) for u, t, _ in recs] == [
        ("https://a.example.com/1", "2025-03-01T10:00:00Z"),
        ("https://b.example.com/2", "2025-03-02T11:30:00Z"),
    ]
    # payload is raw text, NOT HTTP-stripped, and response records are skipped
    assert recs[0][2] == "First line & second <tag> line\nparagraph two".encode()
    assert parse_warc(_wet_bytes())[0][2] == b"html"  # warc view still works


def test_wet_ingest_extract_roundtrip(ray_session, tmp_path):
    """The WET inverse-extract normalization must roundtrip byte-identically
    through the flagship extract stage (the connector's core contract)."""
    import gzip as _gzip

    from core_ray.sources import open_source
    from core_ray.stages.extract import ExtractText

    (tmp_path / "a.wet").write_bytes(_wet_bytes())
    (tmp_path / "b.wet.gz").write_bytes(_gzip.compress(_wet_bytes()))
    out = tmp_path / "pages"
    with open_source("wet", str(tmp_path), out_dir=str(out)) as src:
        assert src.n_pages == 4  # 2 conversion records per file
        t = pq.read_table(src.pages()[0])
        assert set(t.column_names) == {"url", "warc_ts", "html", "lang"}
        got = ExtractText()(t)
        texts = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
        assert texts["https://a.example.com/1"] == (
            "First line & second <tag> line\nparagraph two"
        )
        assert texts["https://b.example.com/2"] == "plain text only"
