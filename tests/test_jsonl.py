"""JSONL connector units: dialect key mapping, gzip, html-vs-text records,
timestamp parsing, loud failure on malformed shards, and the connector's
core contract — text records roundtrip BYTE-IDENTICALLY through the
flagship extract stage (the same inverse-extract normalization the WET
connector owns)."""

import gzip
import json

import pyarrow.parquet as pq
import pytest


def _lines(recs) -> bytes:
    return ("\n".join(json.dumps(r) for r in recs) + "\n").encode("utf-8")


def test_jsonl_ingest_extract_roundtrip(ray_session, tmp_path):
    from core_ray.sources import open_source
    from core_ray.stages.extract import ExtractText

    recs_a = [
        {"url": "https://a.example.com/1", "ts": "2024-05-01T12:30:00",
         "text": "First line & second <tag> line\nparagraph two", "lang": "de"},
        {"id": "doc-42", "timestamp": 1700000000,
         "content": "plain text only"},
    ]
    recs_b = [
        {"url": "https://b.example.com/3", "date": "2023-01-02",
         "html": "<p>pre-rendered</p>", "language": "fr"},
        {"url": "https://b.example.com/4", "text": "gzipped body"},
    ]
    (tmp_path / "a.jsonl").write_bytes(_lines(recs_a))
    (tmp_path / "b.jsonl.gz").write_bytes(gzip.compress(_lines(recs_b)))
    (tmp_path / "ignored.txt").write_text("not jsonl")
    out = tmp_path / "pages"
    with open_source("jsonl", str(tmp_path), out_dir=str(out)) as src:
        assert src.n_pages == 4
        assert src.describe()["type"] == "jsonl"
        t = pq.read_table(src.pages()[0])
        assert set(t.column_names) == {"url", "warc_ts", "html", "lang"}
        rows = {
            u: (ts, h, lg)
            for u, ts, h, lg in zip(
                t["url"].to_pylist(), t["warc_ts"].to_pylist(),
                t["html"].to_pylist(), t["lang"].to_pylist(),
            )
        }
        # dialect mapping: id fallback url, epoch ts, content text key
        assert "doc-42" in rows
        assert rows["doc-42"][0].year == 2023  # epoch 1700000000
        assert rows["https://a.example.com/1"][2] == "de"
        assert rows["https://b.example.com/3"][2] == "fr"
        assert rows["https://b.example.com/3"][1] == b"<p>pre-rendered</p>"
        assert rows["https://a.example.com/1"][0].isoformat().startswith(
            "2024-05-01T12:30:00"
        )
        # the core contract: extract reproduces the text byte-identically
        got = ExtractText()(t)
        texts = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
        assert texts["https://a.example.com/1"] == (
            "First line & second <tag> line\nparagraph two"
        )
        assert texts["doc-42"] == "plain text only"
        assert texts["https://b.example.com/4"] == "gzipped body"


def test_jsonl_explicit_keys_and_missing_url(ray_session, tmp_path):
    from core_ray.sources.jsonl import ingest_jsonl

    recs = [{"u": "https://x/1", "body": "hello"}, {"body": "anon record"}]
    (tmp_path / "c.ndjson").write_bytes(_lines(recs))
    out = tmp_path / "pages"
    n = ingest_jsonl(
        str(tmp_path), str(out), url_key="u", text_key="body"
    )
    assert n == 2
    t = pq.read_table(sorted(out.glob("*.parquet"))[0])
    urls = set(t["url"].to_pylist())
    assert "https://x/1" in urls
    assert "jsonl:c.ndjson:2" in urls  # deterministic synthesized url


def test_jsonl_malformed_line_fails_loud(ray_session, tmp_path):
    from core_ray.sources.jsonl import ingest_jsonl

    (tmp_path / "bad.jsonl").write_bytes(b'{"text": "ok"}\nnot json at all\n')
    with pytest.raises(Exception):
        ingest_jsonl(str(tmp_path), str(tmp_path / "pages"))


def test_jsonl_record_without_text_or_html_fails_loud(ray_session, tmp_path):
    from core_ray.sources.jsonl import ingest_jsonl

    (tmp_path / "b.jsonl").write_bytes(_lines([{"url": "https://x/1"}]))
    with pytest.raises(Exception):
        ingest_jsonl(str(tmp_path), str(tmp_path / "pages"))


def test_jsonl_empty_dir_returns_zero(ray_session, tmp_path):
    from core_ray.sources.jsonl import ingest_jsonl

    assert ingest_jsonl(str(tmp_path), str(tmp_path / "pages")) == 0
