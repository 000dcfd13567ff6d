"""CDX(J) index connector (sources/cdx.py): parse, SURT, ingest, and the
gap-coalesced fetch planner."""

import gzip
import json
import os

import numpy as np

from core_ray.sources.cdx import fetch_plan, ingest_cdx, parse_cdxj, read_cdx, to_surt


def _line(urlkey, ts, **j):
    return f"{urlkey} {ts} {json.dumps(j)}".encode()


def _mk_cdx(tmp_path, name, lines, gz=True):
    blob = b"\n".join(lines) + b"\n"
    p = os.path.join(tmp_path, name)
    with open(p, "wb") as f:
        f.write(gzip.compress(blob) if gz else blob)
    return p


def test_surt_normalization():
    assert to_surt("https://www.Example.com/a/b?q=1") == "com,example)/a/b?q=1"
    assert to_surt("http://sub.host.org:80/") == "org,host,sub)/"
    assert to_surt("example.net") == "net,example)/"


def test_parse_cdxj_tolerant():
    lines = [
        _line("com,example)/a", "20240102030405", url="http://example.com/a",
              mime="text/html", status=200, digest="D1", length=100,
              offset=0, filename="s1.warc.gz"),
        b"",  # blank
        b"garbage line without json",
        _line("com,example)/b", "20240102030406", url="http://example.com/b",
              mime="text/html", status=404, digest="D2", length=50,
              offset=100, filename="s1.warc.gz"),
    ]
    recs = parse_cdxj(gzip.compress(b"\n".join(lines)))
    assert [r["urlkey"] for r in recs] == ["com,example)/a", "com,example)/b"]
    assert recs[0]["offset"] == 0 and recs[1]["status"] == 404


def test_ingest_and_fetch_plan(ray_session, tmp_path):
    tmp = str(tmp_path)
    # shard s1: three 200/text ranges — two adjacent (coalesce), one far;
    # plus a 404 and an image (both filtered out). shard s2: one range.
    lines = [
        _line("a)/1", "20240101000000", url="u1", mime="text/html",
              status=200, digest="A", length=100, offset=0,
              filename="s1.warc.gz"),
        _line("a)/2", "20240101000001", url="u2", mime="text/plain",
              status=200, digest="B", length=80, offset=120,
              filename="s1.warc.gz"),  # gap 20 < coalesce -> same group
        _line("a)/3", "20240101000002", url="u3", mime="text/html",
              status=200, digest="C", length=10, offset=1 << 22,
              filename="s1.warc.gz"),  # far -> own group
        _line("a)/4", "20240101000003", url="u4", mime="text/html",
              status=404, digest="D", length=10, offset=300,
              filename="s1.warc.gz"),  # filtered: status
        _line("a)/5", "20240101000004", url="u5", mime="image/png",
              status=200, digest="E", length=10, offset=400,
              filename="s1.warc.gz"),  # filtered: mime
        _line("b)/1", "20240101000005", url="u6", mime="text/html",
              status=200, digest="F", length=7, offset=5,
              filename="s2.warc.gz"),
    ]
    _mk_cdx(tmp, "cdx-00000.gz", lines)

    out = os.path.join(tmp, "idx")
    n = ingest_cdx(tmp, out, overwrite=True)
    assert n == 6

    idx = read_cdx(tmp)
    plan = sorted(
        fetch_plan(idx, coalesce_gap=64).take_all(),
        key=lambda r: (r["filename"], r["start"]),
    )
    assert [(r["filename"], r["start"], r["end"], r["n_records"])
            for r in plan] == [
        ("s1.warc.gz", 0, 200, 2),          # 0-100 + 120-200 coalesced
        ("s1.warc.gz", 1 << 22, (1 << 22) + 10, 1),
        ("s2.warc.gz", 5, 12, 1),
    ]
    # total planned bytes >= sum of selected record lengths (gap overhead only)
    planned = sum(r["end"] - r["start"] for r in plan)
    assert planned == 100 + 80 + 20 + 10 + 7  # includes the one 20-byte gap


def test_read_cdx_empty_dir(ray_session, tmp_path):
    ds = read_cdx(str(tmp_path))
    assert ds.count() == 0
