"""Tests: ingestion connector + flagship compatibility; CLI smoke via module."""

import glob
import os

import pytest


@pytest.fixture()
def html_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.html").write_text(
        "<html><head><title>a</title></head><body><p>hello at 12.3456, -78.9012 now</p></body></html>"
    )
    (d / "sub").mkdir()
    (d / "sub" / "b.html").write_text(
        "<html><body><p>plain page no coords</p><p>second para</p></body></html>"
    )
    (d / "ignore.txt").write_text("not html")
    return str(d)


def test_ingest_then_flagship(ray_session, html_dir, tmp_path):
    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship
    from core_ray.sources.ingest import ingest_html_dir

    out = str(tmp_path / "pages")
    n = ingest_html_dir(html_dir, out)
    assert n == 2

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{out}/*.parquet"))
    t = pq.read_table(files[0])
    assert set(t.column_names) == {"url", "warc_ts", "html", "lang"}

    # ingested pages run through the full flagship pipeline
    admin = pa.table(
        {
            "admin_id": pa.array(["W0"], pa.string()),
            "level": pa.array([0], pa.int8()),
            "parent_id": pa.array([None], pa.string()),
            "wkt": pa.array(["POLYGON ((-180 -85, 180 -85, 180 85, -180 85, -180 -85))"], pa.string()),
        }
    )
    geoip = pa.table(
        {
            "host": pa.array(["ingested.example.com"], pa.string()),
            "lat": pa.array([10.0], pa.float64()),
            "lon": pa.array([20.0], pa.float64()),
        }
    )
    res = run_flagship(files, admin, geoip, PipelineConfig(), checkpoint_dir=str(tmp_path / "ckpt"))
    rows = res.joined.take_all()
    by_url = {r["url"]: r for r in rows}
    a = by_url[f"https://ingested.example.com/a.html"]
    assert a["derivation_source"] == "text-mention"
    assert a["lat"] == pytest.approx(12.3456)
    assert a["admin_id"] == "W0"
    b = by_url[f"https://ingested.example.com/sub/b.html"]
    assert b["derivation_source"] == "host-geoip"
    assert b["text"] == "plain page no coords\nsecond para"


def test_cli_parser():
    # argument surface only (full run owns its own ray session — covered by
    # the verify skill's drive, not pytest which holds the session)
    from core_ray.run import main

    with pytest.raises(SystemExit):
        main(["--pages"])  # missing required args
