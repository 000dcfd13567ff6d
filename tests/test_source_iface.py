"""Pluggable Source interface (sources/base.py) + stage-skip config toggles
(PipelineConfig.stages) — VERDICT r2 items 7 and 8."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pytest

ADMIN = pa.table(
    {
        "admin_id": pa.array(["W0"], pa.string()),
        "level": pa.array([0], pa.int8()),
        "parent_id": pa.array([None], pa.string()),
        "wkt": pa.array(
            ["POLYGON ((-180 -85, 180 -85, 180 85, -180 85, -180 -85))"], pa.string()
        ),
    }
)
GEOIP = pa.table(
    {
        "host": pa.array(["mem.example.com"], pa.string()),
        "lat": pa.array([10.0], pa.float64()),
        "lon": pa.array([20.0], pa.float64()),
    }
)


def _mem_pages_table(n=40):
    import numpy as np

    urls = [f"https://mem.example.com/p/{i}" for i in range(n)]
    htmls = [
        f"<html><body><p>page {i} at {10 + i * 0.011:.3f}, {20 + i * 0.013:.3f}</p></body></html>".encode()
        for i in range(n)
    ]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.full(n, np.datetime64("2025-01-01T00:00:00", "us"))
            ),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def test_open_source_parquet_and_unknown(tmp_path):
    import pyarrow.parquet as pq

    from core_ray.sources import open_source

    pq.write_table(_mem_pages_table(5), str(tmp_path / "p0.parquet"))
    src = open_source("parquet", str(tmp_path))
    assert src.pages() == [str(tmp_path / "p0.parquet")]
    assert src.describe()["n_files"] == 1
    with pytest.raises(KeyError, match="unknown source"):
        open_source("nope")


def test_custom_registered_source_feeds_flagship(ray_session, tmp_path):
    """The reference's Source-plugin test shape (pkg/source/source.go:15-35):
    a user-registered in-memory source drops into the flagship by name."""
    import pyarrow.parquet as pq

    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship
    from core_ray.sources import Source, open_source, register_source

    @register_source("mem-test")
    class MemSource(Source):
        def __init__(self, out_root: str):
            self.out = os.path.join(out_root, "mem_pages")
            os.makedirs(self.out, exist_ok=True)
            pq.write_table(_mem_pages_table(), os.path.join(self.out, "part0.parquet"))

        def pages(self):
            return sorted(glob.glob(os.path.join(self.out, "*.parquet")))

        def describe(self):
            return {"type": "mem-test", "n_files": len(self.pages())}

    with open_source("mem-test", str(tmp_path)) as src:
        res = run_flagship(
            src.pages(), ADMIN, GEOIP, PipelineConfig(),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        assert res.stats["rows_geocoded"] == 40
        assert res.stats["derivation_source_hist"] == {"text-mention": 40}


def test_stage_skip_s2_drops_column_and_invalidates_phase_a(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship

    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    pq.write_table(_mem_pages_table(), os.path.join(pages, "p0.parquet"))
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    ckpt = str(tmp_path / "ckpt")

    res_full = run_flagship(files, ADMIN, GEOIP, PipelineConfig(), checkpoint_dir=ckpt)
    full_cols = set(res_full.joined.take(1)[0].keys())
    assert {"s2_cell", "admin_id"} <= full_cols

    manifest = os.path.join(ckpt, "phaseA", "shard-0", "manifest.json")
    fp_full = json.load(open(manifest))["fingerprint"]

    cfg = PipelineConfig(stages=("pip", "knn", "tiles"))  # skip s2-encode
    res_nos2 = run_flagship(files, ADMIN, GEOIP, cfg, checkpoint_dir=ckpt)
    cols = set(res_nos2.joined.take(1)[0].keys())
    assert "s2_cell" not in cols and "admin_id" in cols
    assert json.load(open(manifest))["fingerprint"] != fp_full  # recomputed


def test_stage_skip_tiles_keeps_other_checkpoints(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship

    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    pq.write_table(_mem_pages_table(), os.path.join(pages, "p0.parquet"))
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    ckpt = str(tmp_path / "ckpt")

    run_flagship(files, ADMIN, GEOIP, PipelineConfig(), checkpoint_dir=ckpt)
    manifest = os.path.join(ckpt, "phaseA", "shard-0", "manifest.json")
    written_full = json.load(open(manifest))["written_at"], os.path.getmtime(manifest)

    cfg = PipelineConfig(stages=("s2-encode", "pip", "knn"))  # skip tiles only
    res = run_flagship(files, ADMIN, GEOIP, cfg, checkpoint_dir=ckpt)
    assert res.tiles.count() == 0  # skipped -> empty
    assert res.knn.count() > 0  # still computed (from checkpoint)
    # phase A untouched: skipping tiles invalidates ONLY dependent checkpoints
    assert (json.load(open(manifest))["written_at"], os.path.getmtime(manifest)) == written_full


def test_skip_pip_drops_admin_columns(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship

    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    pq.write_table(_mem_pages_table(), os.path.join(pages, "p0.parquet"))
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    cfg = PipelineConfig(stages=("s2-encode", "knn", "tiles"))  # skip pip
    res = run_flagship(files, ADMIN, GEOIP, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    cols = set(res.joined.take(1)[0].keys())
    assert "admin_id" not in cols and "s2_cell" in cols
