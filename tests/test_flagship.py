"""End-to-end golden test: Ray flagship pipeline vs pure-Python oracle.

Comparison discipline mirrors the reference's snapshot diff
(tests/integration/snapshot.go:216-276): exact counts, exact key sets in both
directions, order-insensitive, plus the byte-identity invariant on extracted
text per url."""

import hashlib

import numpy as np
import pytest

from core_ray.config import PipelineConfig
from core_ray.fixtures.oracle import compute_golden
from core_ray.fixtures.pages import write_corpus
from core_ray.pipelines.flagship import run_flagship

N_PAGES = 1200


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    c = write_corpus(out, N_PAGES, n_page_files=3)
    return out, c


@pytest.fixture(scope="module")
def result_and_golden(ray_session, corpus, tmp_path_factory):
    import glob

    out_dir, c = corpus
    golden = compute_golden(c.pages, c.admin_polygons, c.geoip_ranges)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    res = run_flagship(
        sorted(glob.glob(f"{out_dir}/pages/*.parquet")),
        c.admin_polygons,
        c.geoip_ranges,
        PipelineConfig(),
        checkpoint_dir=ckpt,
    )
    return res, golden, c, ckpt


def _joined_key(r):
    return (r["url"], r["mention_idx"])


def test_joined_matches_golden(result_and_golden):
    res, golden, _, _ = result_and_golden
    got = {
        _joined_key(r): r for r in res.joined.take_all()
    }
    want = {_joined_key(r): r for r in golden.joined}
    assert set(got) == set(want), (
        f"missing={list(set(want) - set(got))[:5]} extra={list(set(got) - set(want))[:5]}"
    )
    for k, w in want.items():
        g = got[k]
        assert g["derivation_source"] == w["derivation_source"], k
        assert g["lat"] == pytest.approx(w["lat"], abs=0), k
        assert g["lon"] == pytest.approx(w["lon"], abs=0), k
        assert int(g["hex_cell"]) == w["hex_cell"], k
        assert int(g["s2_cell"]) == w["s2_cell"], k
        assert g["admin_id"] == w["admin_id"], (k, g["admin_id"], w["admin_id"])
        assert g["admin_level"] == w["admin_level"], k


def test_text_byte_identity(result_and_golden):
    # engine-extracted text must be byte-identical to the fixture's expected
    # text for EVERY url, all the way through the joined checkpoint
    res, golden, _, _ = result_and_golden
    seen = {}
    for r in res.joined.select_columns(["url", "text"]).take_all():
        seen[r["url"]] = hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
    for url, h in seen.items():
        assert golden.text_hashes[url] == h, url


def test_errors_side_channel(result_and_golden):
    res, golden, _, _ = result_and_golden
    got = {r["url"] for r in res.errors.take_all()}
    want = {e["url"] for e in golden.errors}
    assert got == want


def test_stats_match(result_and_golden):
    res, golden, _, _ = result_and_golden
    assert res.stats["rows_geocoded"] == golden.stats["rows_geocoded"]
    assert res.stats["rows_no_signal"] == golden.stats["rows_no_signal"]
    assert res.stats["pages_deduped"] == golden.stats["pages_deduped"]
    assert res.stats["derivation_source_hist"] == golden.stats["derivation_source_hist"]


def test_knn_matches_golden(result_and_golden):
    res, golden, _, _ = result_and_golden
    got = {
        (r["url"], r["mention_idx"], r["rank"]): (
            r["neighbor_url"], r["neighbor_mention_idx"], r["dist"],
        )
        for r in res.knn.take_all()
    }
    want = {
        (r["url"], r["mention_idx"], r["rank"]): (
            r["neighbor_url"], r["neighbor_mention_idx"], r["dist"],
        )
        for r in golden.knn
    }
    assert set(got) == set(want)
    for k, (wu, wm, wd) in want.items():
        gu, gm, gd = got[k]
        assert (gu, gm) == (wu, wm), k
        assert gd == pytest.approx(wd, rel=1e-12), k


def test_tiles_match_golden(result_and_golden):
    res, golden, _, _ = result_and_golden
    got = {
        (r["tile_z"], r["tile_x"], r["tile_y"]): (r["page_count"], r["mention_count"])
        for r in res.tiles.take_all()
    }
    assert got == golden.tiles


def test_resume_skips_completed_shards(result_and_golden, corpus):
    """Second run over the same checkpoint dir must reuse every stage."""
    import glob
    import json
    import os

    res, golden, c, ckpt = result_and_golden
    out_dir, _ = corpus
    manifests = sorted(glob.glob(f"{ckpt}/**/manifest.json", recursive=True))
    assert manifests, "no lineage manifests written"
    before = {m: os.stat(m).st_mtime_ns for m in manifests}
    res2 = run_flagship(
        sorted(glob.glob(f"{out_dir}/pages/*.parquet")),
        c.admin_polygons,
        c.geoip_ranges,
        PipelineConfig(),
        checkpoint_dir=ckpt,
    )
    after = {m: os.stat(m).st_mtime_ns for m in manifests}
    assert before == after, "resume recomputed a completed stage"
    assert res2.stats == res.stats
    for m in manifests:
        with open(m) as f:
            j = json.load(f)
        assert j["rows"] >= 0 and "files" in j and "wall_s" in j


def test_oversize_error_rows(ray_session, tmp_path_factory):
    """Pages over max_html_bytes surface as (phase='extract',
    reason='max-html-bytes') error rows — never silently dropped — and are
    excluded from joined; stats count them (the MaxFileSize analog)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from core_ray.fixtures.pages import generate_pages

    c = generate_pages(120)
    big_url = "https://oversized.example.com/p/big"
    big_html = b"<html><body>" + b"<p>big</p>" * 4000 + b"</body></html>"
    extra = pa.table(
        {
            "url": pa.array([big_url], pa.string()),
            "warc_ts": pa.array([c.pages["warc_ts"][0].as_py()], pa.timestamp("us")),
            "html": pa.array([big_html], pa.binary()),
            "text": pa.array(["big"], pa.large_string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    pages = pa.concat_tables([c.pages, extra])
    out = str(tmp_path_factory.mktemp("corpus_oversize"))
    os.makedirs(f"{out}/pages")
    pq.write_table(pages, f"{out}/pages/part-0000.parquet")

    cap = 20_000  # fixture pages are ~1-2 KB; the big page is ~40 KB
    cfg = PipelineConfig(max_html_bytes=cap)
    res = run_flagship(
        sorted(glob.glob(f"{out}/pages/*.parquet")),
        c.admin_polygons,
        c.geoip_ranges,
        cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_oversize")),
    )
    golden = compute_golden(pages, c.admin_polygons, c.geoip_ranges, max_html_bytes=cap)

    errs = {(r["url"], r["phase"], r["reason"]) for r in res.errors.take_all()}
    want = {(e["url"], e["phase"], e["reason"]) for e in golden.errors}
    assert (big_url, "extract", "max-html-bytes") in errs
    assert errs == want
    assert res.stats["pages_oversize"] == golden.stats["pages_oversize"] == 1
    assert res.stats["rows_no_signal"] == golden.stats["rows_no_signal"]
    assert res.stats["pages_deduped"] == golden.stats["pages_deduped"]
    joined_urls = {r["url"] for r in res.joined.select_columns(["url"]).take_all()}
    assert big_url not in joined_urls


def test_config_change_invalidates_checkpoint(ray_session, corpus, tmp_path_factory):
    """Resuming in an existing checkpoint dir with a CHANGED config must
    recompute the affected stages, not return stale results (ADVICE round 1:
    config is part of lineage)."""
    import glob

    out_dir, c = corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt_cfgchange"))
    files = sorted(glob.glob(f"{out_dir}/pages/*.parquet"))
    res1 = run_flagship(
        files, c.admin_polygons, c.geoip_ranges,
        PipelineConfig(tile_zooms=(7, 12)), checkpoint_dir=ckpt,
    )
    assert {r["tile_z"] for r in res1.tiles.take_all()} == {7, 12}
    res2 = run_flagship(
        files, c.admin_polygons, c.geoip_ranges,
        PipelineConfig(tile_zooms=(5, 7, 12)), checkpoint_dir=ckpt,
    )
    assert {r["tile_z"] for r in res2.tiles.take_all()} == {5, 7, 12}


def test_hot_cell_salting_equivalence(ray_session, corpus, tmp_path_factory):
    """Force salting (threshold below the top-city cell count) — results must
    be identical to the unsalted run (exactness of the salt/replicate plan)."""
    import glob

    out_dir, c = corpus
    cfg = PipelineConfig(hot_cell_threshold=10, salt_group_target=10)
    res = run_flagship(
        sorted(glob.glob(f"{out_dir}/pages/*.parquet")),
        c.admin_polygons,
        c.geoip_ranges,
        cfg,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_salted")),
    )
    golden = compute_golden(c.pages, c.admin_polygons, c.geoip_ranges)
    got = {
        (r["url"], r["mention_idx"], r["rank"]): (r["neighbor_url"], r["neighbor_mention_idx"])
        for r in res.knn.take_all()
    }
    want = {
        (r["url"], r["mention_idx"], r["rank"]): (r["neighbor_url"], r["neighbor_mention_idx"])
        for r in golden.knn
    }
    assert got == want
