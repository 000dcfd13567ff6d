"""Doublestar include/exclude patterns (VERDICT r3 item 7): spec-example
matching, source-listing filters, and flagship wiring + lineage."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from core_ray.sources.patterns import expand_braces, filter_paths, match_doublestar


def test_doublestar_spec_examples():
    # published doublestar/gitignore semantics
    assert match_doublestar("*.parquet", "a.parquet")
    assert not match_doublestar("*.parquet", "sub/a.parquet")  # * stays in-segment
    assert match_doublestar("**/*.parquet", "sub/deep/a.parquet")
    assert match_doublestar("**/*.parquet", "a.parquet")  # ** matches zero segs
    assert match_doublestar("a/**", "a")
    assert match_doublestar("a/**", "a/b/c")
    assert not match_doublestar("a/**", "b/a")
    assert match_doublestar("a/**/b", "a/b")
    assert match_doublestar("a/**/b", "a/x/y/b")
    assert match_doublestar("a?c", "abc")
    assert not match_doublestar("a?c", "a/c")
    assert match_doublestar("[ab]x", "ax") and not match_doublestar("[ab]x", "cx")
    assert match_doublestar("{a,b}/*.txt", "b/z.txt")
    assert match_doublestar("x{1,{2,3}}.go", "x3.go")
    assert not match_doublestar("{a,b}/*.txt", "c/z.txt")


def test_expand_braces():
    assert expand_braces("no-braces") == ["no-braces"]
    assert sorted(expand_braces("{a,b}c")) == ["ac", "bc"]
    assert sorted(expand_braces("x{1,{2,3}}")) == ["x1", "x2", "x3"]


def test_filter_paths_include_exclude(tmp_path):
    files = [str(tmp_path / n) for n in
             ["pages-000.parquet", "pages-001.parquet", "sub/pages-002.parquet"]]
    assert filter_paths(files) == files
    assert filter_paths(files, include=("pages-00*.parquet",)) == files[:2]
    assert filter_paths(files, include=("**/*.parquet",)) == files
    assert filter_paths(files, exclude=("**/pages-001*",)) == [files[0], files[2]]
    assert filter_paths(files, include=("**/*.parquet",),
                        exclude=("sub/**",)) == files[:2]


def _write(path, urls):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"u": pa.array(urls, pa.string())}), path)


def test_source_listing_patterns(tmp_path):
    from core_ray.sources.base import open_source

    _write(str(tmp_path / "a.parquet"), ["1"])
    _write(str(tmp_path / "b.parquet"), ["2"])
    _write(str(tmp_path / "nested/c.parquet"), ["3"])
    # default: flat top-level listing (outputs/checkpoints nested under the
    # source dir must never become inputs)
    src = open_source("parquet", str(tmp_path))
    assert [os.path.relpath(f, tmp_path) for f in src.pages()] == [
        "a.parquet", "b.parquet"]
    # patterns opt into the recursive walk, scoped by the patterns
    src = open_source("parquet", str(tmp_path), include_patterns=("**/*.parquet",))
    assert [os.path.relpath(f, tmp_path) for f in src.pages()] == [
        "a.parquet", "b.parquet", "nested/c.parquet"]
    src = open_source("parquet", str(tmp_path), include_patterns=("**/*.parquet",),
                      exclude_patterns=("nested/**",))
    assert [os.path.basename(f) for f in src.pages()] == ["a.parquet", "b.parquet"]
    src = open_source("parquet", str(tmp_path), include_patterns=("{a,c}*.parquet",))
    assert [os.path.basename(f) for f in src.pages()] == ["a.parquet"]


def test_flagship_exclude_pattern(ray_session, tmp_path):
    """Excluded file's rows are absent from every output; the phase-A
    fingerprint changes with the pattern, so resume recomputes phase A."""
    import ray

    from core_ray.config import PipelineConfig
    from core_ray.fixtures.pages import write_corpus
    from core_ray.pipelines.flagship import _PHASE_A_CFG, run_flagship
    from core_ray.state.lineage import fingerprint_config

    d = str(tmp_path / "corpus")
    c = write_corpus(d, 240, n_page_files=3)
    files = sorted(glob.glob(f"{d}/pages/*.parquet"))
    # the fixture plants duplicate pages ACROSS files (dedup coverage); a
    # url also present in a kept file legitimately survives, so assert on
    # urls exclusive to the excluded file
    excluded_urls = set(pq.read_table(files[0], columns=["url"])["url"].to_pylist())
    for f in files[1:]:
        excluded_urls -= set(pq.read_table(f, columns=["url"])["url"].to_pylist())

    cfg_all = PipelineConfig()
    cfg_ex = PipelineConfig(exclude_patterns=(os.path.basename(files[0]),))
    assert fingerprint_config(cfg_all, _PHASE_A_CFG) != fingerprint_config(
        cfg_ex, _PHASE_A_CFG)

    ckpt = str(tmp_path / "ckpt")
    res = run_flagship(files, c.admin_polygons, c.geoip_ranges, cfg_ex,
                       checkpoint_dir=ckpt)
    assert res.stats["shards_done"] == "2/2"
    joined_urls = set()
    for t in ray.get(res.joined.to_arrow_refs()):
        joined_urls |= set(t["url"].to_pylist())
    assert joined_urls and not (joined_urls & excluded_urls)


# ---------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st

_seg = st.text(alphabet="abcxyz019._-", min_size=1, max_size=6)
_path = st.lists(_seg, min_size=1, max_size=5).map("/".join)


@settings(max_examples=200, deadline=None)
@given(_path)
def test_prop_literal_matches_only_itself(p):
    assert match_doublestar(p, p)
    assert not match_doublestar(p, p + "x")
    assert not match_doublestar(p, "q/" + p)


@settings(max_examples=200, deadline=None)
@given(_path, _path)
def test_prop_doublestar_prefix_matches_any_ancestry(prefix, p):
    # **/<p> matches <p> at any depth, including depth zero
    assert match_doublestar("**/" + p, p)
    assert match_doublestar("**/" + p, prefix + "/" + p)
    # <p>/** matches everything under <p> and <p> itself
    assert match_doublestar(p + "/**", p)
    assert match_doublestar(p + "/**", p + "/" + prefix)


@settings(max_examples=200, deadline=None)
@given(_seg, _seg)
def test_prop_single_segment_agrees_with_fnmatch(seg, other):
    import fnmatch

    for pat in (seg, seg[:2] + "*", "?" + seg[1:], "[" + seg[0] + "]" + seg[1:]):
        assert match_doublestar(pat, other) == fnmatch.fnmatchcase(other, pat)


@settings(max_examples=200, deadline=None)
@given(_seg, _seg, _path)
def test_prop_brace_is_disjunction(a, b, p):
    lhs = match_doublestar("{%s,%s}" % (a, b), p)
    assert lhs == (match_doublestar(a, p) or match_doublestar(b, p))
