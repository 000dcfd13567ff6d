"""Minimal WARC (ISO 28500 / WARC 1.x) ingest — the container format Common
Crawl actually ships. Reference analog: a Source connector that converts a
raw corpus into the canonical pages parquet once (sources/base.py contract,
pkg/source/source.go:15-35 shape).

Scale design: the WARC FILE is the parallel unit (ray.data.read_binary_files
fans one task per file — Common Crawl shards corpora into ~1 GB warc.gz
files, so file-level parallelism is the published layout's natural grain;
record-level splitting would need the gzip member offsets from the
cdx/cluster indexes and is noted as the finer-grained path). Only
``response`` records are ingested: ``url`` from WARC-Target-URI, ``warc_ts``
from WARC-Date, ``html`` = the HTTP payload with the response-header block
stripped. Gzip members are detected by magic and decompressed in-task.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa

from core_ray.sources.base import Source, register_source

_GZ_MAGIC = b"\x1f\x8b"


def parse_warc(blob: bytes) -> list[tuple[str, str, bytes]]:
    """Parse one WARC file's bytes -> [(url, iso_ts, payload)] for every
    ``response`` record (HTTP headers stripped). Tolerant of trailing
    garbage / truncated tails (stops at the first malformed header
    block)."""
    return _parse_records(blob, want_type="response", strip_http=True)


def parse_wet(blob: bytes) -> list[tuple[str, str, bytes]]:
    """Parse one WET file's bytes -> [(url, iso_ts, text_payload)] for
    every ``conversion`` record — the Common Crawl *extracted-text*
    sibling of the WARC response layout (same ISO 28500 container, the
    payload is already plain UTF-8 text with no HTTP header block)."""
    return _parse_records(blob, want_type="conversion", strip_http=False)


def _parse_records(
    blob: bytes, want_type: str, strip_http: bool
) -> list[tuple[str, str, bytes]]:
    if blob[:2] == _GZ_MAGIC:
        import gzip

        blob = gzip.decompress(blob)  # multi-member streams concatenate
    out: list[tuple[str, str, bytes]] = []
    i, n = 0, len(blob)
    while i < n:
        if blob.startswith(b"\r\n", i):  # inter-record CRLF CRLF separator
            i += 2
            continue
        head_end = blob.find(b"\r\n\r\n", i)
        if head_end < 0:
            break
        lines = blob[i:head_end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            break
        if clen < 0:  # corrupt length would move the cursor backwards
            break
        body = blob[head_end + 4 : head_end + 4 + clen]
        i = head_end + 4 + clen
        if fields.get("warc-type") == want_type:
            payload = body
            if strip_http and payload[:5] == b"HTTP/":  # strip HTTP headers
                he = payload.find(b"\r\n\r\n")
                if he >= 0:
                    payload = payload[he + 4 :]
            out.append(
                (
                    fields.get("warc-target-uri", ""),
                    fields.get("warc-date", ""),
                    payload,
                )
            )
    return out


def _paths_with_suffix(src: str, suffixes: tuple[str, ...]) -> list[str]:
    """Expand ``src`` (file or directory) to files whose NAMES end in one of
    ``suffixes`` — path-level pruning so mismatched sibling archives are
    never downloaded or decompressed (ADVICE r4: a *.warc.gz co-located
    with WET files was gunzipped on every run just to be discarded
    record-by-record; worse, a WARC carrying conversion records would be
    silently ingested as WET pages)."""
    if os.path.isfile(src):
        return [src] if src.endswith(suffixes) else []
    out = []
    for root, _, files in os.walk(src):
        for f in files:
            if f.endswith(suffixes):
                out.append(os.path.join(root, f))
    return sorted(out)


def ingest_warc(
    src: str,
    out_dir: str,
    default_lang: str = "en",
    overwrite: bool = False,
) -> int:
    """Read every *.warc / *.warc.gz under ``src`` into pages-schema parquet
    at ``out_dir`` (url, warc_ts, html, lang — the same shape
    ingest_html_dir emits; text derives downstream in the extract stage).
    Returns the number of pages written. Ray must be running. Path-suffix
    pruned: *.wet / *.wet.gz siblings are never read."""
    import ray.data

    from core_ray.sources.ingest import prep_out_dir, write_pages_parquet

    prep_out_dir(out_dir, overwrite)
    paths = [
        p for p in _paths_with_suffix(src, (".warc", ".warc.gz"))
        if not p.endswith((".wet", ".wet.gz"))  # *.warc.wet.gz is WET
    ]
    if not paths:
        return 0
    ds = ray.data.read_binary_files(paths)

    def _parse_date(ts: str) -> np.datetime64:
        # WARC-Date is ISO 8601 UTC; datetime64 wants a naive string. Be as
        # tolerant as the record parser: strip 'Z' or a zero offset, fall
        # back to epoch on anything unparseable rather than failing the file
        s = ts.rstrip("Z")
        for cand in (s, s.replace("+00:00", ""), "1970-01-01"):
            try:
                return np.datetime64(cand or "1970-01-01", "us")
            except ValueError:
                continue
        return np.datetime64("1970-01-01", "us")

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"].to_pylist():
            for url, ts, payload in parse_warc(blob):
                urls.append(url)
                tss.append(_parse_date(ts))
                payloads.append(payload)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "lang": pa.array([default_lang] * len(urls), pa.string()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow", batch_size=16)
    return write_pages_parquet(pages, out_dir)


def ingest_wet(
    src: str,
    out_dir: str,
    default_lang: str = "en",
    overwrite: bool = False,
) -> int:
    """Read every *.wet / *.wet.gz (or *.warc.wet.gz — matched by the gz/wet
    extensions) under ``src`` into pages-schema parquet. WET payloads are
    ALREADY-extracted text, so the connector normalizes them through the
    exact INVERSE of the extract spec (stages/extract.py: text =
    "\\n".join(unescape(p) for <p> bodies)): each text line becomes one
    html-escaped ``<p>`` block. The flagship's extract stage then
    reproduces the WET text BYTE-IDENTICALLY (roundtrip unit in
    tests/test_warc.py), which keeps one canonical page shape — and one
    lineage/byte-identity contract — across both container formats.
    File-level parallelism, same as ingest_warc; path-suffix pruned so
    plain *.warc.gz siblings are never read (ADVICE r4)."""
    import html as _html

    import ray.data

    from core_ray.sources.ingest import prep_out_dir, write_pages_parquet

    prep_out_dir(out_dir, overwrite)
    paths = _paths_with_suffix(src, (".wet", ".wet.gz"))
    if not paths:
        return 0
    ds = ray.data.read_binary_files(paths)

    def _parse_date(ts: str) -> np.datetime64:
        s = ts.rstrip("Z")
        for cand in (s, s.replace("+00:00", ""), "1970-01-01"):
            try:
                return np.datetime64(cand or "1970-01-01", "us")
            except ValueError:
                continue
        return np.datetime64("1970-01-01", "us")

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"].to_pylist():
            for url, ts, text in parse_wet(blob):
                urls.append(url)
                tss.append(_parse_date(ts))
                payloads.append(
                    "".join(
                        f"<p>{_html.escape(line)}</p>"
                        for line in text.decode("utf-8", "replace").split("\n")
                    ).encode("utf-8")
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "lang": pa.array([default_lang] * len(urls), pa.string()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow", batch_size=16)
    return write_pages_parquet(pages, out_dir)


@register_source("wet")
class WetSource(Source):
    """Common Crawl WET (extracted-text) connector: conversion records ->
    canonical pages parquet via the inverse-extract normalization."""

    def __init__(self, src: str, out_dir: str | None = None, **ingest_kwargs):
        import tempfile

        self._own_tmp = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="core_ray_src_wet_")
        self.src = src
        self.n_pages = ingest_wet(src, self.out_dir, overwrite=True, **ingest_kwargs)

    def pages(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.out_dir, "*.parquet")))

    def describe(self) -> dict:
        return {"type": "wet", "src": self.src, "out_dir": self.out_dir,
                "n_pages": self.n_pages}

    def close(self) -> None:
        if self._own_tmp:
            import shutil

            shutil.rmtree(self.out_dir, ignore_errors=True)


@register_source("warc")
class WarcSource(Source):
    """Common-Crawl-style WARC connector: one-time distributed ingest into
    pages parquet, then the standard parquet read path."""

    def __init__(self, src: str, out_dir: str | None = None, **ingest_kwargs):
        import tempfile

        self._own_tmp = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="core_ray_src_warc_")
        self.src = src
        self.n_pages = ingest_warc(src, self.out_dir, overwrite=True, **ingest_kwargs)

    def pages(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.out_dir, "*.parquet")))

    def describe(self) -> dict:
        return {"type": "warc", "src": self.src, "out_dir": self.out_dir,
                "n_pages": self.n_pages}

    def close(self) -> None:
        if self._own_tmp:
            import shutil

            shutil.rmtree(self.out_dir, ignore_errors=True)
