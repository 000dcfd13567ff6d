"""JSONL corpus connector: newline-delimited JSON -> pages-schema parquet.

JSONL (one JSON object per line, optionally gzipped) is the interchange
format LLM training corpora actually ship in (Dolma, HF datasets dumps,
RedPajama shards), so the engine ingests it natively beside WARC/WET
(sources/warc.py) and the html-dir connector (sources/ingest.py). Records
carry TEXT (already extracted) or raw HTML; text-only records normalize
through the exact INVERSE of the extract spec — the same
one-line-per-``<p>`` html-escape the WET connector uses — so the flagship
extract stage reproduces the JSONL text BYTE-IDENTICALLY (roundtrip unit
in tests/test_jsonl.py) and every downstream pipeline sees one canonical
page shape regardless of container format.

Key mapping is configurable (``url_key``/``ts_key``/``text_key``/
``html_key``/``lang_key``) with permissive defaults covering the common
dialects (url|id, ts|timestamp|date, text|content|raw_content). Scale
shape: file-level parallelism via ray.data.read_binary_files (one task per
file group, same as ingest_warc); gzip + line parsing happen inside the
task; a malformed line fails LOUD (corrupt corpus shards should stop the
run, not silently shrink it).
"""

from __future__ import annotations

import glob as _glob
import html as _html
import os
from typing import Any

import numpy as np
import pyarrow as pa

from core_ray.sources.base import Source, register_source
from core_ray.sources.warc import _paths_with_suffix

_URL_KEYS = ("url", "uri", "id")
_TS_KEYS = ("ts", "timestamp", "date", "warc_ts")
_TEXT_KEYS = ("text", "content", "raw_content")
_LANG_KEYS = ("lang", "language")


def _parse_ts(v: Any) -> np.datetime64:
    """ISO-8601 string or epoch seconds -> timestamp[us]; epoch 0 fallback."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return np.datetime64(int(v * 1_000_000), "us")
    if isinstance(v, str):
        s = v.rstrip("Z").replace("+00:00", "")
        try:
            return np.datetime64(s, "us")
        except ValueError:
            pass
    return np.datetime64("1970-01-01", "us")


def _pick(rec: dict, explicit: str | None, candidates: tuple[str, ...]):
    if explicit is not None:
        return rec.get(explicit)
    for k in candidates:
        if k in rec:
            return rec[k]
    return None


def text_to_html(text: str) -> bytes:
    """The inverse-extract normalization shared with the WET connector:
    each text line becomes one html-escaped ``<p>`` block, so
    stages/extract.py reproduces the text byte-identically."""
    return "".join(
        f"<p>{_html.escape(line)}</p>" for line in text.split("\n")
    ).encode("utf-8")


def ingest_jsonl(
    src: str,
    out_dir: str,
    default_lang: str = "en",
    overwrite: bool = False,
    url_key: str | None = None,
    ts_key: str | None = None,
    text_key: str | None = None,
    html_key: str = "html",
    lang_key: str | None = None,
) -> int:
    """Read every *.jsonl / *.ndjson (plain or .gz) under ``src`` into
    pages-schema parquet at ``out_dir`` (url, warc_ts, html, lang — the
    ingest_html_dir shape; text derives downstream in the extract stage).
    Returns the number of pages written. Ray must be running."""
    import gzip as _gzip
    import json as _json

    import ray.data

    from core_ray.sources.ingest import prep_out_dir, write_pages_parquet

    prep_out_dir(out_dir, overwrite)
    paths = _paths_with_suffix(
        src, (".jsonl", ".jsonl.gz", ".ndjson", ".ndjson.gz")
    )
    if not paths:
        return 0
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, tss, payloads, langs = [], [], [], []
        for path, blob in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            # sniff the gzip magic rather than trusting the extension:
            # ray.data.read_binary_files auto-decompresses *.gz on read
            if blob[:2] == b"\x1f\x8b":
                blob = _gzip.decompress(blob)
            base = os.path.basename(path)
            for i, line in enumerate(blob.decode("utf-8").splitlines()):
                if not line.strip():
                    continue
                rec = _json.loads(line)  # malformed line -> loud failure
                if not isinstance(rec, dict):
                    raise ValueError(
                        f"{base}:{i + 1}: JSONL record is not an object"
                    )
                url = _pick(rec, url_key, _URL_KEYS)
                urls.append(
                    str(url) if url is not None else f"jsonl:{base}:{i + 1}"
                )
                tss.append(_parse_ts(_pick(rec, ts_key, _TS_KEYS)))
                raw_html = rec.get(html_key)
                if raw_html is not None:
                    payloads.append(str(raw_html).encode("utf-8"))
                else:
                    text = _pick(rec, text_key, _TEXT_KEYS)
                    if text is None:
                        raise ValueError(
                            f"{base}:{i + 1}: record has neither "
                            f"{html_key!r} nor a text field"
                        )
                    payloads.append(text_to_html(str(text)))
                lang = _pick(rec, lang_key, _LANG_KEYS)
                langs.append(str(lang) if lang is not None else default_lang)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow", batch_size=16)
    return write_pages_parquet(pages, out_dir)


@register_source("jsonl")
class JsonlSource(Source):
    """Newline-delimited-JSON connector: Dolma/HF-style text or html
    records -> canonical pages parquet (inverse-extract normalization for
    text-only records, same contract as the WET connector)."""

    def __init__(self, src: str, out_dir: str | None = None, **ingest_kwargs):
        import tempfile

        self._own_tmp = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="core_ray_src_jsonl_")
        self.src = src
        self.n_pages = ingest_jsonl(
            src, self.out_dir, overwrite=True, **ingest_kwargs
        )

    def pages(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.out_dir, "*.parquet")))

    def describe(self) -> dict:
        return {
            "type": "jsonl",
            "src": self.src,
            "out_dir": self.out_dir,
            "n_pages": self.n_pages,
        }

    def close(self) -> None:
        if self._own_tmp:
            import shutil

            shutil.rmtree(self.out_dir, ignore_errors=True)
