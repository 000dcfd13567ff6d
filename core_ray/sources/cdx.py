"""Common Crawl CDX(J) index connector — the third leg of the CC trio
(WARC = raw capture, WET = extracted text, CDX = the URL index that makes
RANDOM ACCESS into the other two possible without scanning them).

Format (public "cdx-NNNNN.gz" layout): one record per line,

    <urlkey (SURT)> <timestamp YYYYMMDDhhmmss> <JSON payload>

where the JSON carries url / mime / status / digest / length / offset /
filename — (filename, offset, length) is a byte range into a *.warc.gz
shard (each record is its own gzip member, so ranged reads decompress
standalone).

Scale design: the CDX FILE is the parallel unit (same grain as
sources/warc.py); parsing is line-splitting + json, vectorized into Arrow
per batch. The fetch PLANNER is where the index earns its keep at 100 TB:
selecting 0.1 % of a crawl via the index costs 0.1 % of the bytes, but only
if the ranged reads are grouped per shard and ADJACENT ranges coalesce into
one request — ``fetch_plan`` emits per-shard, offset-sorted, gap-coalesced
range groups for exactly that access pattern. Reference analog: the Source
discovery/candidate-filter stage (SURVEY.md S3) applied to a remote corpus
instead of a local tree.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa

_GZ_MAGIC = b"\x1f\x8b"


def to_surt(url: str) -> str:
    """Canonical SURT key (Sort-friendly URI Reordering Transform), the
    public convention CDX files sort by: lowercase host with labels
    reversed and comma-joined, then ')' + path. Scheme, port 80/443 and a
    leading 'www.' are dropped (the standard normalization subset)."""
    u = url.strip()
    for scheme in ("https://", "http://"):
        if u.lower().startswith(scheme):
            u = u[len(scheme):]
            break
    host, sep, rest = u.partition("/")
    host = host.lower().split("@")[-1]  # userinfo never keys the index
    if host.endswith(":80") or host.endswith(":443"):
        host = host.rsplit(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    path = "/" + rest if sep else "/"
    return ",".join(reversed(host.split("."))) + ")" + path


def parse_cdxj(blob: bytes) -> list[dict]:
    """Parse one CDX(J) file's bytes -> [{urlkey, ts, url, mime, status,
    digest, length, offset, filename}]. Gzip-aware; tolerant of blank and
    malformed lines (skipped — a truncated index tail must not fail the
    shard)."""
    if blob[:2] == _GZ_MAGIC:
        import gzip

        blob = gzip.decompress(blob)
    out: list[dict] = []
    for line in blob.split(b"\n"):
        line = line.strip()
        if not line:
            continue
        try:
            head, payload = line.split(b" {", 1)
            j = json.loads(b"{" + payload)
            urlkey, ts = head.decode("utf-8").rsplit(" ", 1)
            out.append(
                {
                    "urlkey": urlkey,
                    "ts": ts,
                    "url": j.get("url", ""),
                    "mime": j.get("mime", ""),
                    "status": int(j.get("status", 0)),
                    "digest": j.get("digest", ""),
                    "length": int(j.get("length", 0)),
                    "offset": int(j.get("offset", 0)),
                    "filename": j.get("filename", ""),
                }
            )
        except (ValueError, KeyError):
            continue
    return out


def _index_table(records: list[dict]) -> pa.Table:
    def ts_us(ts: str) -> np.datetime64:
        # 14-digit YYYYMMDDhhmmss -> ISO; epoch fallback mirrors warc.py
        if len(ts) == 14 and ts.isdigit():
            iso = (f"{ts[0:4]}-{ts[4:6]}-{ts[6:8]}T"
                   f"{ts[8:10]}:{ts[10:12]}:{ts[12:14]}")
            try:
                return np.datetime64(iso, "us")
            except ValueError:
                pass
        return np.datetime64("1970-01-01", "us")

    return pa.table(
        {
            "urlkey": pa.array([r["urlkey"] for r in records], pa.string()),
            "ts": pa.array([ts_us(r["ts"]) for r in records],
                           pa.timestamp("us")),
            "url": pa.array([r["url"] for r in records], pa.string()),
            "mime": pa.array([r["mime"] for r in records], pa.string()),
            "status": pa.array([r["status"] for r in records], pa.int32()),
            "digest": pa.array([r["digest"] for r in records], pa.string()),
            "length": pa.array([r["length"] for r in records], pa.int64()),
            "offset": pa.array([r["offset"] for r in records], pa.int64()),
            "filename": pa.array([r["filename"] for r in records],
                                 pa.string()),
        }
    )


def read_cdx(src: str):
    """Every *.cdx / *.cdx.gz / cdx-*.gz under ``src`` -> Ray Dataset of
    index rows (one parse task per file — the published shard grain)."""
    import ray.data

    paths = sorted(
        p
        for p in _glob.glob(os.path.join(src, "**", "*"), recursive=True)
        if os.path.isfile(p)
        and (p.endswith((".cdx", ".cdx.gz"))
             or (os.path.basename(p).startswith("cdx-") and p.endswith(".gz")))
    )
    if not paths:
        import ray.data

        return ray.data.from_arrow(_index_table([]))
    ds = ray.data.read_binary_files(paths)

    def to_rows(batch: pa.Table) -> pa.Table:
        recs: list[dict] = []
        for blob in batch["bytes"].to_pylist():
            recs.extend(parse_cdxj(blob))
        return _index_table(recs)

    return ds.map_batches(to_rows, batch_format="pyarrow", batch_size=4)


def ingest_cdx(src: str, out_dir: str, overwrite: bool = False) -> int:
    """Materialize the parsed index as parquet (the queryable form: url
    selection, dedup by digest, re-crawl planning all run on this table,
    never on the raw text lines). Returns row count."""
    from core_ray.sources.ingest import prep_out_dir

    prep_out_dir(out_dir, overwrite)
    ds = read_cdx(src)
    ds = ds.materialize()
    ds.write_parquet(out_dir)
    return ds.count()


def fetch_plan(index_ds, status: int = 200, mime_prefix: str = "text/",
               coalesce_gap: int = 1 << 16):
    """Index Dataset -> Dataset[(filename, start, end, n_records)] of
    gap-coalesced ranged-read groups per WARC shard: the access plan that
    turns an index selection into the MINIMUM number of ranged requests.
    One hash shuffle by shard filename; per-shard offsets sort in-task and
    ranges closer than ``coalesce_gap`` bytes merge (reading a small gap
    is cheaper than a second round-trip — the S3-style ranged-GET
    trade)."""
    import pyarrow.compute as pc

    from core_ray.stages.agg import hash_strings, map_groups_partitioned

    def select(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b["status"], pa.scalar(status, pa.int32())),
            pc.starts_with(b["mime"], mime_prefix),
        )
        t = b.filter(keep).select(["filename", "offset", "length"])
        return t.append_column(
            "__shard", pa.array(hash_strings(t["filename"]), pa.uint64())
        )

    sel = index_ds.map_batches(select, batch_format="pyarrow",
                               batch_size=65536)

    empty = pa.table(
        {
            "filename": pa.array([], pa.string()),
            "start": pa.array([], pa.int64()),
            "end": pa.array([], pa.int64()),
            "n_records": pa.array([], pa.int64()),
        }
    )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        fn = np.asarray(g["filename"].to_pylist())
        off = g["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = g["length"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((off, fn))
        fn, off, ln = fn[order], off[order], ln[order]
        end = off + ln
        # a new group starts at a shard change or a gap > coalesce_gap
        run_end = np.maximum.accumulate(end)
        new = np.ones(len(fn), dtype=bool)
        new[1:] = (fn[1:] != fn[:-1]) | (
            off[1:] - run_end[:-1] > coalesce_gap
        )
        gid = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(fn))).astype(np.int64)
        gend = np.maximum.reduceat(end, starts)
        return pa.table(
            {
                "filename": pa.array(fn[starts], pa.string()),
                "start": pa.array(off[starts], pa.int64()),
                "end": pa.array(gend, pa.int64()),
                "n_records": pa.array(counts, pa.int64()),
            }
        )

    return map_groups_partitioned(sel, "__shard", per_shard)
