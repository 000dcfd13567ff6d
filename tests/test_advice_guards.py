"""ADVICE r4 regression guards: empty-corpus ccf/acf, zero-variance NULL,
std-ellipse centered moments, and WARC/WET path-suffix pruning."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import core_ray.queries as Q


def _write_events(d, us, types=None, uids=None):
    n = len(us)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "user_id": pa.array(
                    uids if uids is not None else np.zeros(n, np.int64), pa.int64()
                ),
                "ts": pa.array(np.asarray(us, np.int64), pa.timestamp("us")),
                "event_type": pa.array(
                    types if types is not None else ["view"] * n, pa.string()
                ),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def test_ccf_empty_when_no_click_purchase(ray_session, tmp_path):
    # a corpus with zero 'click'/'purchase' events used to crash on
    # hour.min() of an empty array
    _write_events(str(tmp_path), [10**12 + i * 10**6 for i in range(50)])
    out = Q.events_type_ccf(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["lag_h", "n_pairs", "r_num", "ccf"]


def test_acf_empty_events(ray_session, tmp_path):
    _write_events(str(tmp_path), [])
    out = Q.events_hourly_acf(str(tmp_path))
    assert out.num_rows == 0


def test_ccf_null_when_one_series_constant(ray_session, tmp_path):
    # clicks spread over hours, ONE purchase-free... rather: purchases
    # present but constant per hour -> zero variance -> ccf must be NULL,
    # mirroring the SQL NULLIF convention
    hours = 6
    us, types = [], []
    for h in range(hours):
        base = 10**12 + h * 3_600_000_000
        for k in range(h + 1):  # clicks vary by hour
            us.append(base + k * 1000)
            types.append("click")
        us.append(base + 999)  # exactly one purchase every hour: constant
        types.append("purchase")
    _write_events(str(tmp_path), us, types)
    out = Q.events_type_ccf(str(tmp_path))
    assert out.num_rows > 0
    lag0 = {r["lag_h"]: r for r in out.to_pylist()}[0]
    assert lag0["ccf"] is None  # zero purchase variance
    assert lag0["r_num"] == 0


def test_std_ellipse_centered_moments_match_uncentered_identity(ray_session, tmp_path):
    ids = np.arange(123, dtype=np.int64) * 17 + 3
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = Q.geo_std_ellipse(str(tmp_path)).to_pylist()[0]
    x = (ids * 104729) % 360000
    y = (ids * 7919) % 140000
    n = len(ids)
    # shift-invariance: centered-frame numerators equal the raw-frame ones
    assert out["var_x_num"] == n * int((x * x).sum()) - int(x.sum()) ** 2
    assert out["var_y_num"] == n * int((y * y).sum()) - int(y.sum()) ** 2
    assert out["cov_num"] == n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    assert out["cx_milli"] == float(np.float64(int(x.sum())) / np.float64(n))


def _tiny_warc(url: str) -> bytes:
    payload = b"HTTP/1.1 200 OK\r\n\r\n<html><p>hi</p></html>"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )
    return rec


def _tiny_wet(url: str) -> bytes:
    text = b"hello wet world"
    return (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(text)}\r\n\r\n".encode()
        + text
        + b"\r\n\r\n"
    )


def test_wet_ingest_skips_warc_siblings(ray_session, tmp_path):
    from core_ray.sources.warc import ingest_warc, ingest_wet

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(gzip.compress(_tiny_warc("https://w/1")))
    (src / "b.warc.wet.gz").write_bytes(gzip.compress(_tiny_wet("https://t/1")))
    (src / "c.wet").write_bytes(_tiny_wet("https://t/2"))

    n_wet = ingest_wet(str(src), str(tmp_path / "wet_out"))
    assert n_wet == 2  # b + c only; the plain .warc.gz is never read
    wet_urls = set()
    for f in os.listdir(tmp_path / "wet_out"):
        if f.endswith(".parquet"):
            wet_urls |= set(
                pq.read_table(tmp_path / "wet_out" / f)["url"].to_pylist()
            )
    assert wet_urls == {"https://t/1", "https://t/2"}

    n_warc = ingest_warc(str(src), str(tmp_path / "warc_out"))
    assert n_warc == 1  # the .wet files are never read as WARC
    assert ingest_warc(str(src / "c.wet"), str(tmp_path / "none")) == 0
