"""General interval join (stages/interval.py): broadcast vs bucketed
equivalence over random overlapping intervals, plus edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from core_ray.stages.interval import interval_join_broadcast, interval_join_bucketed


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)


def _norm(t: pa.Table):
    if t.num_columns == 0:
        return []
    cols = sorted(t.column_names)
    return sorted(zip(*[t[c].to_pylist() for c in cols]))


def _fixtures(seed=21, n_points=8000, n_iv=60):
    rng = np.random.default_rng(seed)
    pts = pa.table(
        {
            "t": pa.array(rng.integers(0, 100_000, n_points), pa.int64()),
            "v": pa.array(rng.integers(0, 10**6, n_points), pa.int64()),
        }
    )
    lo = rng.integers(-5_000, 95_000, n_iv)
    ln = rng.integers(1, 20_000, n_iv)  # mixed lengths incl. multi-bucket
    iv = pa.table(
        {
            "interval_id": pa.array(np.arange(n_iv), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + ln, pa.int64()),
        }
    )
    return pts, iv


def test_broadcast_equals_bucketed(ray_session):
    import ray

    pts, iv = _fixtures()
    a = _collect(interval_join_broadcast(ray.data.from_arrow(pts), iv, "t"))
    b = _collect(interval_join_bucketed(ray.data.from_arrow(pts), iv, "t"))
    assert a.num_rows > 0
    assert _norm(a) == _norm(b)


def test_bucket_width_insensitivity(ray_session):
    import ray

    pts, iv = _fixtures(seed=22)
    ref = _norm(_collect(interval_join_broadcast(ray.data.from_arrow(pts), iv, "t")))
    for w in (500, 5_000, 50_000):
        got = _norm(
            _collect(interval_join_bucketed(ray.data.from_arrow(pts), iv, "t", bucket_width=w))
        )
        assert got == ref


def test_half_open_semantics_and_empty(ray_session):
    import ray

    pts = pa.table({"t": pa.array([10, 19, 20], pa.int64())})
    iv = pa.table(
        {
            "interval_id": pa.array([0, 1], pa.int64()),
            "lo": pa.array([10, 30], pa.int64()),
            "hi": pa.array([20, 30], pa.int64()),  # [10,20); zero-length [30,30)
        }
    )
    for fn in (interval_join_broadcast, interval_join_bucketed):
        out = _collect(fn(ray.data.from_arrow(pts), iv, "t"))
        assert sorted(zip(out["t"].to_pylist(), out["interval_id"].to_pylist())) == [
            (10, 0), (19, 0),
        ]
