"""Watermark late-data triage (events_late_data) vs a sequential oracle.

The distributed two-pass prefix (per-bucket maxima -> driver exclusive
prefix -> per-partition cummax with carry) must equal the sequential
single-scan watermark on ADVERSARIAL arrival orders — the fixture events
are nearly sorted, so this synthesizes heavy disorder to stress the
cross-bucket carry path.
"""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp, n, seed):
    rng = np.random.default_rng(seed)
    eid = np.arange(n, dtype=np.int64)
    base = np.int64(1_750_000_000_000_000)  # epoch us, 2025-ish
    ts = base + rng.integers(0, 3_600_000_000 * 48, n)  # 48h, fully shuffled
    t = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(rng.uniform(0, 10, n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return eid, ts


def _seq_oracle(eid, ts, l_us=900_000_000):
    order = np.argsort(eid)
    eid, ts = eid[order], ts[order]
    ets = ts - ((eid * 104729) % 3600) * 1_000_000
    wm = np.maximum.accumulate(ets)
    late = wm - ets
    cls = np.where(late == 0, 0, np.where(late <= l_us, 1, 2))
    hour = ets // 3_600_000_000
    out = {}
    for h, c in zip(hour, cls):
        row = out.setdefault(int(h), [0, 0, 0])
        row[c] += 1
    return out


@pytest.mark.parametrize("seed,n", [(5, 4000), (6, 30000)])
def test_late_data_matches_sequential_scan(ray_session, seed, n):
    import ray

    from core_ray.queries import events_late_data

    with tempfile.TemporaryDirectory() as tmp:
        eid, ts = _write_events(tmp, n, seed)
        got_t = pa.concat_tables(
            [t for t in ray.get(events_late_data(tmp).to_arrow_refs()) if t.num_rows]
        )
        got = {
            int(np.datetime64(w, "us").astype(np.int64) // 3_600_000_000): [o, l, d]
            for w, o, l, d in zip(
                got_t["window_start"].to_pylist(),
                got_t["n_on_time"].to_pylist(),
                got_t["n_late"].to_pylist(),
                got_t["n_dropped"].to_pylist(),
            )
        }
        want = _seq_oracle(eid, ts)
        assert got == want
        # adversarial disorder must exercise every class
        agg = np.array(list(want.values())).sum(0)
        assert (agg > 0).all()


def test_max_by_u64(ray_session):
    import ray.data

    from core_ray.stages.agg import max_by_u64

    rng = np.random.default_rng(9)
    k = rng.integers(0, 200, 50_000).astype(np.uint64)
    v = rng.integers(0, 1 << 62, 50_000).astype(np.uint64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k, pa.uint64()), "v": pa.array(v, pa.uint64())})
    ).repartition(8)
    got = {
        r["k"]: r["v"] for r in max_by_u64(ds, "k", "v").take_all()
    }
    want = {}
    for kk, vv in zip(k.tolist(), v.tolist()):
        want[kk] = max(want.get(kk, 0), vv)
    assert got == want
