"""Space-time band join (stages/stjoin.py) vs brute force."""

import numpy as np
import pyarrow as pa

from core_ray.stages.stjoin import contacts_in_partition, replicate_3d, spacetime_pairs


def _brute(ids, uids, lat, lon, us, radius, window_us):
    out = set()
    r2 = radius * radius
    n = len(ids)
    for i in range(n):
        d2 = (lat[i] - lat) ** 2 + (lon[i] - lon) ** 2
        dt = np.abs(us[i] - us)
        hit = (d2 <= r2) & (dt <= window_us) & (ids > ids[i]) & (uids != uids[i])
        for j in np.nonzero(hit)[0]:
            out.add((int(ids[i]), int(ids[j])))
    return out


def _run(ids, uids, lat, lon, us, radius, window_us):
    import ray.data

    t = pa.table(
        {
            "pid": pa.array(ids, pa.int64()),
            "uid": pa.array(uids, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "us": pa.array(us, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = spacetime_pairs(ds, radius, window_us).take_all()
    pairs = {(r["pid_a"], r["pid_b"]) for r in got}
    assert len(pairs) == len(got), "home rule must emit each pair once"
    return pairs, got


def test_dense_random_matches_brute_force(ray_session):
    rng = np.random.default_rng(23)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    uids = rng.integers(0, 20, n)
    lat = rng.uniform(-5, 5, n)
    lon = rng.uniform(-5, 5, n)
    base = 1_700_000_000_000_000
    us = base + rng.integers(0, 3_600_000_000 * 24, n)
    pairs, got = _run(ids, uids, lat, lon, us, radius=1.5, window_us=3_600_000_000)
    assert pairs == _brute(ids, uids, lat, lon, us, 1.5, 3_600_000_000)
    # user ids ride along correctly
    pos = {int(i): k for k, i in enumerate(ids)}
    for r in got[:50]:
        assert r["uid_a"] == uids[pos[r["pid_a"]]]
        assert r["uid_b"] == uids[pos[r["pid_b"]]]


def test_boundary_cases(ray_session):
    # same spot, same user -> excluded; time just inside / outside window
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    uids = np.array([10, 10, 11, 12], dtype=np.int64)
    lat = np.zeros(4)
    lon = np.zeros(4)
    us = np.array([0, 100, 50, 1_000_000_051], dtype=np.int64)
    pairs, _ = _run(ids, uids, lat, lon, us, radius=1.0, window_us=1_000_000_000)
    # (1,2) same user; (3,4) dt exactly 1_000_000_001 > window
    assert pairs == {(1, 3), (2, 3), (2, 4)}
    assert pairs == _brute(ids, uids, lat, lon, us, 1.0, 1_000_000_000)


def test_cross_time_bucket_pairs(ray_session):
    # events in adjacent time buckets but within the window must pair
    ids = np.array([1, 2], dtype=np.int64)
    uids = np.array([1, 2], dtype=np.int64)
    lat = np.array([0.0, 0.1])
    lon = np.array([0.0, 0.1])
    w = 3_600_000_000
    us = np.array([w - 1, w + 1], dtype=np.int64)  # straddle a bucket edge
    pairs, _ = _run(ids, uids, lat, lon, us, radius=1.0, window_us=w)
    assert pairs == {(1, 2)}


def test_chunked_partition_path_is_exact():
    rng = np.random.default_rng(31)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    uids = rng.integers(0, 10, n)
    lat = rng.uniform(0, 0.9, n)
    lon = rng.uniform(0, 0.9, n)
    us = 1_700_000_000_000_000 + rng.integers(0, 10_000_000, n)
    part = replicate_3d(ids, uids, lat, lon, us, 1.0, 3_600_000_000)
    small = contacts_in_partition(part, 1.0, 3_600_000_000, chunk_pairs=500)
    big = contacts_in_partition(part, 1.0, 3_600_000_000)
    k = lambda t: sorted(zip(t["pid_a"].to_pylist(), t["pid_b"].to_pylist()))
    assert k(small) == k(big)
    assert {(a, b) for a, b in k(big)} == _brute(
        ids, uids, lat, lon, us, 1.0, 3_600_000_000
    )


def test_spacetime_all_pairs_matches_brute_force(ray_session):
    """spacetime_all_pairs = contacts minus the user filter: every pair
    within BOTH bands exactly once, same-user pairs included."""
    import ray.data

    from core_ray.stages.stjoin import spacetime_all_pairs

    rng = np.random.default_rng(23)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    lat = rng.uniform(-5, 5, n)
    lon = rng.uniform(-5, 5, n)
    us = rng.integers(0, 3_600_000_000 * 48, n)  # 48 h span
    radius, window = 1.2, 3_600_000_000 * 6  # 1.2 deg, 6 h

    t = pa.table(
        {
            "pid": pa.array(ids, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "us": pa.array(us, pa.int64()),
        }
    )
    got = spacetime_all_pairs(
        ray.data.from_arrow(t).repartition(4), radius, window
    ).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert len(pairs) == len(got), "single emission"

    expect = set()
    r2 = radius * radius
    for i in range(n):
        dla = lat[i] - lat
        dlo = lon[i] - lon
        ok = (dla * dla + dlo * dlo <= r2) & (np.abs(us[i] - us) <= window)
        for j in np.nonzero(ok & (ids > ids[i]))[0]:
            expect.add((int(ids[i]), int(ids[j])))
    assert pairs == expect
