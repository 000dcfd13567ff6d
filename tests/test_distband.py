"""Distance-band spatial self-join (stages/distband.py) vs brute force.

The driver oracle (geo_distance_pairs) checks the operator on the sparse
derived-coordinate lattice; these tests hammer it on DENSE random point sets
where cross-cell pairs, shared-cell pairs and boundary cases all occur."""

import numpy as np
import pyarrow as pa
import pytest

from core_ray.stages.distband import distance_pairs, pairs_in_partition, replicate_to_cells


def _brute(ids, lat, lon, radius):
    out = set()
    r2 = radius * radius
    for i in range(len(ids)):
        dla = lat[i] - lat
        dlo = lon[i] - lon
        sq = dla * dla + dlo * dlo
        for j in np.nonzero((sq <= r2) & (ids > ids[i]))[0]:
            out.add((int(ids[i]), int(ids[j])))
    return out


def _run(ids, lat, lon, radius):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = distance_pairs(ds, radius).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert len(pairs) == len(got), "no duplicate pairs"
    return pairs, got


def test_dense_random_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)  # ids uncorrelated with position
    lat = rng.uniform(-10, 10, n)
    lon = rng.uniform(-10, 10, n)
    radius = 1.5
    pairs, got = _run(ids, lat, lon, radius)
    assert pairs == _brute(ids, lat, lon, radius)
    # distances are the canonical smaller-id-first subtraction
    by_pair = {(r["doc_a"], r["doc_b"]): r["sq_dist"] for r in got}
    pos = {int(i): k for k, i in enumerate(ids)}
    for (a, b), sq in list(by_pair.items())[:50]:
        ia, ib = pos[a], pos[b]
        expect = (lat[ia] - lat[ib]) * (lat[ia] - lat[ib]) + (lon[ia] - lon[ib]) * (
            lon[ia] - lon[ib]
        )
        assert sq == expect


def test_cross_cell_boundary_pairs(ray_session):
    # points straddling a cell boundary at x=0 must still pair up
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    lat = np.array([-0.01, 0.01, 4.99, 5.01])
    lon = np.array([0.0, 0.0, 0.0, 0.0])
    pairs, _ = _run(ids, lat, lon, radius=5.0)
    assert pairs == _brute(ids, lat, lon, 5.0)
    assert (1, 2) in pairs and (3, 4) in pairs


def test_dense_cell_chunking_is_exact():
    # one cell far denser than the chunk bound: chunked path == one-shot path
    rng = np.random.default_rng(11)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    lat = rng.uniform(0.0, 0.9, n)
    lon = rng.uniform(0.0, 0.9, n)
    part = replicate_to_cells(ids, lat, lon, radius=1.0)
    small = pairs_in_partition(part, 1.0, chunk_pairs=500)
    big = pairs_in_partition(part, 1.0)
    k = lambda t: sorted(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    assert k(small) == k(big)
    assert {(a, b) for a, b in k(big)} == _brute(ids, lat, lon, 1.0)


def test_empty_and_singleton(ray_session):
    pairs, _ = _run(np.array([42], dtype=np.int64), np.array([0.0]), np.array([0.0]), 1.0)
    assert pairs == set()
