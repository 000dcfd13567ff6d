"""Segment-intersection join (stages/segjoin.py) vs brute force.

The driver oracle (geo_segment_crossings) checks the derived-segment set;
these tests hammer dense random segments where multi-cell bboxes,
cross-cell crossings and the canonical-cell dedup all matter."""

import numpy as np
import pyarrow as pa

from core_ray.stages.segjoin import (
    crossings_in_partition,
    replicate_segments,
    segment_crossings,
)


def _orient(ax, ay, bx, by, px, py):
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _brute(ids, ax, ay, bx, by):
    out = set()
    n = len(ids)
    for i in range(n):
        o1 = _orient(ax[i], ay[i], bx[i], by[i], ax, ay)
        o2 = _orient(ax[i], ay[i], bx[i], by[i], bx, by)
        o3 = _orient(ax, ay, bx, by, ax[i], ay[i])
        o4 = _orient(ax, ay, bx, by, bx[i], by[i])
        hit = (o1 * o2 < 0) & (o3 * o4 < 0) & (ids > ids[i])
        for j in np.nonzero(hit)[0]:
            out.add((int(ids[i]), int(ids[j])))
    return out


def _run(ids, ax, ay, bx, by, cell):
    import ray.data

    t = pa.table(
        {
            "seg_id": pa.array(ids, pa.int64()),
            "ax": pa.array(ax, pa.float64()),
            "ay": pa.array(ay, pa.float64()),
            "bx": pa.array(bx, pa.float64()),
            "by": pa.array(by, pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = segment_crossings(ds, cell).take_all()
    pairs = {(r["seg_a"], r["seg_b"]) for r in got}
    assert len(pairs) == len(got), "canonical-cell rule must emit each pair once"
    return pairs


def _random_segs(rng, n, span=20.0, ext=3.0):
    ax = rng.uniform(-span, span, n)
    ay = rng.uniform(-span, span, n)
    bx = ax + rng.uniform(-ext, ext, n)
    by = ay + rng.uniform(-ext, ext, n)
    return ax, ay, bx, by


def test_dense_random_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    ax, ay, bx, by = _random_segs(rng, n)
    # segments (ext 3) far larger than the cell (1): many-cell replication
    assert _run(ids, ax, ay, bx, by, cell=1.0) == _brute(ids, ax, ay, bx, by)
    # cell far larger than segments: most pairs share one cell
    assert _run(ids, ax, ay, bx, by, cell=50.0) == _brute(ids, ax, ay, bx, by)


def test_crossing_at_cell_boundary(ray_session):
    # an X centered exactly on the (0,0) cell corner
    ids = np.array([1, 2], dtype=np.int64)
    ax = np.array([-0.5, -0.5])
    ay = np.array([-0.5, 0.5])
    bx = np.array([0.5, 0.5])
    by = np.array([0.5, -0.5])
    assert _run(ids, ax, ay, bx, by, cell=1.0) == {(1, 2)}


def test_touching_and_collinear_excluded(ray_session):
    # T-touch (endpoint on interior) and collinear overlap: NOT proper
    ids = np.array([1, 2, 3], dtype=np.int64)
    ax = np.array([0.0, 0.0, 1.5])
    ay = np.array([0.0, 1.0, 0.5])
    bx = np.array([2.0, 1.0, 3.0])
    by = np.array([0.0, 0.0, 0.5])  # seg2 ends ON seg1; seg3 parallel, clear of seg2
    pairs = _run(ids, ax, ay, bx, by, cell=1.0)
    assert pairs == _brute(ids, ax, ay, bx, by) == set()


def test_replication_covers_bbox():
    ids = np.array([7], dtype=np.int64)
    t = replicate_segments(
        ids, np.array([0.2]), np.array([0.3]), np.array([2.7]), np.array([-1.4]),
        cell=1.0,
    )
    # bbox x: [0.2, 2.7] -> cells 0..2; y: [-1.4, 0.3] -> cells -2..0
    assert t.num_rows == 9
    assert sorted(set(zip(t["cx"].to_pylist(), t["cy"].to_pylist()))) == [
        (x, y) for x in (0, 1, 2) for y in (-2, -1, 0)
    ]


def test_chunked_partition_path_is_exact():
    rng = np.random.default_rng(17)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    ax, ay, bx, by = _random_segs(rng, n, span=2.0, ext=2.0)
    part = replicate_segments(ids, ax, ay, bx, by, cell=1.0)
    small = crossings_in_partition(part, 1.0, chunk_pairs=300)
    big = crossings_in_partition(part, 1.0)
    k = lambda t: sorted(zip(t["seg_a"].to_pylist(), t["seg_b"].to_pylist()))
    assert k(small) == k(big)
