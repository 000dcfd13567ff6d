"""DBSCAN operator (stages/dbscan.py) vs a brute-force single-process oracle.

The oracle below is the textbook definition computed densely: a point is
core iff its eps-ball (including itself) holds >= min_pts points; clusters
are connected components of the core-core eps-graph labeled by minimum
member id; border points take the minimum neighboring core cluster; the
rest are noise. Independent of every engine kernel (dense matrix vs
cell-replicated pairs, union-find vs pointer jumping).
"""

import numpy as np
import pyarrow as pa
import pytest


def _brute(ids, lat, lon, eps, min_pts):
    n = len(ids)
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    adj = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= min_pts

    # union-find over core-core edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and adj[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    label = {}
    comp_min: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp_min[find(i)], "core")
        else:
            nb = [comp_min[find(j)] for j in range(n) if core[j] and adj[i, j]]
            out[ids[i]] = (min(nb), "border") if nb else (None, "noise")
    return out


@pytest.mark.parametrize("seed,n,eps,min_pts", [
    (1, 120, 6.0, 4),
    (2, 200, 3.0, 3),
    (3, 80, 12.0, 6),
    (4, 150, 1.0, 2),   # sparse: mostly noise + tiny pairs-as-clusters
])
def test_dbscan_matches_bruteforce(ray_session, seed, n, eps, min_pts):
    import ray.data

    from core_ray.stages.dbscan import dbscan

    rng = np.random.default_rng(seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    rng.shuffle(ids)
    # clumped points so all three roles appear
    centers = rng.uniform(-50, 50, size=(max(2, n // 30), 2))
    which = rng.integers(0, len(centers), n)
    lat = centers[which, 0] + rng.normal(0, eps, n)
    lon = centers[which, 1] + rng.normal(0, eps, n)

    pts = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64()),
    })).repartition(4)

    got_t = pa.concat_tables(
        [t for t in ray.get(dbscan(pts, eps, min_pts).to_arrow_refs()) if t.num_rows]
    )
    got = {
        d: (c, r)
        for d, c, r in zip(
            got_t["doc_id"].to_pylist(),
            got_t["cluster"].to_pylist(),
            got_t["role"].to_pylist(),
        )
    }
    want = _brute(ids, lat, lon, eps, min_pts)
    assert got == want
    roles = {r for _, r in want.values()}
    if seed in (1, 2):  # the clumped configs must exercise all three roles
        assert roles == {"core", "border", "noise"}
