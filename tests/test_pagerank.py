"""Sharded-rank PageRank equivalence (VERDICT r3 item 4): the distributed
rank-table path must be bit-identical to the driver-broadcast iteration —
the per-iteration 1e-12 rounding is the shared determinism contract."""

import numpy as np
import pyarrow as pa


def _reference_pagerank(edges, n_iters=10, d=0.85):
    """Pure-numpy golden: synchronous power iteration with the engine's
    per-iteration round-12, over a symmetric edge list."""
    src = np.array([a for a, b in edges] + [b for a, b in edges], np.int64)
    dst = np.array([b for a, b in edges] + [a for a, b in edges], np.int64)
    nodes = np.unique(src)
    n = len(nodes)
    deg = np.zeros(n)
    np.add.at(deg, np.searchsorted(nodes, src), 1.0)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        share = rank / deg
        sums = np.zeros(n)
        np.add.at(sums, np.searchsorted(nodes, dst), share[np.searchsorted(nodes, src)])
        rank = np.round((1.0 - d) / n + d * sums, 12)
    return dict(zip(nodes.tolist(), rank.tolist()))


def _und_ds(edges):
    import ray

    src = [a for a, b in edges] + [b for a, b in edges]
    dst = [b for a, b in edges] + [a for a, b in edges]
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).materialize()


def test_pagerank_sharded_matches_numpy_golden(ray_session):
    from core_ray.collect import collect_table
    from core_ray.stages.pagerank import pagerank_sharded

    rng = np.random.default_rng(7)
    # two stars + a chain + a clique — mixed degrees, multiple components
    edges = {(0, i) for i in range(1, 9)} | {(100, 100 + i) for i in range(1, 5)}
    edges |= {(200 + i, 201 + i) for i in range(6)}
    edges |= {(300 + i, 300 + j) for i in range(5) for j in range(i + 1, 5)}
    edges |= {tuple(sorted(p)) for p in rng.integers(400, 450, (60, 2)) if p[0] != p[1]}
    edges = sorted(edges)

    out = collect_table(pagerank_sharded(_und_ds(edges)))
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert got == _reference_pagerank(edges)


def test_pagerank_sharded_empty_graph(ray_session):
    from core_ray.collect import collect_table
    from core_ray.stages.pagerank import pagerank_sharded

    out = collect_table(pagerank_sharded(_und_ds([])))
    assert out.num_rows == 0


def test_emb_pagerank_forced_shard_path_equivalent(ray_session):
    """emb_pagerank under the forced guard (shard_above_edges=0) must equal
    the broadcast default on the same near-dup graph."""
    from core_ray.queries import emb_pagerank

    sf = "/root/testdata/sf0.001"
    a = emb_pagerank(sf)
    b = emb_pagerank(sf, shard_above_edges=0)
    assert a.num_rows == b.num_rows > 0
    assert a.to_pylist() == b.to_pylist()
