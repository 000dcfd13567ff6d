"""connected_components (stages/cc.py) vs the textbook union-find oracle
(fixtures/docs_golden.golden_dup_clusters): chains (deep diameter, exercises
pointer jumping), random graphs, duplicate/self-loop edges, empty input."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from core_ray.fixtures.docs_golden import golden_dup_clusters
from core_ray.stages.cc import connected_components


# every graph test runs BOTH strategies: the driver-local small-graph path
# (default threshold) and the distributed log-round path (threshold=0)
BOTH_PATHS = pytest.mark.parametrize("thresh", [4_000_000, 0])


def _edges_ds(a, b):
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    )


def _result(ds):
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    return sorted(zip(t["node"].to_pylist(), t["comp"].to_pylist()))


def _golden(a, b):
    g = golden_dup_clusters(
        pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    )
    return sorted(zip(g["node"].to_pylist(), g["comp"].to_pylist()))


@BOTH_PATHS
def test_chain_collapses_to_min(ray_session, thresh):
    # path graph 5-6-...-104: diameter 99 ≫ max_rounds, so only pointer
    # jumping can converge; every node must land on component 5
    a = list(range(5, 104))
    b = list(range(6, 105))
    out = _result(connected_components(_edges_ds(a, b), src="id_a", dst="id_b", local_edges_threshold=thresh))
    assert out == [(n, 5) for n in range(5, 105)]


@BOTH_PATHS
def test_multi_component_with_noise_edges(ray_session, thresh):
    # two stars + a triangle + self-loops + duplicate and reversed edges
    a = [10, 10, 10, 50, 50, 70, 71, 72, 10, 11, 99]
    b = [11, 12, 13, 51, 52, 71, 72, 70, 11, 10, 99]
    out = _result(connected_components(_edges_ds(a, b), src="id_a", dst="id_b", local_edges_threshold=thresh))
    assert out == _golden(a, b)
    comp = dict(out)
    assert comp[13] == 10 and comp[52] == 50 and comp[72] == 70 and comp[99] == 99


@pytest.mark.parametrize("seed,n_edges,n_nodes", [(1, 2000, 900), (2, 500, 2000)])
@BOTH_PATHS
def test_random_graph_matches_union_find(ray_session, seed, n_edges, n_nodes, thresh):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).tolist()
    b = rng.integers(0, n_nodes, n_edges).tolist()
    assert _result(connected_components(_edges_ds(a, b), src="id_a", dst="id_b", local_edges_threshold=thresh)) == _golden(a, b)


def test_empty_edges(ray_session):
    ds = _edges_ds([], [])
    out = connected_components(ds, src="id_a", dst="id_b")
    assert out.count() == 0
