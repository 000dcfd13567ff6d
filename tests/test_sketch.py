"""DDSketch-style mergeable quantile sketch (stages/sketch.py): bin math,
relative-error bound vs exact, distributed merge equivalence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from core_ray.stages.sketch import (
    DDSketchParams,
    approx_group_quantiles,
    quantiles_from_bins,
)


def test_bin_value_roundtrip_relative_error():
    p = DDSketchParams(alpha=0.01)
    rng = np.random.default_rng(3)
    v = np.exp(rng.uniform(np.log(1e-6), np.log(1e6), size=5000))
    back = p.value_of(p.bin_of(v))
    rel = np.abs(back - v) / v
    assert rel.max() <= p.alpha * 1.0000001  # the sketch's core guarantee


def test_zero_and_negative_handling():
    p = DDSketchParams(alpha=0.01)
    assert p.bin_of(np.array([0.0]))[0] == 0
    assert p.value_of(np.array([0]))[0] == 0.0
    with pytest.raises(ValueError):
        p.bin_of(np.array([-1.0]))


def test_quantiles_from_bins_exactish_on_dense_data():
    p = DDSketchParams(alpha=0.01)
    rng = np.random.default_rng(4)
    v = rng.uniform(1.0, 400.0, size=200_000)
    bins = p.bin_of(v)
    ub, uc = np.unique(bins, return_counts=True)
    got50, got90 = quantiles_from_bins(ub, uc, (0.5, 0.9), p)
    exact50, exact90 = np.quantile(v, 0.5), np.quantile(v, 0.9)
    assert abs(got50 - exact50) / exact50 < 2 * p.alpha
    assert abs(got90 - exact90) / exact90 < 2 * p.alpha


def test_approx_group_quantiles_distributed(ray_session):
    import ray

    rng = np.random.default_rng(5)
    groups, vals = [], []
    truth = {}
    for name, (lo, hi) in {"a": (1, 100), "b": (10, 1000), "c": (0, 50)}.items():
        v = rng.uniform(lo, hi, size=60_000)
        groups += [name] * len(v)
        vals.append(v)
        truth[name] = (np.quantile(v, 0.5), np.quantile(v, 0.9))
    t = pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            "value": pa.array(np.concatenate(vals), pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = approx_group_quantiles(ds, "event_type", "value", qs=(0.5, 0.9), alpha=0.01)
    assert out["event_type"].to_pylist() == ["a", "b", "c"]
    for name, q50, q90 in zip(
        out["event_type"].to_pylist(),
        out["q_0.5"].to_pylist(),
        out["q_0.9"].to_pylist(),
    ):
        e50, e90 = truth[name]
        assert abs(q50 - e50) / e50 < 0.03  # 2*alpha + rank granularity
        assert abs(q90 - e90) / e90 < 0.03


# ---------------- Misra-Gries heavy hitters ----------------


class TestMisraGries:
    def _exact(self, keys):
        u, c = np.unique(keys, return_counts=True)
        return dict(zip(u.tolist(), c.tolist()))

    def test_compress_bound_and_determinism(self):
        from core_ray.stages.sketch import mg_compress

        rng = np.random.default_rng(5)
        items = np.arange(1, 2001, dtype=np.uint64)
        counts = rng.integers(1, 1000, 2000).astype(np.int64)
        u, c, dec = mg_compress(items, counts, 64)
        assert len(u) <= 64 and dec > 0
        exact = dict(zip(items.tolist(), counts.tolist()))
        for it, est in zip(u.tolist(), c.tolist()):
            assert est == exact[it] - dec and est > 0
        u2, c2, dec2 = mg_compress(items, counts, 64)
        assert (u == u2).all() and (c == c2).all() and dec == dec2

    def test_topk_bounds_on_zipf(self, ray_session):
        import ray.data

        from core_ray.stages.sketch import approx_top_k

        rng = np.random.default_rng(11)
        keys = np.minimum(rng.zipf(1.3, 200_000), 1 << 30).astype(np.uint64)
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(keys, pa.uint64())})
        ).repartition(8)
        out, n, err = approx_top_k(ds, "k", k=20, m=512)
        assert n == len(keys)
        assert err == len(keys) // 513
        exact = self._exact(keys)
        got = dict(zip(out["item"].to_pylist(), out["est"].to_pylist()))
        assert len(got) == 20
        # lower-bound estimates within the published mergeable-MG bound
        for it, est in got.items():
            true = exact[it]
            assert est <= true <= est + err, (it, est, true, err)
        # every truly-heavy item (count comfortably above the bound) is found
        heavy = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
        for it, true in heavy[:20]:
            if true > 2 * err:
                assert it in got, (it, true, err)

    def test_topk_small_and_empty(self, ray_session):
        import ray.data

        from core_ray.stages.sketch import approx_top_k

        ds = ray.data.from_arrow(
            pa.table({"k": pa.array([7, 7, 7, 3, 3, 9], pa.uint64())})
        )
        out, n, err = approx_top_k(ds, "k", k=2, m=16)
        assert n == 6 and err == 0  # m+1 > n: exact
        assert out["item"].to_pylist() == [7, 3]
        assert out["est"].to_pylist() == [3, 2]

        empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.uint64())}))
        out, n, err = approx_top_k(empty, "k", k=5, m=16)
        assert n == 0 and out.num_rows == 0


# ---------------- two-sided (signed) store ----------------


def test_two_sided_roundtrip_relative_error():
    p = DDSketchParams(alpha=0.01, two_sided=True)
    rng = np.random.default_rng(6)
    mag = np.exp(rng.uniform(np.log(1e-6), np.log(1e6), size=5000))
    v = mag * rng.choice([-1.0, 1.0], size=5000)
    back = p.value_of(p.bin_of(v))
    rel = np.abs(back - v) / np.abs(v)
    assert rel.max() <= p.alpha * 1.0000001
    assert (np.sign(back) == np.sign(v)).all()


def test_two_sided_quantiles_with_negative_values(ray_session):
    import ray

    rng = np.random.default_rng(7)
    v = rng.normal(0.0, 100.0, size=120_000)  # ~half negative
    t = pa.table(
        {
            "g": pa.array(["x"] * len(v), pa.string()),
            "value": pa.array(v, pa.float64()),
        }
    )
    out = approx_group_quantiles(
        ray.data.from_arrow(t), "g", "value", qs=(0.1, 0.5, 0.9),
        alpha=0.01, two_sided=True,
    )
    for q, got in zip((0.1, 0.5, 0.9), (out["q_0.1"][0].as_py(),
                                        out["q_0.5"][0].as_py(),
                                        out["q_0.9"][0].as_py())):
        exact = float(np.quantile(v, q))
        # relative error on |value| plus rank granularity; median sits near
        # the zero bin so compare on absolute scale there
        tol = max(0.03 * abs(exact), 3.0)
        assert abs(got - exact) <= tol, (q, got, exact)


def test_one_sided_still_rejects_negatives():
    with pytest.raises(ValueError):
        DDSketchParams(alpha=0.01).bin_of(np.array([-2.0]))
