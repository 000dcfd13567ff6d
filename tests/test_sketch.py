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
