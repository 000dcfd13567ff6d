"""core_ray.rounding must track DuckDB ROUND exactly — including the exact
binary ties where numpy/pyarrow banker's rounding diverges."""

import duckdb
import numpy as np
import pyarrow as pa

from core_ray.rounding import sql_round, sql_round_np


def _duck_round(vals, d):
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, pa.float64())}))
    return [r[0] for r in con.sql(f"SELECT ROUND(v, {d}) FROM t").fetchall()]


def _probe_values():
    rng = np.random.default_rng(17)
    vals = list(rng.uniform(-1000, 1000, 300))
    # crafted exact binary ties (power-of-two denominators) + classics
    vals += [97 / 128, -97 / 128, 202.125, -202.125, 3 / 256, 0.5, -0.5,
             2.675, 1.0049999999, 123456.785, -0.000005, 5 / 64]
    vals += [k / 16 for k in range(-40, 40)]
    return vals


def test_sql_round_matches_duckdb_d2_d6():
    vals = _probe_values()
    for d in (2, 6):
        want = _duck_round(vals, d)
        got_np = sql_round_np(np.array(vals), d).tolist()
        got_pa = sql_round(pa.array(vals, pa.float64()), d).to_pylist()
        assert got_np == want, [
            (v, g, w) for v, g, w in zip(vals, got_np, want) if g != w
        ][:3]
        assert got_pa == want, [
            (v, g, w) for v, g, w in zip(vals, got_pa, want) if g != w
        ][:3]


def test_diverges_from_bankers_rounding_on_ties():
    # the reason this module exists: numpy would round 202.125 -> 202.12
    assert float(np.round(202.125, 2)) == 202.12
    assert float(sql_round_np(202.125, 2)) == 202.13
