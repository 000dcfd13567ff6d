"""Local replica of the driver's correctness gate: run each QUERIES entry and
its ORACLE_SQL side-by-side over the same parquet tables, compare row count +
schema (column names) + order-insensitive values. Used by tests and by
scripts/check_correctness.py; mirrors snapshot-diff discipline
(reference tests/integration/snapshot.go:216-276)."""

from __future__ import annotations

import math
import os

import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_arrow(result) -> pa.Table:
    import pandas as pd

    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray Dataset (small results only)
    from core_ray.collect import collect_table

    return collect_table(result)


def run_oracle(sql: str, sf_dir: str) -> pa.Table:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).arrow()


def _norm_rows(table: pa.Table) -> list[tuple]:
    cols = sorted(table.column_names)
    data = [table[c].to_pylist() for c in cols]
    rows = []
    for vals in zip(*data):
        row = []
        for v in vals:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(round(v, 9))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def compare(ray_table: pa.Table, oracle_table: pa.Table) -> dict:
    out = {
        "rows_ray": ray_table.num_rows,
        "rows_oracle": oracle_table.num_rows,
        "cols_ray": sorted(ray_table.column_names),
        "cols_oracle": sorted(oracle_table.column_names),
    }
    out["rows_match"] = out["rows_ray"] == out["rows_oracle"]
    out["schema_match"] = out["cols_ray"] == out["cols_oracle"]
    # The driver's value hash is TYPE-sensitive (r3 post-mortem: a DuckDB
    # HUGEINT sum hash-failed against identical int64 values), so mirror it:
    # Arrow types must match exactly, column-by-column.
    types_ray = {f.name: str(f.type) for f in ray_table.schema}
    types_oracle = {f.name: str(f.type) for f in oracle_table.schema}
    out["types_match"] = types_ray == types_oracle
    if not out["types_match"]:
        out["type_diffs"] = {
            n: (types_ray.get(n), types_oracle.get(n))
            for n in set(types_ray) | set(types_oracle)
            if types_ray.get(n) != types_oracle.get(n)
        }
    if out["rows_match"] and out["schema_match"]:
        a, b = _norm_rows(ray_table), _norm_rows(oracle_table)
        out["values_match"] = a == b
        if not out["values_match"]:
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            out["first_diffs"] = diff[:3]
    else:
        out["values_match"] = False
    out["ok"] = (
        out["rows_match"]
        and out["schema_match"]
        and out["types_match"]
        and out["values_match"]
    )
    return out


def check_query(name: str, sf_dir: str) -> dict:
    from core_ray.queries import ORACLE_SQL, QUERIES

    ray_res = to_arrow(QUERIES[name](sf_dir))
    if name not in ORACLE_SQL:
        return {"ok": ray_res.num_rows >= 0, "rows_ray": ray_res.num_rows, "rows_only": True}
    oracle_res = run_oracle(ORACLE_SQL[name], sf_dir)
    return compare(ray_res, oracle_res)
