"""Vectorized distributed aggregation helpers.

Ray Data's built-in ``groupby().aggregate()`` reduce iterates Python-side per
distinct key (measured: 24 s for 656 k rows / 300 k distinct keys in one
partition, vs 0.2 s for the sort itself). For high-cardinality keys the engine
therefore uses its own shape everywhere:

    map_batches(per-batch np.unique pre-aggregate)   # combiner, no shuffle
    -> hash-partition by key into ~4x-CPU parts      # ONE small shuffle
    -> groupby(part).map_groups(numpy reduce)        # P Python calls total

This module provides that pattern for uint64 keys (callers hash composite /
string keys into uint64 first; collisions must be acceptable or handled by
the caller — e.g. dedup routes hash-collided keys into an exact per-key path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _n_parts(default: int = 32) -> int:
    try:
        import ray

        return max(4 * int(ray.cluster_resources().get("CPU", 8)), default)
    except Exception:
        return default


def count_by_u64(ds, key_col: str = "key"):
    """Dataset with a uint64 ``key_col`` -> Dataset[(key_col, cnt:int64)].

    Exact counts per distinct key; fully vectorized at every step.
    """
    n_parts = _n_parts()

    def pre(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        u, c = np.unique(k, return_counts=True)
        part = ((u * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(u, pa.uint64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def reduce(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], c[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        totals = np.add.reduceat(cs, starts) if len(starts) else cs[:0]
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.uint64()),
                "cnt": pa.array(totals.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(reduce, batch_format="pyarrow")
    )


def _sum_by_u64_impl(ds, key_col: str, val_col: str, out_col: str, np_dtype, pa_type):
    """Shared combiner + one-hash-shuffle sum-by-key (int64 and float64
    fronts below). One implementation so the argsort/boundary/reduceat
    pattern has a single owner."""
    n_parts = _n_parts()

    def pre(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np_dtype)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        new = np.ones(len(ks), dtype=bool)
        if len(ks):
            new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        u = ks[starts]
        sums = np.add.reduceat(vs, starts) if len(starts) else vs[:0]
        part = ((u * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(u, pa.uint64()),
                out_col: pa.array(sums.astype(np_dtype), pa_type),
                "part": pa.array(part, pa.int32()),
            }
        )

    def reduce(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g[out_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], c[order]
        new = np.ones(len(ks), dtype=bool)
        if len(ks):
            new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        totals = np.add.reduceat(cs, starts) if len(starts) else cs[:0]
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.uint64()),
                out_col: pa.array(totals.astype(np_dtype), pa_type),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(reduce, batch_format="pyarrow")
    )


def sum_by_u64(ds, key_col: str, val_col: str):
    """Dataset with uint64 ``key_col`` + int64 ``val_col`` ->
    Dataset[(key_col, cnt:int64 = sum of vals)] — the weighted sibling of
    count_by_u64, same combiner + hash-partition + reduceat shape."""
    return _sum_by_u64_impl(ds, key_col, val_col, "cnt", np.int64, pa.int64())


def fsum_by_u64(ds, key_col: str, val_col: str):
    """float64-valued sibling of sum_by_u64: Dataset with uint64 ``key_col``
    + float ``val_col`` -> Dataset[(key_col, ``val_col``:float64 = sum)].
    Float addition order differs from a single-pass sum; callers needing
    cross-path determinism must round downstream (stages/pagerank rounds
    each iteration to 1e-12)."""
    return _sum_by_u64_impl(ds, key_col, val_col, val_col, np.float64, pa.float64())


def map_groups_partitioned(ds, key_col: str, partition_fn, n_parts: int | None = None,
                           batch_size: int = 131072):
    """``groupby(key).map_groups(fn)`` for HIGH-CARDINALITY integer keys:
    hash-partition by the key and invoke ``partition_fn`` ONCE per partition
    (it receives every key's rows co-located and handles the per-key segments
    itself — numpy slices, not pyarrow per-group slicing). Ray's per-group
    map_groups costs ~1.4 ms of Python per group; at millions of keys that
    is the job."""
    n_parts = n_parts or _n_parts()

    def tag(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "__part", pa.array(((k * _GOLD) % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    def run(g: pa.Table) -> pa.Table:
        return partition_fn(g.drop_columns(["__part"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__part")
        .map_groups(run, batch_format="pyarrow")
    )


def hash_strings(col) -> np.ndarray:
    """Vectorized uint64 hash of a pyarrow string column (for PARTITIONING:
    equal strings always collide; unequal rarely — collisions only co-locate
    extra rows, never corrupt results). Uses polars' vectorized hash kernel
    (fixed seed, deterministic across workers running the same build — a
    partitioner-consistency assumption documented here); falls back to a
    per-row crc32 loop when polars is unavailable."""
    import pyarrow as _pa

    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        import polars as pl

        return (
            pl.from_arrow(col).hash(seed=42).to_numpy().astype(np.uint64)
        )
    except Exception:
        import zlib

        vals = col.to_pylist()
        return np.fromiter(
            (zlib.crc32(v.encode() if isinstance(v, str) else bytes(v))
             * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF for v in vals),
            dtype=np.uint64,
            count=len(vals),
        )


def u64_key_of_url_midx(urls: list[str], midx: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit key for (url, mention_idx) rows (crc32 x adler32
    spread; used by dedup — collisions only route extra rows into the exact
    per-key dedup path, never lose rows)."""
    import zlib

    n = len(urls)
    h1 = np.fromiter((zlib.crc32(u.encode()) for u in urls), dtype=np.uint64, count=n)
    h2 = np.fromiter((zlib.adler32(u.encode()) for u in urls), dtype=np.uint64, count=n)
    return (h1 << np.uint64(32)) ^ (h2 * np.uint64(2654435761)) ^ midx.astype(np.uint64)


def min_by_u64(ds, key_col: str, val_col: str):
    """Dataset with uint64 ``key_col`` + uint64 ``val_col`` ->
    Dataset[(key_col, val_col = min of vals)] — the MIN sibling of
    sum_by_u64 (combiner + one hash partition + minimum.reduceat). Used by
    stages/cc.py's label propagation, where per-key minima shrink the
    shuffle the same way partial sums do."""
    n_parts = _n_parts()

    def pre(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        new = np.ones(len(ks), dtype=bool)
        if len(ks):
            new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        u = ks[starts]
        mins = np.minimum.reduceat(vs, starts) if len(starts) else vs[:0]
        part = ((u * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(u, pa.uint64()),
                val_col: pa.array(mins, pa.uint64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def reduce(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = g[val_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        new = np.ones(len(ks), dtype=bool)
        if len(ks):
            new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        mins = np.minimum.reduceat(vs, starts) if len(starts) else vs[:0]
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.uint64()),
                val_col: pa.array(mins, pa.uint64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(reduce, batch_format="pyarrow")
    )


def max_by_u64(ds, key_col: str, val_col: str):
    """MAX sibling of min_by_u64, by bit complement: max(v) == ~min(~v) on
    uint64 — one extra vectorized map on each side of the existing combiner
    instead of a third reduceat kernel."""

    def flip(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.set_column(
            b.schema.get_field_index(val_col), val_col, pa.array(~v, pa.uint64())
        )

    inv = min_by_u64(
        ds.map_batches(flip, batch_format="pyarrow", batch_size=131072),
        key_col, val_col,
    )
    return inv.map_batches(flip, batch_format="pyarrow")


def histogram_quantile_cont(vals: np.ndarray, cnts: np.ndarray, q: float) -> float:
    """QUANTILE_CONT over the expanded multiset, from a value->count
    histogram (the distributed-quantile driver step: distinct values, not
    rows, reach the caller). Definition matches SQL/np.quantile 'linear':
    h = (N-1)*q; v[floor(h)] + frac * (v[ceil(h)] - v[floor(h)]). An
    interpolated threshold is either an exact integer (frac 0) or lies
    strictly between two adjacent values, so ulp differences vs a SQL
    QUANTILE_CONT cannot flip a bucket-boundary comparison."""
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    hpos = (n - 1) * q
    lo_rank = int(np.floor(hpos))
    frac = hpos - lo_rank
    lo_i = int(np.searchsorted(cum, lo_rank + 1))
    hi_i = int(np.searchsorted(cum, lo_rank + 2)) if frac > 0 else lo_i
    lo_v = float(vals[lo_i])
    hi_v = float(vals[min(hi_i, len(vals) - 1)])
    return lo_v + frac * (hi_v - lo_v)
