"""Exact dedup by key: hash-partition count + duplicate-key broadcast.

The corpus-level exact dedup the reference lacks (SURVEY.md §2.7 O4 — the geo
engine adds it). Naive ``groupby(key).map_groups(first)`` calls Python once
per key, and even ``groupby(key).count()`` reduces Python-side per distinct
key in Ray Data (see stages/agg.py). Instead:

  1. hash each key tuple to uint64 and count per hash with the vectorized
     count_by_u64 helper (per-batch combiner + one tiny shuffle);
  2. hashes with count > 1 (actual duplicates + rare hash collisions — both
     small by corpus contract) are collected and broadcast as a sorted numpy
     array; membership tests are np.isin (vectorized), not per-row set probes;
  3. one map pass splits rows: non-duplicate-hash rows stream through
     untouched; duplicate-hash rows (tiny) go through an EXACT per-key
     first-wins reduction (grouped by the real key columns, so a hash
     collision between two distinct keys keeps both — never loses rows).

Scale caveat (documented): the duplicate-hash array must fit the object
store. At a ~1% duplicate rate over 10^12 rows it would not — the escape
hatch is a Bloom filter over duplicate hashes (false positives only route
extra rows into the small exact reduction). Not needed at sandbox scale.

First-wins tie-break: min ``order_col`` (warc_ts), then stable — duplicate
rows in the fixture corpus are byte-identical so any-wins is equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from core_ray.stages.agg import count_by_u64, u64_key_of_url_midx


def _first_row_of_group(group: pa.Table, order_col: str) -> pa.Table:
    if group.num_rows <= 1:
        return group
    order = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
    return group.take(order[:1])


def _row_hashes(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    if key_cols == ["url", "mention_idx"]:
        return u64_key_of_url_midx(
            batch["url"].to_pylist(),
            batch["mention_idx"].to_numpy(zero_copy_only=False),
        )
    import zlib

    cols = [batch[c].to_pylist() for c in key_cols]
    return np.fromiter(
        (zlib.crc32(repr(t).encode()) * 0x9E3779B9 & 0xFFFFFFFFFFFFFFFF for t in zip(*cols)),
        dtype=np.uint64,
        count=batch.num_rows,
    )


def dedup_exact(ds, key_cols: list[str], order_col: str = "warc_ts", key_ds=None):
    """Dataset -> Dataset with one row per distinct key tuple.

    ``key_ds``: optional column-pruned projection of ``ds`` holding only the
    key columns (e.g. a parquet read with columns=key_cols) — the counting
    pass then never touches the wide text/html columns.
    """
    def tag(b: pa.Table) -> pa.Table:
        return pa.table({"key": pa.array(_row_hashes(b, key_cols), pa.uint64())})

    counts = count_by_u64(
        (key_ds if key_ds is not None else ds).map_batches(
            tag, batch_format="pyarrow", batch_size=65536
        ),
        "key",
    )
    dup_rows = counts.filter(expr="cnt > 1").take_all()
    dup_hashes = np.sort(np.array([r["key"] for r in dup_rows], dtype=np.uint64))
    if len(dup_hashes) == 0:
        return ds

    # stateless task filters: the dup-hash array is tiny, so capturing it in
    # the task closure beats an actor pool (no pool startup, fully elastic)
    def keep_clean(batch: pa.Table) -> pa.Table:
        m = np.isin(_row_hashes(batch, key_cols), dup_hashes)
        return batch.filter(pa.array(~m))

    def keep_dup(batch: pa.Table) -> pa.Table:
        m = np.isin(_row_hashes(batch, key_cols), dup_hashes)
        return batch.filter(pa.array(m))

    clean = ds.map_batches(keep_clean, batch_format="pyarrow", batch_size=16384)
    # dup path: co-locate by key hash, then ONE vectorized first-wins pass per
    # partition over the EXACT key columns (collisions keep both keys)
    from core_ray.stages.agg import _n_parts

    n_parts = _n_parts()

    def add_part(b: pa.Table) -> pa.Table:
        h = _row_hashes(b, key_cols)
        return b.append_column(
            "dedup_part",
            pa.array(((h * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)).astype(np.int32), pa.int32()),
        )

    def first_per_key(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["dedup_part"])
        if part.num_rows <= 1:
            return part
        sort_cols = [*key_cols, order_col]
        arrays = []
        for c in reversed(sort_cols):
            col = part[c]
            if pa.types.is_timestamp(col.type):
                arrays.append(col.cast(pa.int64()).to_numpy(zero_copy_only=False))
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                arrays.append(np.asarray(col.to_pylist()))
            else:
                arrays.append(col.to_numpy(zero_copy_only=False))
        order = np.lexsort(tuple(arrays))  # last array (= first sort col) primary
        key_arrays = arrays[-len(key_cols):]
        first = np.ones(len(order), dtype=bool)
        changed = np.zeros(len(order) - 1, dtype=bool)
        for a in key_arrays:
            s = a[order]
            changed |= s[1:] != s[:-1]
        first[1:] = changed
        return part.take(pa.array(order[first]))

    dup_first = (
        ds.map_batches(keep_dup, batch_format="pyarrow", batch_size=16384)
        .map_batches(add_part, batch_format="pyarrow", batch_size=65536)
        .groupby("dedup_part")
        .map_groups(first_per_key, batch_format="pyarrow")
    )
    return clean.union(dup_first)


# retained for comparison/tests: the naive per-group variant
def dedup_by_url(ds):
    return ds.groupby("url").map_groups(
        lambda g: _first_row_of_group(g, "warc_ts"), batch_format="pyarrow"
    )
