"""Exact dedup by key: hash-partition count + duplicate-key broadcast.

The corpus-level exact dedup the reference lacks (SURVEY.md §2.7 O4 — the geo
engine adds it). Naive ``groupby(key).map_groups(first)`` calls Python once
per key — at corpus scale that is millions of per-group calls for a ~1%
duplicate rate. Instead:

  1. ``groupby(key).count()`` over the KEY COLUMNS ONLY (a vectorized
     aggregate; the shuffle carries just the key, never the wide text rows);
  2. keys with count > 1 (the actual duplicates — small by corpus contract)
     are collected and broadcast;
  3. one map pass splits rows: non-duplicate keys stream through untouched,
     duplicate-key rows (a tiny dataset) go through the per-group first-wins
     reduction, then union back.

Scale caveat (documented): the duplicate-key set must fit the object store.
At a ~1% duplicate rate over 10^12 rows it would not — the escape hatch is a
Bloom filter over duplicate keys (false positives only route extra rows into
the small reduction, never lose rows). Not needed at sandbox scale.

First-wins tie-break: min ``order_col`` (warc_ts), then stable — duplicate
rows in the fixture corpus are byte-identical so any-wins is equivalent.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _first_row_of_group(group: pa.Table, order_col: str) -> pa.Table:
    if group.num_rows <= 1:
        return group
    order = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
    return group.take(order[:1])


def dedup_exact(ds, key_cols: list[str], order_col: str = "warc_ts"):
    """Dataset -> Dataset with one row per distinct key tuple."""
    import ray
    from ray.data.aggregate import Count

    counts = ds.select_columns(key_cols).groupby(key_cols).aggregate(
        Count(alias_name="cnt")
    )
    dup_rows = counts.filter(expr="cnt > 1").take_all()
    dup_set = {tuple(r[c] for c in key_cols) for r in dup_rows}
    if not dup_set:
        return ds
    ref = ray.put(dup_set)

    def _mask(batch: pa.Table, dups: set) -> pa.Table:
        cols = [batch[c].to_pylist() for c in key_cols]
        return pa.array([t in dups for t in zip(*cols)], pa.bool_())

    class KeepClean:
        def __init__(self, ref):
            import ray as _r

            self.dups = _r.get(ref) if isinstance(ref, _r.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(_mask(batch, self.dups)))

    class KeepDup:
        def __init__(self, ref):
            import ray as _r

            self.dups = _r.get(ref) if isinstance(ref, _r.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(_mask(batch, self.dups))

    clean = ds.map_batches(
        KeepClean, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=8192, concurrency=(1, 8),
    )
    dup_first = (
        ds.map_batches(
            KeepDup, fn_constructor_args=(ref,), batch_format="pyarrow",
            batch_size=8192, concurrency=(1, 4),
        )
        .groupby(key_cols)
        .map_groups(lambda g: _first_row_of_group(g, order_col), batch_format="pyarrow")
    )
    return clean.union(dup_first)


# retained for comparison/tests: the naive per-group variant
def dedup_by_url(ds):
    return ds.groupby("url").map_groups(
        lambda g: _first_row_of_group(g, "warc_ts"), batch_format="pyarrow"
    )
