"""Nested-column operators: key-grouped nest (rows -> list<struct>) + explode.

The reference's core output model is recursively nested suites
(pkg/domain/test.go:16-30); SURVEY.md §1.2 maps that to ``list<struct<...>>``
Arrow columns. These operators are the engine's nest/explode pair
(VERDICT r2 item 4):

- ``nest_by_key``: one output row per distinct key with a deterministic
  (order_col-sorted) ``list<struct<payload...>>`` column. Distributed shape:
  vectorized per-batch partition tag (polars string hash — no per-row
  Python) -> ONE hash-partition shuffle -> per-partition Arrow-native sort +
  ListArray assembly from group offsets (no Python per group).
- ``explode_list``: the inverse — flattens the list column back to one row
  per element via ``list_parent_indices`` + ``flatten`` (all zero-copy
  Arrow kernels inside map_batches).

Roundtrip contract (tested): explode(nest(t)) == t up to row order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from core_ray.stages.agg import _GOLD, _n_parts, hash_strings


def nest_partition(
    g: pa.Table, key_col: str, order_col: str, payload_cols: list[str], list_col: str
) -> pa.Table:
    """Nest ONE co-located partition: Arrow sort by (key, order), group
    boundaries from the dictionary-encoded key, ListArray from offsets."""
    if g.num_rows == 0:
        struct_t = pa.struct([g.schema.field(c) for c in payload_cols])
        return pa.table(
            {
                key_col: pa.array([], g.schema.field(key_col).type),
                list_col: pa.array([], pa.list_(struct_t)),
            }
        )
    order = pc.sort_indices(
        g, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
    )
    g = g.take(order)
    codes = (
        pc.dictionary_encode(g[key_col]).combine_chunks().indices.to_numpy(
            zero_copy_only=False
        )
    )
    new = np.ones(len(codes), dtype=bool)
    new[1:] = codes[1:] != codes[:-1]
    starts = np.nonzero(new)[0]
    offsets = np.append(starts, len(codes)).astype(np.int32)
    struct_arr = pa.StructArray.from_arrays(
        [g[c].combine_chunks() for c in payload_cols], names=payload_cols
    )
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct_arr)
    keys = g[key_col].take(pa.array(starts))
    return pa.table({key_col: keys, list_col: lists})


def nest_by_key(ds, key_col: str, order_col: str, payload_cols: list[str],
                list_col: str = "items", n_parts: int | None = None):
    """Dataset -> Dataset[(key_col, list_col: list<struct<payload...>>)],
    one row per distinct key, list elements sorted by ``order_col``."""
    n_parts = n_parts or _n_parts()

    def tag(b: pa.Table) -> pa.Table:
        h = hash_strings(b[key_col])
        return b.append_column(
            "__part",
            pa.array(((h * _GOLD) % np.uint64(n_parts)).astype(np.int32), pa.int32()),
        )

    def run(g: pa.Table) -> pa.Table:
        return nest_partition(
            g.drop_columns(["__part"]), key_col, order_col, payload_cols, list_col
        )

    return (
        ds.select_columns([key_col, order_col, *[c for c in payload_cols if c != order_col]])
        .map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(run, batch_format="pyarrow")
    )


def explode_batch(b: pa.Table, key_col: str, list_col: str) -> pa.Table:
    """One batch of nested rows -> flat rows (struct fields as columns)."""
    lists = b[list_col].combine_chunks()
    parent = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    cols = {key_col: b[key_col].take(parent)}
    for f in flat.type:
        cols[f.name] = flat.field(f.name)
    return pa.table(cols)


def explode_list(ds, key_col: str, list_col: str = "items"):
    """Inverse of nest_by_key (row order within a key follows list order)."""
    return ds.map_batches(
        lambda b: explode_batch(b, key_col, list_col),
        batch_format="pyarrow",
        batch_size=65536,
    )
