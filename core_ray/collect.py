"""Driver-side collection of SMALL Dataset results.

The ONE implementation of the recurring "gather arrow refs, drop empties,
concat" pattern (broadcast small sides, filtered key sets, tiny aggregates).
Schema is preserved even when every block is empty; a zero-block dataset
yields an empty schema-less table. Never call this on a fact table —
distributed filters/projections run first so only the survivors cross.
"""

from __future__ import annotations

import pyarrow as pa


def collect_table(ds) -> pa.Table:
    import ray

    tables = ray.get(ds.to_arrow_refs())
    non_empty = [t for t in tables if t.num_rows]
    if non_empty:
        return pa.concat_tables(non_empty, promote_options="default")
    if tables:
        return tables[0]
    return pa.table({})
