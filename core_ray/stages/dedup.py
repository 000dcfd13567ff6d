"""Exact dedup by url: hash-partition on the key + per-group first.

The corpus-level exact dedup the reference lacks (SURVEY.md §2.7 O4 — the geo
engine adds it). First-wins is deterministic here because duplicate rows are
byte-identical (fixture spec); the tie-break is still pinned (min warc_ts,
then arbitrary-but-single row) so the operator is well-defined on corpora
with non-identical duplicates too.

Scale note: this is an all-to-all shuffle keyed by url — inherent to exact
dedup. It runs immediately after extract (html already dropped), so shuffled
rows carry only (url, warc_ts, lang, text).
"""

from __future__ import annotations

import pyarrow as pa


def _first_row(group: pa.Table) -> pa.Table:
    if group.num_rows <= 1:
        return group
    import pyarrow.compute as pc

    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending")])
    return group.take(order[:1])


def dedup_by_url(ds):
    """Dataset[(url, ...)] -> Dataset with one row per url."""
    return ds.groupby("url").map_groups(_first_row, batch_format="pyarrow")
