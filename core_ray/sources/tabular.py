"""Tabular sources: format-sniffing reads for parquet / CSV / JSONL.

The S1 LocalSource analog for tabular inputs (reference
pkg/source/local.go: one Source interface, many layouts): every engine
pipeline starts from a Dataset, so any format Ray Data can scan plugs in
here. ``read_table_auto`` dispatches on extension; ``columns`` pruning is
pushed into the read where the format supports it (parquet) and applied as
an immediate projection otherwise (CSV/JSON scans are row-major formats —
there is nothing to prune at the byte level).
"""

from __future__ import annotations

import os

_READERS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}


def _fmt_of(path: str) -> str:
    if os.path.isdir(path):
        names = [n for n in os.listdir(path) if not n.startswith(".")]
        exts = {os.path.splitext(n)[1].lower() for n in names} & set(_READERS)
        if len(exts) != 1:
            raise ValueError(
                f"cannot infer a single format from {path!r} (found {sorted(exts)})"
            )
        return _READERS[exts.pop()]
    ext = os.path.splitext(path)[1].lower()
    if ext not in _READERS:
        raise ValueError(f"unsupported tabular extension {ext!r} ({path!r})")
    return _READERS[ext]


def read_table_auto(path: str, columns: list[str] | None = None):
    """Path (file or single-format directory) -> ray Dataset."""
    import ray.data

    fmt = _fmt_of(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    ds = ray.data.read_csv(path) if fmt == "csv" else ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
