"""Semi-structured (JSON string column) field extraction.

The flat-JSON properties column is a standard web-events shape; extraction
must stay vectorized. Strategy:

- FAST PATH: one Arrow `extract_regex` kernel per batch pulls a scalar
  field's token out of flat JSON (no Python per row);
- EXACT FALLBACK: rows the regex cannot resolve (absent field, nested or
  escaped values, malformed JSON) fall back to per-row ``json.loads`` —
  rare by construction, and the fallback preserves exact JSON semantics,
  so the fast path is an optimization, never a semantic change.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def json_field_int64(col, field: str) -> pa.Array:
    """JSON-string column -> int64 array of ``field`` (null where absent or
    non-integer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pattern = r'"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)(?P<tail>[,}\s])'
    ex = pc.extract_regex(col, pattern)
    vals = ex.field("v")
    # unmatched rows surface as '' (not null) in this pyarrow build; a cast
    # of '' raises, so blank them to null first
    vals = pc.if_else(pc.equal(vals, ""), pa.scalar(None, pa.string()), vals)
    # the regex is only trustworthy on FLAT JSON: a nested object or an
    # escaped quote could shadow the top-level field ('{"a": {"k": 3},
    # "k": 5}' would fast-path to 3). Route any row with nesting or escape
    # characters to the exact fallback instead.
    flat = pc.and_(
        pc.equal(pc.count_substring(col, "{"), 1),
        pc.equal(pc.count_substring(col, "\\"), 0),
    )
    vals = pc.if_else(pc.fill_null(flat, False), vals, pa.scalar(None, pa.string()))
    out = pc.cast(vals, pa.int64(), safe=False)
    miss = pc.is_null(out)
    if pc.any(miss).as_py():
        idx = np.nonzero(miss.to_numpy(zero_copy_only=False))[0]
        py = col.to_pylist()
        fixed = out.to_pylist()
        for i in idx:
            s = py[i]
            if s is None:
                continue
            try:
                v = json.loads(s).get(field)
            except (json.JSONDecodeError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            fixed[int(i)] = v
        out = pa.array(fixed, pa.int64())
    return out
