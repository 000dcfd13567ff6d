"""JSON field extraction (text/jsonops.py): vectorized fast path + exact
json.loads fallback must agree with JSON semantics on every edge."""

from __future__ import annotations

import pyarrow as pa

from core_ray.text.jsonops import json_field_int64


def test_fast_path_and_fallback_semantics():
    col = pa.array(
        [
            '{"k": 69}',            # fast path
            '{"k":-3}',             # negative, no space
            '{"a": 1, "k": 7}',     # later field
            '{"k": 12.5}',          # float -> null (not an int)
            '{"k": true}',          # bool -> null (bool is not an int here)
            '{"k": "9"}',           # string -> null
            '{"x": 1}',             # absent -> null
            'not json at all',      # malformed -> null
            '{"k": 1e2}',           # float notation -> null
            '{"kk": 5, "k": 8}',    # key prefix must not confuse the regex
            None,                   # null row -> null
            '{ "k" : 42 }',         # whitespace everywhere
        ],
        pa.string(),
    )
    out = json_field_int64(col, "k")
    assert out.to_pylist() == [69, -3, 7, None, None, None, None, None, None, 8, None, 42]


def test_nested_and_shadowed_keys_use_exact_json_semantics():
    # rows with nesting or escapes bypass the regex fast path entirely, so
    # the answer is always json.loads' top-level view
    col = pa.array(
        [
            '{"k": {"inner": 1}}',            # k is an object -> null
            '{"outer": {"k": 3}}',            # top-level k absent -> null
            '{"a": {"k": 3}, "k": 5}',        # nested shadow -> top-level 5
            '{"note": "set \\"k\\": 9 here", "k": 1}',  # escaped shadow -> 1
        ],
        pa.string(),
    )
    assert json_field_int64(col, "k").to_pylist() == [None, None, 5, 1]
