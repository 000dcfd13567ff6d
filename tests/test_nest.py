"""Nest/explode operators (stages/nest.py): structure, ordering, roundtrip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from core_ray.stages.nest import explode_list, nest_by_key, nest_partition


def _table(n_keys=7, per_key=(0, 5), seed=3):
    rng = np.random.default_rng(seed)
    urls, midx, lat, lon, admin = [], [], [], [], []
    for k in range(n_keys):
        m = int(rng.integers(per_key[0] + 1, per_key[1]))
        for j in rng.permutation(m):  # arrive unordered
            urls.append(f"https://h{k}.example.com/p")
            midx.append(int(j))
            lat.append(float(rng.normal()))
            lon.append(float(rng.normal()))
            admin.append(None if j % 3 == 0 else f"A{j}")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "mention_idx": pa.array(midx, pa.int32()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "admin_id": pa.array(admin, pa.string()),
        }
    )


def _canon(t: pa.Table) -> pa.Table:
    idx = pc.sort_indices(t, sort_keys=[("url", "ascending"), ("mention_idx", "ascending")])
    return t.take(idx)


def test_nest_partition_structure_and_order():
    t = _table()
    nested = nest_partition(t, "url", "mention_idx", ["mention_idx", "lat", "lon", "admin_id"], "mentions")
    # one row per distinct url; list lengths match group sizes
    assert nested.num_rows == len(set(t["url"].to_pylist()))
    assert pa.types.is_list(nested["mentions"].type)
    assert pa.types.is_struct(nested["mentions"].type.value_type)
    for url, mentions in zip(nested["url"].to_pylist(), nested["mentions"].to_pylist()):
        idxs = [m["mention_idx"] for m in mentions]
        assert idxs == sorted(idxs)  # ordered by mention_idx
        assert len(mentions) == t.filter(pc.equal(t["url"], url)).num_rows


def test_nest_explode_roundtrip_distributed(ray_session):
    import ray

    t = _table(n_keys=23, per_key=(0, 6))
    ds = ray.data.from_arrow(t)
    nested = nest_by_key(
        ds, key_col="url", order_col="mention_idx",
        payload_cols=["mention_idx", "lat", "lon", "admin_id"], list_col="mentions",
    )
    flat = explode_list(nested, key_col="url", list_col="mentions")
    tabs = [x for x in ray.get(flat.to_arrow_refs()) if x.num_rows]
    got = _canon(pa.concat_tables(tabs).select(t.column_names))
    assert got.equals(_canon(t))


def test_nest_empty_partition():
    t = _table().slice(0, 0)
    nested = nest_partition(t, "url", "mention_idx", ["mention_idx", "lat"], "mentions")
    assert nested.num_rows == 0 and pa.types.is_list(nested["mentions"].type)


def test_nest_hierarchy_two_level_roundtrip(ray_session):
    """host -> url -> mentions depth-2 nest, exploded twice, must equal the
    input up to row order; carry_cols surfaces host at the inner level."""
    import ray

    from core_ray.stages.nest import nest_hierarchy

    t = _table(n_keys=23, per_key=(0, 6))
    host = pc.struct_field(
        pc.extract_regex(t["url"], r"^https?://(?P<host>[^/]+)"), "host"
    )
    t2 = t.append_column("host", host)
    nested = nest_hierarchy(
        ray.data.from_arrow(t2),
        levels=[
            dict(key_col="url", order_col="mention_idx",
                 payload_cols=["mention_idx", "lat", "lon", "admin_id"],
                 list_col="mentions", carry_cols=["host"]),
            dict(key_col="host", order_col="url",
                 payload_cols=["url", "mentions"], list_col="pages"),
        ],
    )
    # depth-2 structure: list<struct<url, mentions: list<struct<...>>>>
    nt = pa.concat_tables(
        [x for x in ray.get(nested.to_arrow_refs()) if x.num_rows]
    )
    pages_t = nt["pages"].type
    assert pa.types.is_list(pages_t) and pa.types.is_struct(pages_t.value_type)
    inner = pages_t.value_type.field("mentions").type
    assert pa.types.is_list(inner) and pa.types.is_struct(inner.value_type)

    flat1 = explode_list(nested, key_cols=["host"], list_col="pages")
    flat = explode_list(flat1, key_cols=["host", "url"], list_col="mentions")
    tabs = [x for x in ray.get(flat.to_arrow_refs()) if x.num_rows]
    got = _canon(pa.concat_tables(tabs).select(t2.column_names))
    assert got.equals(_canon(t2))


def test_nest_hierarchy_depth_cap():
    import pytest

    from core_ray.stages.nest import MAX_NEST_DEPTH, nest_hierarchy

    with pytest.raises(ValueError):
        nest_hierarchy(None, levels=[{}] * (MAX_NEST_DEPTH + 1))
