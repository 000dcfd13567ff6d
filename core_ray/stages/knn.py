"""Per-cell kNN self-join with ring-1 neighbor expansion and salted hot cells.

The large-to-large join the reference has no analog for (SURVEY.md §2.5): a
groupby-shuffle by hex cell. Semantics (matched exactly by the fixture
oracle, core_ray/fixtures/oracle.py):

  for each geocoded point: the k nearest OTHER points (euclidean in degree
  space) among points whose hex cell is within ring-1 of the query's cell;
  ties broken by (dist, neighbor url, neighbor mention_idx).

Partitioning design:
- every point is emitted once as a QUERY into its home cell, and as a
  CANDIDATE into its home cell + 6 ring-1 neighbors (k-ring duplication fixes
  the cell-boundary edge effect, SURVEY.md §7.3). Ring-1 symmetry makes the
  per-group computation exact: candidates in group c = all p with
  c ∈ ring1(p) ⟺ p ∈ ring1(c).
- SKEW (mega-city hot cells): a first cheap pass counts rows per cell
  (groupby + count on two uint64/int columns only). Cells above
  ``hot_threshold`` are salted: their queries hash-partition into
  ceil(n/salt_target) sub-groups; candidates targeting a hot cell are
  replicated into every sub-group. Group key = (knn_cell, salt).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from core_ray.geo import hexgrid

_KNN_COLS = ["url", "mention_idx", "lat", "lon", "hex_cell"]


def _count_cells(ds) -> dict[int, int]:
    """Rows per hex cell (small result: #distinct cells)."""
    counts = ds.select_columns(["hex_cell"]).groupby("hex_cell").count()
    out: dict[int, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for cell, cnt in zip(b["hex_cell"].to_pylist(), b["count()"].to_pylist()):
            out[int(cell)] = int(cnt)
    return out


class _Expand:
    """map_batches UDF: emit query + candidate rows keyed by (knn_cell, salt)."""

    def __init__(self, salts_ref):
        import ray

        # {cell: n_salt_buckets} for hot cells only (broadcast small side)
        self.salts: dict[int, int] = ray.get(salts_ref) if salts_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = batch["hex_cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        urls = batch["url"].to_pylist()
        midx = batch["mention_idx"].to_numpy(zero_copy_only=False)
        n = len(cells)
        nbrs = hexgrid.neighbors(cells)  # (n, 6)
        targets = np.concatenate([cells[:, None], nbrs], axis=1)  # (n, 7); col 0 = home

        import zlib

        salts = self.salts
        out_idx, out_cell, out_salt, out_q = [], [], [], []
        for i in range(n):
            # deterministic hash (Python's str hash is per-process randomized)
            h = zlib.crc32(f"{urls[i]}#{int(midx[i])}".encode())
            for t in range(7):
                tc = int(targets[i, t])
                s_n = salts.get(tc, 1)
                if t == 0:
                    # query (and candidate) in home cell: single salt bucket
                    out_idx.append(i)
                    out_cell.append(tc)
                    out_salt.append(h % s_n)
                    out_q.append(True)
                    if s_n > 1:
                        for s in range(s_n):
                            if s != h % s_n:
                                out_idx.append(i)
                                out_cell.append(tc)
                                out_salt.append(s)
                                out_q.append(False)
                else:
                    for s in range(s_n):
                        out_idx.append(i)
                        out_cell.append(tc)
                        out_salt.append(s)
                        out_q.append(False)
        take = pa.array(np.asarray(out_idx, dtype=np.int64))
        out = batch.select(_KNN_COLS).take(take)
        return out.append_column(
            "knn_cell", pa.array(np.asarray(out_cell, dtype=np.uint64), pa.uint64())
        ).append_column(
            "salt", pa.array(np.asarray(out_salt, dtype=np.int32), pa.int32())
        ).append_column("is_query", pa.array(out_q, pa.bool_()))


def _knn_group(group: pa.Table, k: int) -> pa.Table:
    lat = group["lat"].to_numpy(zero_copy_only=False)
    lon = group["lon"].to_numpy(zero_copy_only=False)
    urls = np.asarray(group["url"].to_pylist())  # <U dtype: lexsort-safe
    midx = group["mention_idx"].to_numpy(zero_copy_only=False)
    is_q = group["is_query"].to_numpy(zero_copy_only=False)
    # candidates may appear multiple times when salted (query row is also a
    # candidate); dedupe candidates by (url, mention_idx)
    keys = [(u, int(m)) for u, m in zip(urls, midx)]
    seen: dict[tuple, int] = {}
    cand_rows = []
    for i, key in enumerate(keys):
        if key not in seen:
            seen[key] = i
            cand_rows.append(i)
    cand = np.asarray(cand_rows, dtype=np.int64)
    c_lat, c_lon = lat[cand], lon[cand]
    c_url, c_midx = urls[cand], midx[cand]

    q_rows = np.nonzero(is_q)[0]
    out = {
        "url": [], "mention_idx": [], "neighbor_url": [],
        "neighbor_mention_idx": [], "rank": [], "dist": [],
    }
    for qi in q_rows:
        d = np.hypot(lat[qi] - c_lat, lon[qi] - c_lon)
        self_mask = (c_url == urls[qi]) & (c_midx == midx[qi])
        d = np.where(self_mask, np.inf, d)
        order = np.lexsort((c_midx, c_url, d))
        top = order[: min(k, int(np.isfinite(d).sum()))]
        for rank, ci in enumerate(top):
            out["url"].append(urls[qi])
            out["mention_idx"].append(int(midx[qi]))
            out["neighbor_url"].append(c_url[ci])
            out["neighbor_mention_idx"].append(int(c_midx[ci]))
            out["rank"].append(rank)
            out["dist"].append(float(d[ci]))
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "mention_idx": pa.array(out["mention_idx"], pa.int32()),
            "neighbor_url": pa.array(out["neighbor_url"], pa.string()),
            "neighbor_mention_idx": pa.array(out["neighbor_mention_idx"], pa.int32()),
            "rank": pa.array(out["rank"], pa.int32()),
            "dist": pa.array(out["dist"], pa.float64()),
        }
    )


def knn_per_cell(ds, k: int = 5, hot_threshold: int = 4000, salt_target: int = 2000):
    """Dataset[joined rows] -> Dataset[(url, mention_idx, neighbor_url,
    neighbor_mention_idx, rank, dist)].

    Two-pass: cheap cell-count pass for hot-cell detection, then the salted
    expansion + (knn_cell, salt) groupby.
    """
    import math

    import ray

    cell_counts = _count_cells(ds)
    hot = {
        c: math.ceil(n / salt_target)
        for c, n in cell_counts.items()
        if n > hot_threshold
    }
    salts_ref = ray.put(hot) if hot else None
    expanded = ds.map_batches(
        _Expand,
        fn_constructor_args=(salts_ref,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return expanded.groupby(["knn_cell", "salt"]).map_groups(
        lambda g: _knn_group(g, k), batch_format="pyarrow"
    )
