"""Per-cell kNN self-join with ring-1 semantics, coarse-group partitioning,
and salted hot groups.

Semantics (matched exactly by the fixture oracle, core_ray/fixtures/oracle.py):

  for each geocoded point: the k nearest OTHER points (euclidean in degree
  space) among points whose hex cell is within ring-1 of the query's cell;
  ties broken by (dist, neighbor url, neighbor mention_idx).

Partitioning design (the large-to-large join the reference has no analog
for, SURVEY.md §2.5):

- GROUP KEY is the res-(R-2) coarse hex of the point's home-cell center
  (~49 res-R cells per group). Grouping coarser than the semantic cell cuts
  the number of Python group invocations ~49x and drops the candidate
  duplication factor from 7x (one copy per ring-1 cell) to ~1.3x (one copy
  per distinct coarse group overlapping the ring).
- a candidate is sent to every coarse group that contains any cell of
  ring1(home); a query lives in the coarse group of its home cell. Inside a
  group, each query's candidate set is masked back to exact ring-1 by hex
  distance — so coarse grouping is a pure re-partitioning, not a semantic
  change (verified: oracle equivalence tests incl. forced salting).
- SKEW (mega-city hot cells): a first cheap pass counts rows per coarse
  group (uint64 key + count only). Groups above ``hot_threshold`` are
  salted: queries hash-partition into ceil(n/salt_target) sub-groups;
  candidates targeting a hot group are replicated into every sub-group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from core_ray.geo import hexgrid

_KNN_COLS = ["url", "mention_idx", "lat", "lon", "hex_cell"]
COARSEN = 2  # group at res - COARSEN


def _group_key(cells: np.ndarray, group_res: int) -> np.ndarray:
    """Coarse key = hex at ``group_res`` containing the cell center.

    Not required to be a true hierarchy — only a deterministic cell->key map
    used identically by the query and candidate paths."""
    lon, lat = hexgrid.cell_to_center(cells)
    return hexgrid.lonlat_to_cell(lon, lat, group_res)


def _group_targets(cells: np.ndarray, group_res: int) -> np.ndarray:
    """(n, 7) coarse keys of home + ring-1 cells (duplicates kept; caller
    dedupes row-wise)."""
    nbrs = hexgrid.neighbors(cells)  # (n, 6)
    ring = np.concatenate([cells[:, None], nbrs], axis=1)  # (n, 7)
    flat = _group_key(ring.ravel(), group_res)
    return flat.reshape(len(cells), 7)


class _Expand:
    """map_batches UDF: emit query + candidate rows keyed by (knn_grp, salt)."""

    def __init__(self, salts_ref, cell_res: int):
        import ray

        if salts_ref is not None and isinstance(salts_ref, ray.ObjectRef):
            salts_ref = ray.get(salts_ref)
        self.salts: dict[int, int] = salts_ref or {}
        self.group_res = cell_res - COARSEN

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        cells = batch["hex_cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(cells)
        g7 = np.sort(_group_targets(cells, self.group_res), axis=1)  # (n, 7)
        home = _group_key(cells, self.group_res)
        # row-wise dedupe of targets: keep first of each run in the sorted row
        keep = np.ones_like(g7, dtype=bool)
        keep[:, 1:] = g7[:, 1:] != g7[:, :-1]
        is_home = g7 == home[:, None]
        # the home group is emitted via the query row; drop it from candidates
        cand_keep = keep & ~is_home

        salts = self.salts
        if salts:
            hot_keys = np.fromiter(salts.keys(), dtype=np.uint64, count=len(salts))
            touches_hot = np.isin(g7, hot_keys).any(axis=1) | np.isin(home, hot_keys)
        else:
            touches_hot = np.zeros(n, dtype=bool)

        fast = np.nonzero(~touches_hot)[0]
        # query rows (home group, salt 0)
        out_idx = [fast]
        out_grp = [home[fast]]
        out_salt = [np.zeros(len(fast), dtype=np.int32)]
        out_q = [np.ones(len(fast), dtype=bool)]
        # candidate rows (other touched groups, salt 0)
        fk = cand_keep[fast]
        rep = fk.sum(axis=1)
        out_idx.append(np.repeat(fast, rep))
        out_grp.append(g7[fast][fk])
        out_salt.append(np.zeros(int(rep.sum()), dtype=np.int32))
        out_q.append(np.zeros(int(rep.sum()), dtype=bool))

        slow = np.nonzero(touches_hot)[0]
        if len(slow):
            urls = batch["url"].to_pylist()
            midx = batch["mention_idx"].to_numpy(zero_copy_only=False)
            s_idx, s_grp, s_salt, s_q = [], [], [], []
            for i in slow:
                h = zlib.crc32(f"{urls[i]}#{int(midx[i])}".encode())
                hg = int(home[i])
                s_n = salts.get(hg, 1)
                my_salt = h % s_n
                s_idx.append(i); s_grp.append(hg); s_salt.append(my_salt); s_q.append(True)
                for s in range(s_n):
                    if s != my_salt:
                        s_idx.append(i); s_grp.append(hg); s_salt.append(s); s_q.append(False)
                for t in range(7):
                    if not cand_keep[i, t]:
                        continue
                    tg = int(g7[i, t])
                    for s in range(salts.get(tg, 1)):
                        s_idx.append(i); s_grp.append(tg); s_salt.append(s); s_q.append(False)
            out_idx.append(np.asarray(s_idx, dtype=np.int64))
            out_grp.append(np.asarray(s_grp, dtype=np.uint64))
            out_salt.append(np.asarray(s_salt, dtype=np.int32))
            out_q.append(np.asarray(s_q, dtype=bool))

        take = pa.array(np.concatenate(out_idx))
        out = batch.select(_KNN_COLS).take(take)
        return out.append_column(
            "knn_grp", pa.array(np.concatenate(out_grp).astype(np.uint64), pa.uint64())
        ).append_column(
            "salt", pa.array(np.concatenate(out_salt), pa.int32())
        ).append_column("is_query", pa.array(np.concatenate(out_q), pa.bool_()))


def _process_partition(part: pa.Table, k: int) -> pa.Table:
    """Reduce ONE hash partition holding many (knn_grp, salt) groups.

    One Python call per PARTITION (not per group): arrays are extracted once,
    groups become numpy slices, so per-group cost is raw numpy. Measured ~30x
    cheaper than groupby().map_groups(per_group_fn) at ~100k mostly-singleton
    groups (per-group pyarrow slicing + to_pylist dominated at ~1.4 ms/group).
    """
    n = part.num_rows
    if n == 0:
        return _knn_empty()
    grp = part["knn_grp"].to_numpy(zero_copy_only=False).astype(np.uint64)
    salt = part["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((salt, grp))  # exact (grp, salt) grouping — no hashing

    lat = part["lat"].to_numpy(zero_copy_only=False)[order]
    lon = part["lon"].to_numpy(zero_copy_only=False)[order]
    urls = np.asarray(part["url"].to_pylist())[order]
    midx = part["mention_idx"].to_numpy(zero_copy_only=False)[order]
    is_q = part["is_query"].to_numpy(zero_copy_only=False)[order]
    cells = part["hex_cell"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    cq, cr, _ = hexgrid.unpack(cells)
    grp, salt = grp[order], salt[order]

    # factorize (url) ONCE: np.unique codes are string-rank ordered, so
    # integer lexsorts below preserve the documented (dist, url, midx)
    # tie-break exactly while avoiding per-query string comparisons
    u_uniq, u_code = np.unique(urls, return_inverse=True)

    boundary = (np.diff(grp) != 0) | (np.diff(salt) != 0)
    bounds = np.nonzero(boundary)[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [n]])

    out_code, out_midx, out_ncode, out_nmidx, out_rank, out_dist = [], [], [], [], [], []
    for s, e in zip(starts, ends):
        if e - s == 1:
            continue  # isolated point: no ring-1 candidates were routed here
        g_lat, g_lon = lat[s:e], lon[s:e]
        g_code, g_midx = u_code[s:e], midx[s:e]
        g_cq, g_cr = cq[s:e], cr[s:e]
        q_rows = np.nonzero(is_q[s:e])[0]
        if len(q_rows) == 0:
            continue
        # ring-1 candidate mask is a function of the QUERY'S CELL — compute
        # it once per distinct cell (city cells hold many queries)
        q_ck = g_cq[q_rows] * np.int64(1 << 30) + g_cr[q_rows]
        cko = np.argsort(q_ck, kind="stable")
        q_sorted = q_rows[cko]
        ck_sorted = q_ck[cko]
        cell_bounds = np.nonzero(np.diff(ck_sorted))[0] + 1
        c_starts = np.concatenate([[0], cell_bounds])
        c_ends = np.concatenate([cell_bounds, [len(q_sorted)]])
        for cs, ce in zip(c_starts, c_ends):
            q0 = q_sorted[cs]
            dq = g_cq - g_cq[q0]
            dr = g_cr - g_cr[q0]
            ring = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) <= 2  # hexdist <= 1
            cand = np.nonzero(ring)[0]
            if len(cand) == 0:
                continue
            c_lat, c_lon = g_lat[cand], g_lon[cand]
            c_code, c_midx = g_code[cand], g_midx[cand]
            for qi in q_sorted[cs:ce]:
                d = np.hypot(g_lat[qi] - c_lat, g_lon[qi] - c_lon)
                self_mask = (c_code == g_code[qi]) & (c_midx == g_midx[qi])
                d = np.where(self_mask, np.inf, d)
                kk = min(k, int(np.isfinite(d).sum()))
                if kk == 0:
                    continue
                # narrow by distance BEFORE the tie-break sort (geo-IP rows
                # share identical coords, so distance ties are massive)
                if len(d) > kk:
                    kth = np.partition(d, kk - 1)[kk - 1]
                    sel = np.nonzero(d <= kth)[0]
                else:
                    sel = np.arange(len(d))
                o = sel[np.lexsort((c_midx[sel], c_code[sel], d[sel]))]
                top = o[:kk]
                out_code.append(np.full(kk, g_code[qi]))
                out_midx.append(np.full(kk, g_midx[qi]))
                out_ncode.append(c_code[top])
                out_nmidx.append(c_midx[top])
                out_rank.append(np.arange(kk))
                out_dist.append(d[top])
    if not out_code:
        return _knn_empty()
    return pa.table(
        {
            "url": pa.array(u_uniq[np.concatenate(out_code)], pa.string()),
            "mention_idx": pa.array(np.concatenate(out_midx).astype(np.int32), pa.int32()),
            "neighbor_url": pa.array(u_uniq[np.concatenate(out_ncode)], pa.string()),
            "neighbor_mention_idx": pa.array(np.concatenate(out_nmidx).astype(np.int32), pa.int32()),
            "rank": pa.array(np.concatenate(out_rank).astype(np.int32), pa.int32()),
            "dist": pa.array(np.concatenate(out_dist).astype(np.float64), pa.float64()),
        }
    )


def _knn_empty() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "mention_idx": pa.array([], pa.int32()),
            "neighbor_url": pa.array([], pa.string()),
            "neighbor_mention_idx": pa.array([], pa.int32()),
            "rank": pa.array([], pa.int32()),
            "dist": pa.array([], pa.float64()),
        }
    )


def _count_groups(ds, group_res: int) -> dict[int, int]:
    """Rows per coarse group (small result; shuffles only a uint64 column)."""

    def tag(b: pa.Table) -> pa.Table:
        cells = b["hex_cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"knn_grp": pa.array(_group_key(cells, group_res), pa.uint64())})

    counts = (
        ds.select_columns(["hex_cell"])
        .map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("knn_grp")
        .count()
    )
    out: dict[int, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for cell, cnt in zip(b["knn_grp"].to_pylist(), b["count()"].to_pylist()):
            out[int(cell)] = int(cnt)
    return out


def knn_per_cell(ds, k: int = 5, hot_threshold: int = 4000, salt_target: int = 2000,
                 cell_res: int = 7):
    """Dataset[joined rows] -> Dataset[(url, mention_idx, neighbor_url,
    neighbor_mention_idx, rank, dist)].

    Two-pass: cheap coarse-group count for hot detection, then the salted
    expansion + (knn_grp, salt) groupby with per-group ring-1 kNN.
    """
    import math

    import ray

    group_res = cell_res - COARSEN
    group_counts = _count_groups(ds, group_res)
    hot = {
        c: math.ceil(n / salt_target)
        for c, n in group_counts.items()
        if n > hot_threshold
    }
    salts_ref = ray.put(hot) if hot else None
    expanded = ds.map_batches(
        _Expand,
        fn_constructor_args=(salts_ref, cell_res),
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )
    # partition-level reduce: hash (knn_grp, salt) into ~4x-CPU coarse
    # partitions, then ONE Python call per partition handles all its groups
    # (see _process_partition). Salted sub-groups of a hot cell hash to
    # DIFFERENT partitions, so skew stays spread.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    n_parts = max(4 * n_cpus, 32)

    def add_part(b: pa.Table) -> pa.Table:
        g = b["knn_grp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        st = b["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (g * np.uint64(0x9E3779B97F4A7C15)) ^ (
            (st + np.uint64(1)) * np.uint64(0xBF58476D1CE4E5B9)
        )
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    return (
        expanded.map_batches(add_part, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(lambda g: _process_partition(g, k), batch_format="pyarrow")
    )
