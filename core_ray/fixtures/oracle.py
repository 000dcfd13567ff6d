"""Slow, obviously-correct pure-Python oracle for the flagship pipeline.

Computes the golden outputs of FIXTURES.md §4 serially over in-memory pyarrow
tables — no Ray. The Ray pipeline (core_ray/pipelines/flagship.py) must match
these exactly (counts, key sets both directions, values), mirroring the
reference's golden-snapshot comparison discipline
(tests/integration/snapshot.go:216-276).

Spec decisions the oracle encodes (and the engine must reproduce):
- dedup: exact, by url, first occurrence wins (duplicate rows are
  byte-identical so any-wins is equivalent; we still define first-wins).
- geocode cascade, early-return (M3 analog): text mentions -> host geo-IP ->
  no-signal error row. Every mention = one row (mention_idx 0..n-1, document
  order); host-derived = exactly one row (mention_idx = 0).
- cells: hex res 7 (hexgrid), s2 level 12.
- pip winner: deepest admin level; ties broken by lexicographically smallest
  admin_id (detector.go:176-183 analog). No hit -> admin_id None, level -1.
- kNN: k=5, euclidean distance in degree space, candidates = points whose hex
  cell is within ring-1 of the query's cell; ties by (dist, url, mention_idx);
  self excluded.
- tiles: web-mercator z in {7, 9, 12}; page_count = distinct urls,
  mention_count = rows; coarser z = exact rollup of z12 (integer shift).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa

from core_ray.geo import coords, geometry, hexgrid, mercator, s2, wkt

KNN_K = 5
HEX_RES = 7
S2_LEVEL = 12
TILE_ZOOMS = (7, 9, 12)


@dataclass
class GoldenOutputs:
    joined: list[dict] = field(default_factory=list)       # golden_joined rows
    tiles: dict[tuple[int, int, int], tuple[int, int]] = field(default_factory=dict)
    knn: list[dict] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)       # (url, phase, reason)
    stats: dict = field(default_factory=dict)
    text_hashes: dict[str, str] = field(default_factory=dict)


def host_of(url: str) -> str:
    return urlparse(url).netloc


def golden_knn_vectorized(joined: list[dict], k: int = KNN_K) -> list[dict]:
    """Same kNN semantics as compute_golden's pure-Python pass (ring-1
    candidates, euclidean-in-degrees, (dist, url, mention_idx) tie-break,
    self excluded) but vectorized per query row — usable at the 20k-page
    driver-golden scale where the O(n·cand) Python loop is too slow.
    Verified equivalent to the slow pass by tests/test_flagship.py's corpus
    (both derive from the same joined rows)."""
    n = len(joined)
    if n == 0:
        return []
    urls = np.asarray([r["url"] for r in joined])
    midx = np.asarray([r["mention_idx"] for r in joined], dtype=np.int64)
    lat = np.asarray([r["lat"] for r in joined], dtype=np.float64)
    lon = np.asarray([r["lon"] for r in joined], dtype=np.float64)
    hexc = np.asarray([r["hex_cell"] for r in joined], dtype=np.uint64)

    by_cell: dict[int, list[int]] = {}
    for i in range(n):
        by_cell.setdefault(int(hexc[i]), []).append(i)
    cell_members = {c: np.asarray(v, dtype=np.int64) for c, v in by_cell.items()}
    ring_cache: dict[int, np.ndarray] = {}

    out = []
    for i in range(n):
        c = int(hexc[i])
        cand = ring_cache.get(c)
        if cand is None:
            parts = [cell_members[rc] for rc in hexgrid.kring(c, 1) if rc in cell_members]
            cand = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
            ring_cache[c] = cand
        cand_i = cand[cand != i]
        if len(cand_i) == 0:
            continue
        d = np.hypot(lat[i] - lat[cand_i], lon[i] - lon[cand_i])
        sel = np.lexsort((midx[cand_i], urls[cand_i], d))[:k]
        for rank, j_local in enumerate(sel):
            j = cand_i[j_local]
            out.append(
                {
                    "url": urls[i],
                    "mention_idx": int(midx[i]),
                    "neighbor_url": urls[j],
                    "neighbor_mention_idx": int(midx[j]),
                    "rank": rank,
                    "dist": float(d[j_local]),
                }
            )
    return out


def compute_golden(
    pages: pa.Table,
    admin_polygons: pa.Table,
    geoip: pa.Table,
    max_html_bytes: int | None = None,
    with_knn: bool = True,
) -> GoldenOutputs:
    """``max_html_bytes``: the MaxFileSize analog — pages whose html exceeds
    it are excluded from geocoding and appear as (phase='extract',
    reason='max-html-bytes') error rows, mirroring stages/extract.py.
    ``with_knn=False`` skips the O(n·candidates) pure-Python kNN pass (used
    when deriving the 20k-page driver golden, where only joined/tiles/errors
    are needed)."""
    out = GoldenOutputs()
    import hashlib

    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()
    html_sizes = (
        [len(h) for h in pages["html"].to_pylist()] if max_html_bytes is not None else None
    )

    # --- dedup (first-wins by url) ---
    seen: set[str] = set()
    keep: list[int] = []
    for i, u in enumerate(urls):
        if u not in seen:
            seen.add(u)
            keep.append(i)
    out.stats["rows_in"] = len(urls)
    out.stats["dedup_removed"] = len(urls) - len(keep)

    for i in keep:
        out.text_hashes[urls[i]] = hashlib.sha256(texts[i].encode("utf-8")).hexdigest()

    geoip_map = {
        h: (la, lo)
        for h, la, lo in zip(
            geoip["host"].to_pylist(), geoip["lat"].to_pylist(), geoip["lon"].to_pylist()
        )
    }

    # --- geocode cascade ---
    rows = []  # (url, source, mention_idx, lat, lon)
    src_hist = {"text-mention": 0, "host-geoip": 0}
    n_oversize = 0
    for i in keep:
        u, t = urls[i], texts[i]
        if html_sizes is not None and html_sizes[i] > max_html_bytes:
            out.errors.append({"url": u, "phase": "extract", "reason": "max-html-bytes"})
            n_oversize += 1
            continue
        mentions = coords.extract_mentions(t)
        if mentions:
            for j, (la, lo) in enumerate(mentions):
                rows.append((u, "text-mention", j, la, lo))
            src_hist["text-mention"] += 1
        else:
            hit = geoip_map.get(host_of(u))
            if hit is not None:
                rows.append((u, "host-geoip", 0, hit[0], hit[1]))
                src_hist["host-geoip"] += 1
            else:
                out.errors.append({"url": u, "phase": "geocode", "reason": "no-geo-signal"})
    out.stats["pages_deduped"] = len(keep)
    out.stats["derivation_source_hist"] = src_hist
    out.stats["pages_oversize"] = n_oversize
    out.stats["rows_no_signal"] = sum(1 for e in out.errors if e["phase"] == "geocode")
    out.stats["rows_geocoded"] = len(rows)

    # --- cells ---
    lat = np.array([r[3] for r in rows])
    lon = np.array([r[4] for r in rows])
    hexc = hexgrid.lonlat_to_cell(lon, lat, HEX_RES) if len(rows) else np.array([], dtype=np.uint64)
    s2c = s2.lonlat_to_cell(lon, lat, S2_LEVEL) if len(rows) else np.array([], dtype=np.uint64)

    # --- pip: deepest level wins, ties lexicographic by admin_id ---
    polys = []
    for aid, lvl, wkt_text in zip(
        admin_polygons["admin_id"].to_pylist(),
        admin_polygons["level"].to_pylist(),
        admin_polygons["wkt"].to_pylist(),
    ):
        for part in wkt.parse_wkt(wkt_text):
            polys.append((aid, lvl, part))
    admin_ids: list[str | None] = [None] * len(rows)
    admin_levels = [-1] * len(rows)
    if len(rows):
        for aid, lvl, poly in polys:
            inside = geometry.points_in_polygon(lon, lat, poly)
            for idx in np.nonzero(inside)[0]:
                cur_lvl, cur_aid = admin_levels[idx], admin_ids[idx]
                if lvl > cur_lvl or (lvl == cur_lvl and (cur_aid is None or aid < cur_aid)):
                    admin_levels[idx] = lvl
                    admin_ids[idx] = aid

    for ridx, (u, srcname, j, la, lo) in enumerate(rows):
        out.joined.append(
            {
                "url": u,
                "derivation_source": srcname,
                "mention_idx": j,
                "lat": la,
                "lon": lo,
                "hex_cell": int(hexc[ridx]),
                "s2_cell": int(s2c[ridx]),
                "admin_id": admin_ids[ridx],
                "admin_level": admin_levels[ridx],
            }
        )

    # --- kNN (k=5, ring-1 candidates, euclidean in degrees) ---
    by_cell: dict[int, list[int]] = {}
    knn_rows = range(len(rows)) if with_knn else range(0)
    for ridx in knn_rows:
        by_cell.setdefault(int(hexc[ridx]), []).append(ridx)
    for ridx in knn_rows:
        u, srcname, j, la, lo = rows[ridx]
        cand: list[int] = []
        for c in hexgrid.kring(int(hexc[ridx]), 1):
            cand.extend(by_cell.get(c, []))
        scored = []
        for cidx in cand:
            if cidx == ridx:
                continue
            cu, _, cj, cla, clo = rows[cidx]
            d = math.hypot(la - cla, lo - clo)
            scored.append((d, cu, cj))
        scored.sort()
        for rank, (d, cu, cj) in enumerate(scored[:KNN_K]):
            out.knn.append(
                {
                    "url": u,
                    "mention_idx": j,
                    "neighbor_url": cu,
                    "neighbor_mention_idx": cj,
                    "rank": rank,
                    "dist": d,
                }
            )

    # --- tiles (z12 exact, coarser = rollup) ---
    if len(rows):
        x12, y12 = mercator.lonlat_to_tile(lon, lat, 12)
        z12: dict[tuple[int, int], tuple[set, int]] = {}
        for ridx, (u, *_rest) in enumerate(rows):
            key = (int(x12[ridx]), int(y12[ridx]))
            if key not in z12:
                z12[key] = (set(), 0)
            us, mc = z12[key]
            us.add(u)
            z12[key] = (us, mc + 1)
        for z in TILE_ZOOMS:
            dz = 12 - z
            agg: dict[tuple[int, int], tuple[set, int]] = {}
            for (x, y), (us, mc) in z12.items():
                key = (x >> dz, y >> dz)
                if key not in agg:
                    agg[key] = (set(), 0)
                aus, amc = agg[key]
                aus |= us
                agg[key] = (aus, amc + mc)
            for (x, y), (us, mc) in agg.items():
                out.tiles[(z, x, y)] = (len(us), mc)
    return out
