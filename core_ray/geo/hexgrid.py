"""Hierarchical hexagonal cell index ("hex7"), vectorized in numpy.

Plays the H3-res-7 role from the north rule: a hexagonal spatial key for
grouping pages into cells, k-ring neighbor expansion for kNN edge effects, and
aperture-7 parent rollups. This is a from-scratch design — the published H3
cell-id bit layout depends on the 122-entry icosahedral base-cell tables which
cannot be reproduced from public memory nor validated here (no h3 library in
the environment), so we define an equivalent, fully documented hex index
instead of silently mislabeling:

- Pointy-top axial hex grid laid out in (lon, lat) degree space.
- Resolution r has edge length ``BASE_EDGE_DEG / sqrt(7)**r`` — the same
  aperture-7 area scaling as H3; res 7 edge ≈ 0.011° ≈ 1.2 km, matching H3
  res 7 (~1.22 km edge).
- Parent = the hex at res r-1 containing this cell's center (H3's own
  center-containment parenting; exact nesting is impossible for hexagons).
- Cell id: uint64 ``res<<58 | (q+2^28)<<29 | (r+2^28)`` (axial coords).

The partitioning assumption downstream stages rely on (documented per
SURVEY.md §2 "custom operators"): a point's k=1 ring covers every hex whose
interior can contain a neighbor within one cell radius, so per-cell kNN with
ring-1 duplication is exact for k-nearest within ``edge`` distance.
"""

from __future__ import annotations

import numpy as np

BASE_EDGE_DEG = 10.0
SQRT7 = 7.0 ** 0.5
SQRT3 = 3.0 ** 0.5
_OFF = np.uint64(1 << 28)

# Pointy-top axial neighbor offsets (ring 1).
NEIGHBOR_OFFSETS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def edge_deg(res: int) -> float:
    return BASE_EDGE_DEG / (SQRT7 ** res)


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-rounding of fractional axial coords (standard hex-grid algorithm)."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def lonlat_to_axial(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Degrees -> integer axial (q, r) at resolution ``res``."""
    size = edge_deg(res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = (SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    return _axial_round(qf, rf)


def axial_to_lonlat(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Hex center of axial (q, r) -> (lon, lat) degrees."""
    size = edge_deg(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    lon = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    lat = size * (1.5 * r)
    return lon, lat


def pack(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    qq = (np.asarray(q, dtype=np.int64) + np.int64(1 << 28)).astype(np.uint64)
    rr = (np.asarray(r, dtype=np.int64) + np.int64(1 << 28)).astype(np.uint64)
    return (np.uint64(res) << np.uint64(58)) | (qq << np.uint64(29)) | rr


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    q = ((cell >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64) - (1 << 28)
    r = (cell & np.uint64((1 << 29) - 1)).astype(np.int64) - (1 << 28)
    return q, r, res


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, res: int = 7) -> np.ndarray:
    """Vectorized lon/lat -> uint64 hex cell id at ``res``."""
    q, r = lonlat_to_axial(lon, lat, res)
    return pack(q, r, res)


def cell_to_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    q, r, res = unpack(cell)
    if res.size and not (res == res.flat[0]).all():
        raise ValueError("mixed resolutions not supported")
    return axial_to_lonlat(q, r, int(res.flat[0]) if res.size else 0)


def cell_parent(cell: np.ndarray) -> np.ndarray:
    """Hex at res-1 containing this cell's center (center-containment)."""
    q, r, res = unpack(cell)
    if res.size == 0:
        return np.asarray(cell, dtype=np.uint64)
    res0 = int(res.flat[0])
    if not (res == res0).all():
        raise ValueError("mixed resolutions not supported")
    if res0 == 0:
        raise ValueError("res 0 has no parent")
    lon, lat = axial_to_lonlat(q, r, res0)
    return lonlat_to_cell(lon, lat, res0 - 1)


def neighbors(cell: np.ndarray) -> np.ndarray:
    """Ring-1 neighbors: shape (n, 6) uint64 (excludes the cell itself)."""
    q, r, res = unpack(cell)
    res0 = int(res.flat[0]) if res.size else 0
    nq = q[:, None] + NEIGHBOR_OFFSETS[:, 0][None, :]
    nr = r[:, None] + NEIGHBOR_OFFSETS[:, 1][None, :]
    return pack(nq, nr, res0)


def kring(cell_id: int, k: int = 1) -> list[int]:
    """All cells within hex distance k of one cell (driver-side helper)."""
    q0, r0, res = unpack(np.array([cell_id], dtype=np.uint64))
    q0, r0, res = int(q0[0]), int(r0[0]), int(res[0])
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append(int(pack(np.int64(q0 + dq), np.int64(r0 + dr), res)))
    return out


def hex_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex (axial cube) distance between same-res cell ids."""
    qa, ra, _ = unpack(a)
    qb, rb, _ = unpack(b)
    dq, dr = qa - qb, ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
