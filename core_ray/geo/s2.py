"""S2 cell IDs from lat/lng, vectorized in numpy.

From-scratch implementation of the published S2 geometry cell-id scheme
(cube-face projection + quadratic s/t transform + Hilbert curve ordering),
following the publicly documented algorithm (s2geometry.io docs / the
open-source s2geometry design). No external s2 library exists in this
environment; correctness is established by property tests
(tests/test_s2.py): encode/decode round-trips, parent-prefix containment
across levels, face coverage, and locality of neighboring points.

Plays the ST1 role from SURVEY.md §2.4: the compiled encoder state an actor
pool would hold once per worker (here: small numpy lookup tables, built at
import).

Cell-id layout (standard S2): 3 face bits, 2*level Hilbert position bits,
then a trailing 1 bit marking the level; 64-bit unsigned.
"""

from __future__ import annotations

import numpy as np

SWAP_MASK = 0x01
INVERT_MASK = 0x02
MAX_LEVEL = 30

# Canonical Hilbert sub-cell traversal tables (public s2geometry constants).
# POS_TO_IJ[orientation][pos] = ij  (i bit << 1 | j bit)
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order: (0,0), (0,1), (1,1), (1,0)
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # bits inverted
        [3, 1, 0, 2],  # swapped & inverted
    ],
    dtype=np.int64,
)
# IJ_TO_POS[orientation][ij] = pos  (inverse of POS_TO_IJ per row)
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _p]] = _p
POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK], dtype=np.int64
)


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Degrees -> unit sphere vector."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Largest-|component| cube-face projection -> (face 0..5, u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # Per-face (u, v) axes, per the published ValidFaceXYZtoUV mapping.
    # Sign check (esp. faces 4/5, whose v-axis sign is a common transcription
    # trap): the published kFaceUVWAxes table gives face 4 axes
    # u=(0,0,-1) v=(1,0,0) w=(0,-1,0), i.e. xyz = (v, -1, -u) — recovering
    # v from xyz therefore REQUIRES v = -x/y (and -x/z on face 5); the
    # inverse in cell_to_center_lonlat uses that same axes table, and the
    # round-trip property tests pin the pair together.
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x),      # +x
            (lambda x, y, z: -x / y, lambda x, y, z: z / y),     # +y
            (lambda x, y, z: -x / z, lambda x, y, z: -y / z),    # +z
            (lambda x, y, z: z / x, lambda x, y, z: y / x),      # -x
            (lambda x, y, z: z / y, lambda x, y, z: -x / y),     # -y
            (lambda x, y, z: -y / z, lambda x, y, z: -x / z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            u[m] = ufn(x[m], y[m], z[m])
            v[m] = vfn(x[m], y[m], z[m])
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the s2 default): minimizes area distortion."""
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0.0, pos, neg)


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    return np.clip(np.floor(s * n), 0, n - 1).astype(np.int64)


def face_ij_to_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert-curve position of cell (i, j) on ``face`` at ``level``.

    Vectorized bit-by-bit descent (level iterations of fancy indexing) instead
    of the 4-bit lookup-table variant — identical output, trivially correct.
    """
    orientation = (face & SWAP_MASK).astype(np.int64)
    pos = np.zeros(face.shape, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        digit = IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | digit.astype(np.uint64)
        orientation = orientation ^ POS_TO_ORIENTATION[digit]
    return pos


def pos_to_face_ij(face: np.ndarray, pos: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of face_ij_to_pos (for cell centers / tests)."""
    orientation = (face & SWAP_MASK).astype(np.int64)
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    for k in range(level - 1, -1, -1):
        digit = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = POS_TO_IJ[orientation, digit]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation = orientation ^ POS_TO_ORIENTATION[digit]
    return i, j


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, level: int = 12) -> np.ndarray:
    """Vectorized lon/lat (degrees) -> uint64 S2 cell id at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    x, y, z = lonlat_to_xyz(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(uv_to_st(u), level)
    j = _st_to_ij(uv_to_st(v), level)
    pos = face_ij_to_pos(face, i, j, level)
    shift = np.uint64(61 - 2 * level)
    return (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos << shift)
        | (np.uint64(1) << (shift - np.uint64(1)))
    )


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the trailing-one bit position."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    # lsb = 1 << (60 - 2*level)  =>  level = (60 - log2(lsb)) / 2
    log2 = np.zeros(cell.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        log2 += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return (60 - log2) // 2


def cell_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor of ``cell`` at coarser ``level`` (prefix truncation)."""
    cell = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(60 - 2 * level)
    return (cell & (~(new_lsb + (new_lsb - np.uint64(1))) + np.uint64(1))) | new_lsb


def cell_to_center_lonlat(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lon, lat) of the cell center, degrees (for tests/rollups)."""
    cell = np.asarray(cell, dtype=np.uint64)
    level = cell_level(cell)
    if not (level == level.flat[0]).all():
        raise ValueError("mixed levels not supported")
    lvl = int(level.flat[0])
    face = (cell >> np.uint64(61)).astype(np.int64)
    shift = np.uint64(61 - 2 * lvl)
    pos = (cell >> shift) & ((np.uint64(1) << np.uint64(2 * lvl)) - np.uint64(1))
    i, j = pos_to_face_ij(face, pos, lvl)
    n = float(1 << lvl)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u, v = st_to_uv(s), st_to_uv(t)
    # face uvw axes -> xyz (inverse of xyz_to_face_uv per face)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    face_fns = [
        lambda u, v: (np.ones_like(u), u, v),
        lambda u, v: (-u, np.ones_like(u), v),
        lambda u, v: (-u, -v, np.ones_like(u)),
        lambda u, v: (-np.ones_like(u), -v, -u),
        lambda u, v: (v, -np.ones_like(u), -u),
        lambda u, v: (v, u, -np.ones_like(u)),
    ]
    for f in range(6):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = face_fns[f](u[m], v[m])
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat
