"""Coordinate code decoders: geohash, Open Location Code (plus codes), UTM.

Published public algorithms, implemented from their specs (no library deps):

- geohash: base-32 interleaved binary subdivision (Niemeyer's public spec;
  even bit positions refine longitude, odd refine latitude when counting
  from the first bit). Decode returns the CELL CENTER.
- Open Location Code: the open published spec (base-20 digit pairs, 8+
  digits then a '+' separator; each pair refines a 20x20 grid). Decode
  returns the cell center; only full (non-shortened) codes are supported.
- UTM: standard transverse-Mercator series (Krüger series as published in
  Snyder, "Map Projections — A Working Manual", USGS PP 1395, eqs 8-9..8-25
  / the standard k0=0.9996, WGS84 ellipsoid). Accuracy of the series inverse
  is centimeter-level — far below the engine's coordinate rounding.

Each decoder is a scalar kernel used by a derivation rule (core_ray/rules);
the rules compile their trigger regexes once per actor.
"""

from __future__ import annotations

import math
import re

# ---------------- geohash ----------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_IDX = {c: i for i, c in enumerate(_GH32)}


def geohash_decode(code: str) -> tuple[float, float] | None:
    """geohash string -> (lat, lon) of the cell center; None if invalid."""
    if not code:
        return None
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True  # first bit refines longitude
    for ch in code.lower():
        idx = _GH_IDX.get(ch)
        if idx is None:
            return None
        for bit in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2.0
                if idx & bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2.0
                if idx & bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lat_lo + lat_hi) / 2.0, (lon_lo + lon_hi) / 2.0)


def geohash_encode(lat: float, lon: float, precision: int = 9) -> str:
    """Inverse of geohash_decode (used by the roundtrip tests)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    out, idx, bits = [], 0, 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2.0
            if lon >= mid:
                idx = idx * 2 + 1
                lon_lo = mid
            else:
                idx = idx * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2.0
            if lat >= mid:
                idx = idx * 2 + 1
                lat_lo = mid
            else:
                idx = idx * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GH32[idx])
            idx, bits = 0, 0
    return "".join(out)


# ---------------- Open Location Code (plus codes) ----------------

_OLC_ALPHA = "23456789CFGHJMPQRVWX"
_OLC_IDX = {c: i for i, c in enumerate(_OLC_ALPHA)}


def pluscode_decode(code: str) -> tuple[float, float] | None:
    """Full plus code (e.g. '8FVC2222+22') -> (lat, lon) cell center.

    Supports full codes only: 8 digits, '+', then 2+ more digits (the grid
    refinement beyond 10 digits uses the published 4x5 single-digit grid)."""
    code = code.strip().upper()
    if "+" not in code:
        return None
    head, tail = code.split("+", 1)
    if len(head) != 8 or any(c not in _OLC_IDX for c in head + tail[:2]):
        return None
    digits = head + tail
    lat, lon = -90.0, -180.0
    lat_res, lon_res = 400.0, 400.0  # degrees per digit-pair step pre-divide
    i = 0
    # digit pairs: each divides the cell 20x20
    while i + 1 < len(digits) and i < 10:
        lat_res /= 20.0
        lon_res /= 20.0
        lat += _OLC_IDX[digits[i]] * lat_res
        lon += _OLC_IDX[digits[i + 1]] * lon_res
        i += 2
    # grid refinement: each further digit divides the cell into the spec's
    # 4-column (lon) x 5-row (lat) grid; digit index d -> row d//4, col d%4
    for ch in digits[i:]:
        d = _OLC_IDX.get(ch)
        if d is None:
            return None
        lat_res /= 5.0
        lon_res /= 4.0
        lat += (d // 4) * lat_res
        lon += (d % 4) * lon_res
    return (lat + lat_res / 2.0, lon + lon_res / 2.0)


# ---------------- UTM (WGS84, k0 = 0.9996) ----------------

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_K0 = 0.9996
_E2 = _WGS84_F * (2.0 - _WGS84_F)  # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)  # second eccentricity squared
_E1 = (1.0 - math.sqrt(1.0 - _E2)) / (1.0 + math.sqrt(1.0 - _E2))


def utm_to_lonlat(zone: int, hemisphere: str, easting: float, northing: float
                  ) -> tuple[float, float] | None:
    """UTM -> (lat, lon) via the standard series inverse (Snyder 8-17..8-25)."""
    if not (1 <= zone <= 60) or hemisphere not in ("N", "S"):
        return None
    x = easting - 500000.0
    y = northing - (10000000.0 if hemisphere == "S" else 0.0)
    m = y / _K0
    mu = m / (_WGS84_A * (1.0 - _E2 / 4.0 - 3.0 * _E2 * _E2 / 64.0 - 5.0 * _E2**3 / 256.0))
    e1 = _E1
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0) * math.sin(2.0 * mu)
        + (21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0) * math.sin(4.0 * mu)
        + (151.0 * e1**3 / 96.0) * math.sin(6.0 * mu)
        + (1097.0 * e1**4 / 512.0) * math.sin(8.0 * mu)
    )
    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = _EP2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = _WGS84_A / math.sqrt(1.0 - _E2 * sin1 * sin1)
    r1 = _WGS84_A * (1.0 - _E2) / (1.0 - _E2 * sin1 * sin1) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d * d / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * _EP2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * _EP2 - 3.0 * c1 * c1)
        * d**6 / 720.0
    )
    lon0 = math.radians((zone - 1) * 6.0 - 180.0 + 3.0)
    lon = lon0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * _EP2 + 24.0 * t1 * t1)
        * d**5 / 120.0
    ) / cos1
    return (math.degrees(lat), math.degrees(lon))


def lonlat_to_utm(lat: float, lon: float) -> tuple[int, str, float, float]:
    """Forward UTM (Snyder 8-9..8-13) — used by the inverse roundtrip tests."""
    zone = int((lon + 180.0) // 6.0) + 1
    hemi = "N" if lat >= 0 else "S"
    phi = math.radians(lat)
    lam = math.radians(lon)
    lam0 = math.radians((zone - 1) * 6.0 - 180.0 + 3.0)
    sinp, cosp, tanp = math.sin(phi), math.cos(phi), math.tan(phi)
    n = _WGS84_A / math.sqrt(1.0 - _E2 * sinp * sinp)
    t = tanp * tanp
    c = _EP2 * cosp * cosp
    a_ = cosp * (lam - lam0)
    m = _WGS84_A * (
        (1.0 - _E2 / 4.0 - 3.0 * _E2**2 / 64.0 - 5.0 * _E2**3 / 256.0) * phi
        - (3.0 * _E2 / 8.0 + 3.0 * _E2**2 / 32.0 + 45.0 * _E2**3 / 1024.0) * math.sin(2.0 * phi)
        + (15.0 * _E2**2 / 256.0 + 45.0 * _E2**3 / 1024.0) * math.sin(4.0 * phi)
        - (35.0 * _E2**3 / 3072.0) * math.sin(6.0 * phi)
    )
    easting = _K0 * n * (
        a_
        + (1.0 - t + c) * a_**3 / 6.0
        + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * _EP2) * a_**5 / 120.0
    ) + 500000.0
    northing = _K0 * (
        m
        + n * tanp * (
            a_**2 / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c * c) * a_**4 / 24.0
            + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * _EP2) * a_**6 / 720.0
        )
    )
    if hemi == "S":
        northing += 10000000.0
    return (zone, hemi, easting, northing)


# ---------------- Maidenhead locator (ham-radio grid squares) ----------------

def maidenhead_decode(code: str) -> tuple[float, float] | None:
    """Maidenhead grid locator (4/6/8 chars) -> (lat, lon) of the CELL
    CENTER. Published scheme: field pair A-R (20 deg x 10 deg), square pair
    0-9 (2 x 1), subsquare pair a-x (5' x 2.5'), extended square pair 0-9."""
    code = code.strip()
    if len(code) not in (4, 6, 8):
        return None
    c = code.upper()
    if not ("A" <= c[0] <= "R" and "A" <= c[1] <= "R" and c[2:4].isdigit()):
        return None
    lon = (ord(c[0]) - ord("A")) * 20.0 - 180.0
    lat = (ord(c[1]) - ord("A")) * 10.0 - 90.0
    lon += int(c[2]) * 2.0
    lat += int(c[3]) * 1.0
    lon_res, lat_res = 2.0, 1.0
    if len(c) >= 6:
        if not ("A" <= c[4] <= "X" and "A" <= c[5] <= "X"):
            return None
        lon_res, lat_res = 2.0 / 24.0, 1.0 / 24.0
        lon += (ord(c[4]) - ord("A")) * lon_res
        lat += (ord(c[5]) - ord("A")) * lat_res
    if len(c) == 8:
        if not c[6:8].isdigit():
            return None
        lon_res, lat_res = lon_res / 10.0, lat_res / 10.0
        lon += int(c[6]) * lon_res
        lat += int(c[7]) * lat_res
    return (lat + lat_res / 2.0, lon + lon_res / 2.0)


# ---------------- ISO 6709 degree strings ----------------

def iso6709_decode(s: str) -> tuple[float, float] | None:
    """ISO 6709 Annex-H degree form, e.g. '+48.8577+002.2950/' ->
    (lat, lon). Sign required on both; latitude 2 integer digits, longitude
    3 (the standard's fixed-width degree representation)."""
    m = re.fullmatch(r"([+-]\d{2}(?:\.\d+)?)([+-]\d{3}(?:\.\d+)?)/?", s.strip())
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return None
    return (lat, lon)


# ---------------- slippy-map tile center ----------------

def tile_center(z: int, x: int, y: int) -> tuple[float, float] | None:
    """Web-mercator tile (z, x, y) -> (lat, lon) of the tile center
    (the published slippy-map inverse: lat = atan(sinh(pi(1 - 2n)))."""
    if z < 0 or z > 24 or not (0 <= x < (1 << z)) or not (0 <= y < (1 << z)):
        return None
    n = float(1 << z)
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y + 0.5) / n))))
    return (lat, lon)


def quadkey_decode(qk: str) -> tuple[float, float] | None:
    """Bing-maps quadkey -> (lat, lon) of the tile center. Published scheme:
    zoom = len(key); digit i carries bit (zoom-1-i) of x (low bit) and y
    (high bit). Center via the slippy inverse above."""
    z = len(qk)
    if z < 1 or z > 23:
        return None
    x = y = 0
    for i, c in enumerate(qk):
        if c not in "0123":
            return None
        d = ord(c) - ord("0")
        bit = 1 << (z - 1 - i)
        if d & 1:
            x |= bit
        if d & 2:
            y |= bit
    return tile_center(z, x, y)


def s2_token_decode(token: str) -> tuple[float, float] | None:
    """S2 cell token (cell-id hex, trailing zeros stripped — the published
    token form) -> (lat, lon) of the cell center via the repo's S2 math
    (geo/s2.py, derived from the published S2 axes table)."""
    if not token or len(token) > 16 or not re.fullmatch(r"[0-9a-f]+", token):
        return None
    cell = int(token.ljust(16, "0"), 16)
    if cell == 0:
        return None
    import numpy as np

    from core_ray.geo.s2 import MAX_LEVEL, cell_level, cell_to_center_lonlat

    # validity per the published CellId.is_valid: face in 0..5 and the
    # trailing sentinel bit at an EVEN position (0x1555... = bits 0,2,..,60)
    lsb = cell & (~cell + 1)
    if (cell >> 61) > 5 or not (lsb & 0x1555555555555555):
        return None
    arr = np.array([cell], dtype=np.uint64)
    lvl = int(cell_level(arr)[0])
    if lvl < 0 or lvl > MAX_LEVEL:
        return None
    lon, lat = cell_to_center_lonlat(arr)
    return (float(lat[0]), float(lon[0]))


# ---------------- MGRS (military grid reference system) ----------------
# From the published NGA grid scheme (the same public tables every MGRS
# implementation encodes): 8-degree latitude bands C..X (I/O skipped, X
# spans 72..84), 100 km column letters cycling A-H / J-R / S-Z by
# zone mod 3, row letters A..V (I/O skipped, 2,000 km cycle) with a
# 5-letter offset on even zones. Decode resolves the 2,000 km row
# ambiguity against the latitude band; verification is roundtrip through
# the Snyder-series UTM pair above (itself spec-tested), plus structural
# letter-table checks.

_MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"  # 8-deg bands from -80; X extends to 84
_MGRS_COLS = ("ABCDEFGH", "JKLMNPQR", "STUVWXYZ")
_MGRS_ROWS = "ABCDEFGHJKLMNPQRSTUV"  # 20 letters, 2,000 km northing cycle


def _mgrs_band_of(lat: float) -> str | None:
    if not -80.0 <= lat <= 84.0:
        return None
    return _MGRS_BANDS[min(19, int((lat + 80.0) // 8.0))]


def mgrs_encode(lat: float, lon: float, digits: int = 5) -> str | None:
    """(lat, lon) -> MGRS string with ``digits`` easting/northing digits
    (5 = 1 m grid). None outside the MGRS latitude range."""
    band = _mgrs_band_of(lat)
    if band is None or not 1 <= digits <= 5:
        return None
    zone, _, e, n = lonlat_to_utm(lat, lon)
    col = _MGRS_COLS[(zone - 1) % 3][int(e // 100000.0) - 1]
    row_off = 5 if zone % 2 == 0 else 0
    row = _MGRS_ROWS[(int(n // 100000.0) + row_off) % 20]
    cell = 10 ** (5 - digits)
    de = int((e % 100000.0) // cell)
    dn = int((n % 100000.0) // cell)
    return f"{zone}{band}{col}{row}{de:0{digits}d}{dn:0{digits}d}"


def mgrs_decode(code: str) -> tuple[float, float] | None:
    """MGRS string -> (lat, lon) of the grid cell's center. Row-letter
    northing ambiguity (2,000 km cycle) resolves against the latitude
    band; None on any malformed field."""
    s = code.strip().upper().replace(" ", "")
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    if not 1 <= i <= 2 or len(s) < i + 3:
        return None
    zone = int(s[:i])
    band, col, row = s[i], s[i + 1], s[i + 2]
    digits_s = s[i + 3:]
    if (
        not 1 <= zone <= 60
        or band not in _MGRS_BANDS
        or col not in _MGRS_COLS[(zone - 1) % 3]
        or row not in _MGRS_ROWS
        or len(digits_s) % 2 != 0
        or len(digits_s) > 10
        or (digits_s and not digits_s.isdigit())
    ):
        return None
    d = len(digits_s) // 2
    cell = 10 ** (5 - d)
    e100k = (_MGRS_COLS[(zone - 1) % 3].index(col) + 1) * 100000.0
    de = (int(digits_s[:d]) + 0.5) * cell if d else 50000.0
    easting = e100k + de

    row_off = 5 if zone % 2 == 0 else 0
    n100k = ((_MGRS_ROWS.index(row) - row_off) % 20) * 100000.0
    dn = (int(digits_s[d:]) + 0.5) * cell if d else 50000.0

    band_idx = _MGRS_BANDS.index(band)
    lat_lo = -80.0 + 8.0 * band_idx
    lat_hi = 84.0 if band == "X" else lat_lo + 8.0
    hemi = "N" if band_idx >= 10 else "S"
    # northing candidates every 2,000 km; keep the one whose latitude lands
    # in (or nearest to) the band
    best, best_gap = None, float("inf")
    for k in range(6):
        northing = n100k + dn + 2000000.0 * k
        if northing >= 10000000.0:
            break
        dec = utm_to_lonlat(zone, hemi, easting, northing)
        if dec is None:
            continue
        lat, lon = dec
        if lat_lo - 0.02 <= lat <= lat_hi + 0.02:
            return (lat, lon)
        gap = max(lat_lo - lat, lat - lat_hi)
        if gap < best_gap:
            best, best_gap = dec, gap
    # tolerate edge cells whose center drifts just outside the band
    return best if best is not None and best_gap < 0.6 else None
