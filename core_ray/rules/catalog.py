"""Derivation-rule catalog: the breadth analog of the reference's 22
framework strategies (SURVEY.md §2.9, each strategies/*/definition.go =
{matchers, parser, priority}). Every rule here is a named, prioritized,
batch-vectorized coordinate matcher with its own trigger pattern and decode
semantics, registered exactly like the built-ins:

| rule          | priority    | signal                                        |
|---------------|-------------|-----------------------------------------------|
| iso6709       | Specialized | ISO 6709 degree string '+DD.D+DDD.D/' in text |
| latlon-qs     | Specialized | 'lat=..&lon=..' URL query parameters          |
| map-url       | Specialized | '@lat,lon' coordinates embedded in the URL    |
| text-mention  | Specialized | built-in (geo URI / DMS / decimal pair)       |
| geohash       | E2E         | 'geohash:<base32>' token in text              |
| maidenhead    | E2E         | 'grid <locator>' ham-radio grid square        |
| mgrs          | E2E         | 'MGRS <grid reference>' token in text         |
| pluscode      | E2E         | full Open Location Code in text               |
| tile-url      | E2E         | '/tiles/z/x/y' slippy-map path in the URL     |
| utm           | E2E         | 'UTM <zone><hemi> <easting> <northing>'       |
| airport       | Generic     | '<IATA> Airport' vs broadcast airport table   |
| gazetteer     | Generic     | 'in <City>' vs broadcast gazetteer table      |
| host-geoip    | Generic     | built-in (URL host vs broadcast geo-IP table) |

Priorities encode signal strength exactly like the reference's constants
(Specialized=explicit coordinates beat E2E=encoded coordinates beat
Generic=place-name/host heuristics). Within a class the registry's
name-ascending order applies (so 'airport' < 'gazetteer' < 'host-geoip').

The catalog is OPT-IN (``full_registry()``): the default registry keeps the
two built-ins so golden outputs stay pinned; pipelines choose the wide
catalog explicitly (PipelineConfig/registry argument), mirroring the
reference's selective blank-import activation (strategies/all/all.go).

Broadcast side tables ride the Geocoder's ``state`` dict: rules that need
one (airport, gazetteer) read ``state['airports']`` / ``state['gazetteer']``
(plain ``{name: (lat, lon)}`` dicts, ray.put once, resolved per actor) and
fall through when the table is absent.
"""

from __future__ import annotations

import re

from core_ray.geo.codes import (
    geohash_decode,
    iso6709_decode,
    maidenhead_decode,
    mgrs_decode,
    pluscode_decode,
    tile_center,
    utm_to_lonlat,
)
from core_ray.registry import (
    PRIORITY_E2E,
    PRIORITY_GENERIC,
    PRIORITY_SPECIALIZED,
    DerivationRule,
    default_registry,
)

# compiled once at import; pinned per actor through the rule closure (ST1)
_MAP_URL_RE = re.compile(r"@(-?\d{1,2}\.\d+),(-?\d{1,3}\.\d+)")
_GEOHASH_RE = re.compile(r"\bgeohash:([0-9bcdefghjkmnpqrstuvwxyz]{4,12})\b")
_PLUSCODE_RE = re.compile(r"\b([23456789CFGHJMPQRVWX]{8}\+[23456789CFGHJMPQRVWX]{2,7})\b")
_UTM_RE = re.compile(r"\bUTM\s+(\d{1,2})([NS])\s+(\d{1,7}(?:\.\d+)?)\s+(\d{1,8}(?:\.\d+)?)\b")
_MGRS_RE = re.compile(r"\bMGRS\s+(\d{1,2}[C-HJ-NP-X][A-HJ-NP-Z]{2}\d{2,10})\b")
_AIRPORT_RE = re.compile(r"\b([A-Z]{3})\s+[Aa]irport\b")
_GAZETTEER_RE = re.compile(r"\bin\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)?)\b")
_ISO6709_RE = re.compile(r"([+-]\d{2}(?:\.\d+)?[+-]\d{3}(?:\.\d+)?/)")
_LATLON_QS_RE = re.compile(
    r"[?&]lat(?:itude)?=(-?\d{1,2}(?:\.\d+)?)&l(?:on|ng)(?:gitude)?=(-?\d{1,3}(?:\.\d+)?)"
)
_MAIDENHEAD_RE = re.compile(r"\bgrid\s+([A-R]{2}\d{2}(?:[a-xA-X]{2}(?:\d{2})?)?)\b")
_TILE_URL_RE = re.compile(r"/tiles?/(\d{1,2})/(\d{1,7})/(\d{1,7})(?:\b|\.)")

_LAT_OK = lambda la: -90.0 <= la <= 90.0  # noqa: E731
_LON_OK = lambda lo: -180.0 <= lo <= 180.0  # noqa: E731


def _match_map_url(urls, texts, state):
    out = []
    for u in urls:
        coords = [
            (float(m.group(1)), float(m.group(2)))
            for m in _MAP_URL_RE.finditer(u)
        ]
        coords = [(la, lo) for la, lo in coords if _LAT_OK(la) and _LON_OK(lo)]
        out.append(coords or None)
    return out


def _match_geohash(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _GEOHASH_RE.finditer(t):
            dec = geohash_decode(m.group(1))
            if dec is not None:
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_pluscode(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _PLUSCODE_RE.finditer(t):
            dec = pluscode_decode(m.group(1))
            if dec is not None and _LAT_OK(dec[0]) and _LON_OK(dec[1]):
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_mgrs(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _MGRS_RE.finditer(t):
            dec = mgrs_decode(m.group(1))
            if dec is not None:
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_utm(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _UTM_RE.finditer(t):
            dec = utm_to_lonlat(
                int(m.group(1)), m.group(2), float(m.group(3)), float(m.group(4))
            )
            if dec is not None and _LAT_OK(dec[0]) and _LON_OK(dec[1]):
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_airport(urls, texts, state):
    table = state.get("airports")
    if not table:
        return [None] * len(texts)
    out = []
    for t in texts:
        coords = []
        for m in _AIRPORT_RE.finditer(t):
            hit = table.get(m.group(1))
            if hit is not None:
                coords.append(hit)
        out.append(coords or None)
    return out


def _match_gazetteer(urls, texts, state):
    table = state.get("gazetteer")
    if not table:
        return [None] * len(texts)
    out = []
    for t in texts:
        coords = []
        for m in _GAZETTEER_RE.finditer(t):
            hit = table.get(m.group(1))
            if hit is not None:
                coords.append(hit)
        out.append(coords or None)
    return out


def _match_iso6709(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _ISO6709_RE.finditer(t):
            dec = iso6709_decode(m.group(1))
            if dec is not None:
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_latlon_qs(urls, texts, state):
    out = []
    for u in urls:
        coords = [
            (float(m.group(1)), float(m.group(2)))
            for m in _LATLON_QS_RE.finditer(u)
        ]
        coords = [(la, lo) for la, lo in coords if _LAT_OK(la) and _LON_OK(lo)]
        out.append(coords or None)
    return out


def _match_maidenhead(urls, texts, state):
    out = []
    for t in texts:
        coords = []
        for m in _MAIDENHEAD_RE.finditer(t):
            dec = maidenhead_decode(m.group(1))
            if dec is not None:
                coords.append(dec)
        out.append(coords or None)
    return out


def _match_tile_url(urls, texts, state):
    out = []
    for u in urls:
        coords = []
        for m in _TILE_URL_RE.finditer(u):
            dec = tile_center(int(m.group(1)), int(m.group(2)), int(m.group(3)))
            if dec is not None:
                coords.append(dec)
        out.append(coords or None)
    return out


CATALOG_RULES = [
    DerivationRule("iso6709", PRIORITY_SPECIALIZED, _match_iso6709),
    DerivationRule("latlon-qs", PRIORITY_SPECIALIZED, _match_latlon_qs),
    DerivationRule("map-url", PRIORITY_SPECIALIZED, _match_map_url),
    DerivationRule("geohash", PRIORITY_E2E, _match_geohash),
    DerivationRule("maidenhead", PRIORITY_E2E, _match_maidenhead),
    DerivationRule("mgrs", PRIORITY_E2E, _match_mgrs),
    DerivationRule("pluscode", PRIORITY_E2E, _match_pluscode),
    DerivationRule("tile-url", PRIORITY_E2E, _match_tile_url),
    DerivationRule("utm", PRIORITY_E2E, _match_utm),
    DerivationRule("airport", PRIORITY_GENERIC, _match_airport),
    DerivationRule("gazetteer", PRIORITY_GENERIC, _match_gazetteer),
]


def full_registry():
    """default cascade + the whole catalog (the strategies/all/all.go
    activation pattern: import everything, select by registration)."""
    reg = default_registry()
    for r in CATALOG_RULES:
        reg.register(r)
    return reg
