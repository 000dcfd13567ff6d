"""Coordinate-mention extraction from page text.

The geo analog of the reference's import-extraction stage (SURVEY.md §2.2 M8,
pkg/parser/detection/extraction/*.go): a compiled-regex battery run per
document, feeding stage 1 of the derivation cascade. Compiled once per actor
(__init__), applied per batch.

Mention spec (we own it; mirrored by the fixture generator and oracle):
  1. geo URI      ``geo:12.3456,-78.9012``  (any number of decimals)
  2. DMS pair     ``12°20'44"N 78°54'4"W``  (degrees°minutes'seconds" + hemi)
  3. decimal pair ``12.3456, -78.9012``     (BOTH numbers need >= 3 decimal
     digits — rejects prices/dates/version numbers per FIXTURES.md §5)

Counting policy (SURVEY.md §7.3, the ADR-02 analog): every mention = one
output row, scanned left-to-right with a 0-based mention_idx; out-of-range
values are skipped silently (they are not coordinates).
"""

from __future__ import annotations

import re

_GEO_URI = r"geo:(-?\d{1,2}(?:\.\d+)?),(-?\d{1,3}(?:\.\d+)?)"
_DMS = (
    r"(\d{1,2})°(\d{1,2})'(\d{1,2}(?:\.\d+)?)\"([NS])\s+"
    r"(\d{1,3})°(\d{1,2})'(\d{1,2}(?:\.\d+)?)\"([EW])"
)
_DEC_PAIR = r"(?<![\d.\-])(-?\d{1,2}\.\d{3,})\s*,\s*(-?\d{1,3}\.\d{3,})(?![\d.])"

MENTION_RE = re.compile(f"(?:{_GEO_URI})|(?:{_DMS})|(?:{_DEC_PAIR})")


def _dms_to_deg(d: str, m: str, s: str, hemi: str) -> float:
    val = float(d) + float(m) / 60.0 + float(s) / 3600.0
    return -val if hemi in ("S", "W") else val


def extract_mentions(text: str) -> list[tuple[float, float]]:
    """All coordinate mentions in ``text``, in document order: [(lat, lon)]."""
    out: list[tuple[float, float]] = []
    for m in MENTION_RE.finditer(text):
        g = m.groups()
        if g[0] is not None:  # geo URI
            lat, lon = float(g[0]), float(g[1])
        elif g[2] is not None:  # DMS
            lat = _dms_to_deg(g[2], g[3], g[4], g[5])
            lon = _dms_to_deg(g[6], g[7], g[8], g[9])
        else:  # decimal pair
            lat, lon = float(g[10]), float(g[11])
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0:
            out.append((lat, lon))
    return out
