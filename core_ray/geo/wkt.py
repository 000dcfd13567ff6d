"""Minimal WKT polygon parser (POLYGON / MULTIPOLYGON with holes).

Feeds the broadcast admin-polygon side of the pip-join (the ConfigScope-table
analog, reference: pkg/parser/framework/scope.go:12-30). Only the two polygon
types the fixture corpus uses are supported; anything else raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Polygon:
    """One shell ring + zero or more hole rings; rings are (n, 2) lon/lat arrays."""

    shell: np.ndarray
    holes: list[np.ndarray] = field(default_factory=list)

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        xs, ys = self.shell[:, 0], self.shell[:, 1]
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _parse_ring(text: str) -> np.ndarray:
    pts = []
    for pair in text.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate: {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) < 4:
        raise ValueError("ring needs >= 4 points (closed)")
    return np.array(pts, dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized list at depth 0 commas: '(a),(b)' -> ['a', 'b']."""
    groups, depth, start = [], 0, None
    for idx, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = idx + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:idx])
    if depth != 0:
        raise ValueError("unbalanced parentheses in WKT")
    return groups


def parse_wkt(text: str) -> list[Polygon]:
    """WKT -> list of Polygon parts (1 for POLYGON, n for MULTIPOLYGON)."""
    text = text.strip()
    upper = text.upper()
    if upper.startswith("POLYGON"):
        rings = _split_groups(text[text.index("(") + 1 : text.rindex(")")])
        rings = [_parse_ring(r) for r in rings]
        return [Polygon(shell=rings[0], holes=rings[1:])]
    if upper.startswith("MULTIPOLYGON"):
        body = text[text.index("(") + 1 : text.rindex(")")]
        parts = _split_groups(body)
        out = []
        for part in parts:
            rings = [_parse_ring(r) for r in _split_groups(part)]
            out.append(Polygon(shell=rings[0], holes=rings[1:]))
        return out
    raise ValueError(f"unsupported WKT type: {text[:24]!r}")
