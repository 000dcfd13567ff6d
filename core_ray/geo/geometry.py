"""Vectorized point-in-polygon (even-odd crossing test).

The containment kernel behind the pip-join stage — the geometric analog of the
reference's scope-containment test (pkg/parser/framework/scope.go:72-138
``Contains``). Boundary convention: a point exactly on an edge may land on
either side depending on floating point; the fixture generator keeps test
points off polygon boundaries (FIXTURES.md §5) and the golden oracle uses the
identical kernel, so results are deterministic.
"""

from __future__ import annotations

import numpy as np

from core_ray.geo.wkt import Polygon


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of n points against one ring. Returns bool (n,).

    Broadcasts points x edges: memory O(n_points * n_edges); callers keep
    rings small (fixture polygons: <= ~40 vertices) and points batched.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    hits = crosses & (px < x_at)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: Polygon) -> np.ndarray:
    """Inside shell and outside every hole."""
    inside = points_in_ring(px, py, poly.shell)
    for hole in poly.holes:
        inside &= ~points_in_ring(px, py, hole)
    return inside
