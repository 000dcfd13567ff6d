"""Unit tests: mercator tiles, hex grid, WKT, point-in-polygon, STRtree, coords.

Micro-fixture style mirrors the reference's table-driven definition tests
(SURVEY.md §5.1)."""

import numpy as np
import pytest

from core_ray.geo import coords, geometry, hexgrid, mercator, strtree, wkt


class TestMercator:
    def test_known_tiles(self):
        # Berlin at z=12 (well-known slippy values)
        x, y = mercator.lonlat_to_tile(np.array([13.4050]), np.array([52.5200]), 12)
        assert (int(x[0]), int(y[0])) == (2200, 1343)
        # origin corner
        x, y = mercator.lonlat_to_tile(np.array([-180.0]), np.array([85.05]), 0)
        assert (int(x[0]), int(y[0])) == (0, 0)

    def test_parent_is_shift(self):
        x, y = mercator.lonlat_to_tile(np.array([13.4050]), np.array([52.5200]), 12)
        px, py = mercator.tile_parent(x, y, 3)
        x9, y9 = mercator.lonlat_to_tile(np.array([13.4050]), np.array([52.5200]), 9)
        assert int(px[0]) == int(x9[0]) and int(py[0]) == int(y9[0])

    def test_clamp_poles(self):
        x, y = mercator.lonlat_to_tile(np.array([0.0, 0.0]), np.array([89.9, -89.9]), 5)
        assert 0 <= y[0] <= 31 and 0 <= y[1] <= 31

    def test_tile_key_unique(self):
        xs = np.array([0, 1, 0], dtype=np.int64)
        ys = np.array([0, 0, 1], dtype=np.int64)
        keys = mercator.tile_key(5, xs, ys)
        assert len(set(keys.tolist())) == 3


class TestHexGrid:
    def test_roundtrip_center(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-170, 170, 200)
        lat = rng.uniform(-60, 70, 200)
        cells = hexgrid.lonlat_to_cell(lon, lat, 7)
        clon, clat = hexgrid.cell_to_center(cells)
        again = hexgrid.lonlat_to_cell(clon, clat, 7)
        assert (again == cells).all()

    def test_center_within_edge(self):
        lon = np.array([13.4050])
        lat = np.array([52.5200])
        cells = hexgrid.lonlat_to_cell(lon, lat, 7)
        clon, clat = hexgrid.cell_to_center(cells)
        dist = np.hypot(clon - lon, clat - lat)
        assert dist[0] <= hexgrid.edge_deg(7) * 1.0001

    def test_parent_contains_center(self):
        rng = np.random.default_rng(4)
        lon = rng.uniform(-170, 170, 100)
        lat = rng.uniform(-60, 70, 100)
        child = hexgrid.lonlat_to_cell(lon, lat, 7)
        parent = hexgrid.cell_parent(child)
        clon, clat = hexgrid.cell_to_center(child)
        assert (hexgrid.lonlat_to_cell(clon, clat, 6) == parent).all()

    def test_neighbors_are_distance_one(self):
        c = hexgrid.lonlat_to_cell(np.array([10.0]), np.array([20.0]), 7)
        nbrs = hexgrid.neighbors(c)[0]
        assert len(set(nbrs.tolist())) == 6
        d = hexgrid.hex_distance(nbrs, np.repeat(c, 6))
        assert (d == 1).all()

    def test_kring(self):
        c = int(hexgrid.lonlat_to_cell(np.array([10.0]), np.array([20.0]), 7)[0])
        ring1 = hexgrid.kring(c, 1)
        assert len(ring1) == 7 and c in ring1
        assert len(hexgrid.kring(c, 2)) == 19


class TestWKT:
    def test_polygon(self):
        polys = wkt.parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        assert len(polys) == 1 and polys[0].shell.shape == (5, 2)
        assert polys[0].bbox == (0.0, 0.0, 4.0, 4.0)

    def test_polygon_with_hole(self):
        p = wkt.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")[0]
        assert len(p.holes) == 1

    def test_multipolygon(self):
        polys = wkt.parse_wkt(
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
        )
        assert len(polys) == 2

    def test_bad_input(self):
        with pytest.raises(ValueError):
            wkt.parse_wkt("LINESTRING (0 0, 1 1)")


class TestPIP:
    def test_square(self):
        p = wkt.parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")[0]
        px = np.array([2.0, 5.0, -1.0, 3.9])
        py = np.array([2.0, 2.0, 2.0, 0.1])
        assert geometry.points_in_polygon(px, py, p).tolist() == [True, False, False, True]

    def test_hole_excluded(self):
        p = wkt.parse_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
        )[0]
        px = np.array([5.0, 2.0])
        py = np.array([5.0, 2.0])
        assert geometry.points_in_polygon(px, py, p).tolist() == [False, True]

    def test_concave(self):
        # L-shape
        p = wkt.parse_wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")[0]
        px = np.array([3.0, 3.0, 1.0])
        py = np.array([1.0, 3.0, 3.0])
        assert geometry.points_in_polygon(px, py, p).tolist() == [True, False, True]


class TestSTRtree:
    def _grid_boxes(self, n=10):
        boxes = []
        for i in range(n):
            for j in range(n):
                boxes.append([i, j, i + 0.9, j + 0.9])
        return np.array(boxes, dtype=np.float64)

    def test_point_query_matches_bruteforce(self):
        boxes = self._grid_boxes()
        tree = strtree.STRtree(boxes, node_capacity=4)
        rng = np.random.default_rng(5)
        xs = rng.uniform(-1, 11, 200)
        ys = rng.uniform(-1, 11, 200)
        pt, item = tree.query_points(xs, ys)
        got = {(int(p), int(i)) for p, i in zip(pt, item)}
        want = set()
        for pi, (x, y) in enumerate(zip(xs, ys)):
            hit = (
                (boxes[:, 0] <= x) & (x <= boxes[:, 2])
                & (boxes[:, 1] <= y) & (y <= boxes[:, 3])
            )
            for ii in np.nonzero(hit)[0]:
                want.add((pi, int(ii)))
        assert got == want

    def test_single_point_query(self):
        boxes = self._grid_boxes(4)
        tree = strtree.STRtree(boxes, node_capacity=4)
        hits = tree.query_point(0.5, 0.5)
        assert hits.tolist() == [0]

    def test_empty_and_tiny(self):
        tree = strtree.STRtree(np.empty((0, 4)))
        pt, item = tree.query_points(np.array([1.0]), np.array([1.0]))
        assert len(pt) == 0
        tree1 = strtree.STRtree(np.array([[0, 0, 1, 1]], dtype=np.float64))
        assert tree1.query_point(0.5, 0.5).tolist() == [0]
        assert tree1.query_point(2.0, 0.5).tolist() == []

    def test_overlapping_boxes(self):
        boxes = np.array([[0, 0, 10, 10], [2, 2, 5, 5], [3, 3, 4, 4]], dtype=np.float64)
        tree = strtree.STRtree(boxes, node_capacity=2)
        assert tree.query_point(3.5, 3.5).tolist() == [0, 1, 2]


class TestCoords:
    def test_decimal_pair(self):
        assert coords.extract_mentions("see 12.3456, -78.9012 there") == [(12.3456, -78.9012)]

    def test_geo_uri(self):
        assert coords.extract_mentions("geo:12.3456,-78.9012") == [(12.3456, -78.9012)]

    def test_dms(self):
        got = coords.extract_mentions("""at 12°20'44"N 78°54'4"W tonight""")
        assert len(got) == 1
        lat, lon = got[0]
        assert abs(lat - (12 + 20 / 60 + 44 / 3600)) < 1e-9
        assert abs(lon + (78 + 54 / 60 + 4 / 3600)) < 1e-9

    def test_junk_rejected(self):
        # prices, dates, short decimals, out-of-range values must NOT match
        for junk in [
            "price was 12.99, 34.50 total",          # only 2 decimals
            "version 1.2.3, 4.5.6",
            "on 12, -78 avenue",                      # integers
            "95.12345, -78.9012 invalid lat",         # lat out of range
            "12.3456, -190.0001 invalid lon",
        ]:
            assert coords.extract_mentions(junk) == [], junk

    def test_multiple_in_order(self):
        text = "a 10.1234, 20.5678 b geo:30.1,40.2 c"
        assert coords.extract_mentions(text) == [(10.1234, 20.5678), (30.1, 40.2)]


class TestTileKeyRoundtrip:
    def test_key_unkey_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        # 29 bits per axis -> the layout supports zooms up to 29
        @settings(max_examples=200, deadline=None)
        @given(
            z=st.integers(min_value=0, max_value=29),
            frac_x=st.floats(min_value=0, max_value=1, exclude_max=True),
            frac_y=st.floats(min_value=0, max_value=1, exclude_max=True),
        )
        def check(z, frac_x, frac_y):
            n = 1 << z
            x = np.array([int(frac_x * n)], dtype=np.uint64)
            y = np.array([int(frac_y * n)], dtype=np.uint64)
            zz = np.array([z], dtype=np.uint64)
            uz, ux, uy = mercator.tile_unkey(mercator.tile_key(zz, x, y))
            assert (uz[0], ux[0], uy[0]) == (z, int(x[0]), int(y[0]))

        check()
