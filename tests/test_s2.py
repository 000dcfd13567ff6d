"""Property tests for the from-scratch S2 implementation (no s2 lib exists
here, so correctness rests on: round-trips, hierarchy prefixes, locality)."""

import numpy as np

from core_ray.geo import s2

rng = np.random.default_rng(7)
LON = rng.uniform(-179.9, 179.9, 500)
LAT = rng.uniform(-89.9, 89.9, 500)


def test_cell_level_roundtrip():
    for level in (0, 1, 5, 12, 20, 30):
        cells = s2.lonlat_to_cell(LON, LAT, level)
        assert (s2.cell_level(cells) == level).all()


def test_encode_decode_roundtrip():
    # center of a cell must re-encode to the same cell at the same level
    for level in (4, 8, 12, 16):
        cells = s2.lonlat_to_cell(LON, LAT, level)
        clon, clat = s2.cell_to_center_lonlat(cells)
        again = s2.lonlat_to_cell(clon, clat, level)
        assert (again == cells).all()


def test_parent_prefix_consistency():
    # encoding at a coarser level == cell_parent of the finer encoding
    fine = s2.lonlat_to_cell(LON, LAT, 12)
    for coarse in (3, 7, 11):
        direct = s2.lonlat_to_cell(LON, LAT, coarse)
        via_parent = s2.cell_parent(fine, coarse)
        assert (direct == via_parent).all()


def test_face_coverage_and_determinism():
    cells = s2.lonlat_to_cell(LON, LAT, 12)
    faces = (cells >> np.uint64(61)).astype(int)
    assert set(faces) == {0, 1, 2, 3, 4, 5}
    assert (cells == s2.lonlat_to_cell(LON, LAT, 12)).all()


def test_locality_nearby_points_share_coarse_cell():
    lon = np.array([13.4050, 13.4051])
    lat = np.array([52.5200, 52.5201])  # ~10 m apart
    a, b = s2.lonlat_to_cell(lon, lat, 12)
    # level-12 cells are ~3-6 km; 10 m apart must share the level-8 ancestor
    assert s2.cell_parent(np.array([a]), 8)[0] == s2.cell_parent(np.array([b]), 8)[0]


def test_distinct_regions_distinct_cells():
    lon = np.array([13.4, -74.0, 139.7])
    lat = np.array([52.5, 40.7, 35.7])  # Berlin, NYC, Tokyo
    cells = s2.lonlat_to_cell(lon, lat, 12)
    assert len(set(cells.tolist())) == 3


def test_known_cell_id_leaf_structure():
    # trailing bit of any cell id is the level marker; leaf ids are odd
    leaf = s2.lonlat_to_cell(np.array([0.0]), np.array([0.0]), 30)
    assert int(leaf[0]) & 1 == 1
    l12 = s2.lonlat_to_cell(np.array([0.0]), np.array([0.0]), 12)
    assert int(l12[0]) & ((1 << (61 - 2 * 12 - 1)) - 1) == 0
