"""Coordinate-code decoders (geo/codes.py) + the derivation-rule catalog
(rules/catalog.py) — the reference's per-strategy definition tests shape
(strategies/*/definition_test.go: trigger + exact decode per rule)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from core_ray.geo.codes import (
    geohash_decode,
    geohash_encode,
    lonlat_to_utm,
    pluscode_decode,
    quadkey_decode,
    s2_token_decode,
    utm_to_lonlat,
)
from core_ray.rules import CATALOG_RULES, full_registry
from core_ray.stages.geocode import Geocoder

# ---------------- decoders ----------------


def test_geohash_known_value():
    lat, lon = geohash_decode("ezs42")  # the spec's canonical example cell
    assert lat == pytest.approx(42.605, abs=0.005)
    assert lon == pytest.approx(-5.603, abs=0.005)


def test_geohash_roundtrip_grid():
    rng = np.random.default_rng(11)
    for _ in range(50):
        la = float(rng.uniform(-89, 89))
        lo = float(rng.uniform(-179, 179))
        dla, dlo = geohash_decode(geohash_encode(la, lo, 9))
        assert dla == pytest.approx(la, abs=3e-5)
        assert dlo == pytest.approx(lo, abs=3e-5)


def test_geohash_invalid():
    assert geohash_decode("") is None
    assert geohash_decode("ab!") is None  # 'a' itself is also not in base32
    assert geohash_decode("ail") is None  # a, i, l excluded from the alphabet


def test_pluscode_spec_examples():
    lat, lon = pluscode_decode("8FVC2222+22")
    assert (lat, lon) == pytest.approx((47.0000625, 8.0000625))
    lat, lon = pluscode_decode("849VCWC8+R9")  # Mountain View area (published OLC example)
    assert lat == pytest.approx(37.4220, abs=0.001)
    assert lon == pytest.approx(-122.0841, abs=0.001)


def test_pluscode_grid_refinement_shrinks_cell():
    c10 = pluscode_decode("8FVC2222+22")
    c11 = pluscode_decode("8FVC2222+22G")
    # the 11-digit center must lie inside the 10-digit cell (1/8000 deg)
    assert abs(c11[0] - c10[0]) < 1.0 / 8000
    assert abs(c11[1] - c10[1]) < 1.0 / 8000


def test_pluscode_invalid():
    assert pluscode_decode("NOPLUS") is None
    assert pluscode_decode("8FVC22+22") is None  # short code unsupported
    assert pluscode_decode("8FVA2222+22") is None  # 'A' not in alphabet


def test_utm_roundtrip():
    rng = np.random.default_rng(12)
    for _ in range(50):
        la = float(rng.uniform(-79, 83))  # UTM's defined latitude band
        lo = float(rng.uniform(-179, 179))
        z, h, e, n = lonlat_to_utm(la, lo)
        bla, blo = utm_to_lonlat(z, h, e, n)
        assert bla == pytest.approx(la, abs=1e-6)
        assert blo == pytest.approx(lo, abs=1e-6)


def test_utm_invalid():
    assert utm_to_lonlat(0, "N", 5e5, 0.0) is None
    assert utm_to_lonlat(31, "X", 5e5, 0.0) is None


def test_mgrs_roundtrip_and_structure():
    from core_ray.geo.codes import mgrs_decode, mgrs_encode

    rng = np.random.default_rng(13)
    for _ in range(60):
        la = float(rng.uniform(-79.9, 83.9))
        lo = float(rng.uniform(-179.9, 179.9))
        code = mgrs_encode(la, lo)
        bla, blo = mgrs_decode(code)
        # 1 m cells: center within ~1.5 m of the input
        assert bla == pytest.approx(la, abs=2e-5)
        assert blo == pytest.approx(lo, abs=2e-5 / max(0.02, np.cos(np.radians(la))))
    # structural spec checks: column letter set cycles by zone mod 3, row
    # letters offset 5 on even zones, bands are the 8-degree C..X table
    # zone-center points (easting ~500 km -> 5th column letter of the set):
    # 31 -> A-H gives 'E', 32 -> J-R gives 'N', 33 -> S-Z gives 'W'; row 0
    # is 'A' on odd zones and 'F' (offset 5) on even zones
    assert mgrs_encode(0.5, 3.0).startswith("31NEA")
    assert mgrs_encode(0.5, 9.0).startswith("32NNF")
    assert mgrs_encode(0.5, 15.0).startswith("33NWA")
    assert mgrs_encode(78.2, 15.6).startswith("33X")   # X band spans 72..84
    # canonical grid-zone example: Honolulu sits in 4Q square FJ
    assert mgrs_encode(21.3069, -157.8583).startswith("4QFJ")
    hla, hlo = mgrs_decode("4QFJ1234567890")
    assert 16.0 <= hla <= 24.0 and -162.0 <= hlo <= -156.0


def test_mgrs_precision_and_invalid():
    from core_ray.geo.codes import mgrs_decode, mgrs_encode

    # coarser digit counts decode to the bigger cell's center
    full = mgrs_encode(48.8566, 2.3522)          # 1 m
    km = full[:5] + full[5:7] + full[10:12]       # 2+2 digits -> 1 km cell
    la, lo = mgrs_decode(km)
    assert la == pytest.approx(48.8566, abs=0.01)
    assert lo == pytest.approx(2.3522, abs=0.02)
    for bad in ("", "99ZAA11", "31UDQ123", "31UDQ12345678901", "0UDQ1122",
                "31UII1122", "31IDQ1122"):
        assert mgrs_decode(bad) is None


# ---------------- rules through the cascade ----------------

GEOIP = {"known.example.com": (10.0, 20.0)}
STATE = {
    "airports": {"SFO": (37.6213, -122.3790)},
    "gazetteer": {"Paris": (48.8566, 2.3522), "New York": (40.7128, -74.0060)},
    "zipcodes": {"94103": (37.7725, -122.4147)},
}


def _run(rows):
    g = Geocoder(GEOIP, registry=full_registry(), extra_state=STATE)
    b = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    out = g(b)
    return list(
        zip(
            out["derivation_source"].to_pylist(),
            out["lat"].to_pylist(),
            out["lon"].to_pylist(),
        )
    )


def test_catalog_rule_names_and_priorities():
    names = [r.name for r in full_registry().candidates("en")]
    assert names == [
        # Specialized, name-ascending
        "ddm", "exif-gps", "geo-position", "geojson", "icbm", "iso6709",
        "latlon-qs", "map-url", "text-mention", "wkt-point",
        # E2E
        "geohash", "maidenhead", "mgrs", "osm-map", "pluscode", "quadkey",
        "s2-token", "tile-url", "utm",
        # Generic
        "airport", "gazetteer", "host-geoip", "zip-centroid",
    ]
    # 23 registered rules (21 catalog + 2 built-ins) vs the reference's 22 definitions
    assert len(names) == 23 and len(CATALOG_RULES) == 21


def test_iso6709_latlon_qs_maidenhead_tile_rules():
    out = _run(
        [
            ("https://x.com/1", "position +48.8577+002.2950/ recorded", "en"),
            ("https://x.com/2?lat=12.5&lon=-33.25", "no text signal", "en"),
            ("https://x.com/3", "operating from grid JN58td tonight", "en"),
            ("https://tiles.x.com/tiles/11/1050/674.png", "tile page", "en"),
        ]
    )
    assert [o[0] for o in out] == ["iso6709", "latlon-qs", "maidenhead", "tile-url"]
    assert out[0][1] == pytest.approx(48.8577)
    assert out[1][1] == pytest.approx(12.5) and out[1][2] == pytest.approx(-33.25)
    assert out[2][1] == pytest.approx(48.1458, abs=0.001)
    assert out[3][2] == pytest.approx(4.6582, abs=0.001)


def test_map_url_rule_beats_text_mention():
    rows = [("https://maps.example.com/@48.8566,2.3522,12z", "also 12.345, -33.251", "en")]
    out = _run([rows[0]])
    assert out[0][0] == "map-url"
    assert out[0][1] == pytest.approx(48.8566)


def test_geohash_pluscode_utm_rules():
    out = _run(
        [
            ("https://x.com/1", "see geohash:ezs42 for the place", "en"),
            ("https://x.com/2", "code 8FVC2222+22 nearby", "en"),
            ("https://x.com/3", "grid UTM 31N 448262 5411932", "en"),
        ]
    )
    assert [o[0] for o in out] == ["geohash", "pluscode", "utm"]
    assert out[0][1] == pytest.approx(42.605, abs=0.005)
    assert out[1][1] == pytest.approx(47.0000625)
    assert out[2][1] == pytest.approx(48.858, abs=0.01)  # Eiffel-tower-ish


def test_airport_and_gazetteer_rules_with_broadcast_tables():
    out = _run(
        [
            ("https://x.com/1", "flying from SFO Airport tomorrow", "en"),
            ("https://x.com/2", "we stayed in Paris for a week", "en"),
            ("https://x.com/3", "meetup in New York soon", "en"),
            ("https://known.example.com/4", "no place names at all", "en"),
        ]
    )
    assert [o[0] for o in out] == ["airport", "gazetteer", "gazetteer", "host-geoip"]
    assert out[0][1] == pytest.approx(37.6213)
    assert out[2][2] == pytest.approx(-74.0060)


def test_airport_beats_gazetteer_by_name_within_generic():
    out = _run([("https://x.com/1", "from SFO Airport while in Paris", "en")])
    assert out[0][0] == "airport"


def test_catalog_without_side_tables_falls_through():
    g = Geocoder(GEOIP, registry=full_registry())  # no airports/gazetteer
    b = pa.table(
        {
            "url": pa.array(["https://known.example.com/x"], pa.string()),
            "text": pa.array(["from SFO Airport while in Paris"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    assert g(b)["derivation_source"].to_pylist() == ["host-geoip"]


# ---------------- v3 rules (catalog growth to 22+ definitions) ----------------


def test_quadkey_decode_known_value():
    # z9 tile (259, 176): published Bing interleaving, slippy center inverse
    lat, lon = quadkey_decode("120220011")
    assert lat == pytest.approx(48.69096, abs=1e-5)
    assert lon == pytest.approx(2.460938, abs=1e-5)
    assert quadkey_decode("") is None
    assert quadkey_decode("4201") is None  # digit out of the 0-3 alphabet
    assert quadkey_decode("0" * 24) is None  # beyond max zoom


def test_s2_token_decode_roundtrip():
    from core_ray.geo.s2 import lonlat_to_cell

    cell = int(lonlat_to_cell(np.array([2.3522]), np.array([48.8566]), 12)[0])
    token = format(cell, "016x").rstrip("0")
    lat, lon = s2_token_decode(token)
    # level-12 cell covering central Paris: center within the ~3 km cell
    assert lat == pytest.approx(48.8566, abs=0.05)
    assert lon == pytest.approx(2.3522, abs=0.05)
    assert s2_token_decode("") is None
    assert s2_token_decode("zz") is None
    assert s2_token_decode("0") is None
    assert s2_token_decode("f" * 17) is None


def test_geojson_wkt_axis_order():
    out = _run(
        [
            ("https://x.com/1", 'obj "coordinates": [2.3522, 48.8566] tail', "en"),
            ("https://x.com/2", "geom POINT(151.2093 -33.8688) literal", "en"),
        ]
    )
    # both carry (lon, lat) on the wire; the rules must swap to (lat, lon)
    assert out[0] == ("geojson", pytest.approx(48.8566), pytest.approx(2.3522))
    assert out[1] == ("wkt-point", pytest.approx(-33.8688), pytest.approx(151.2093))


def test_meta_geotag_rules():
    out = _run(
        [
            ("https://x.com/1", "ICBM: 40.44, -79.99 in head", "en"),
            ("https://x.com/2", "geo.position: 37.422;-122.084 in head", "en"),
            ("https://x.com/3", "GPSLatitude: 35.6895 GPSLongitude: 139.6917", "en"),
        ]
    )
    assert [o[0] for o in out] == ["icbm", "geo-position", "exif-gps"]
    assert out[0][1] == pytest.approx(40.44)
    assert out[1][2] == pytest.approx(-122.084)
    assert out[2][1] == pytest.approx(35.6895)


def test_ddm_rule_and_dms_disjointness():
    out = _run(
        [
            ("https://x.com/1", "fix 48°51.396'N 2°21.132'E logged", "en"),
            # DMS (seconds form) must still go to the built-in text-mention
            ("https://x.com/2", "at 12°30'0\"N 45°15'0\"E mark", "en"),
        ]
    )
    assert out[0] == ("ddm", pytest.approx(48.8566), pytest.approx(2.3522))
    assert out[1][0] == "text-mention"


def test_osm_map_quadkey_s2_zip_rules():
    out = _run(
        [
            ("https://osm.example.com/x#map=12/48.8566/2.3522", "osm page", "en"),
            ("https://x.com/2", "at quadkey:120220011 spot", "en"),
            ("https://x.com/3", "cell s2:47e66e1 here", "en"),
            ("https://x.com/4", "around ZIP 94103 area", "en"),
        ]
    )
    assert [o[0] for o in out] == ["osm-map", "quadkey", "s2-token", "zip-centroid"]
    assert out[0][1] == pytest.approx(48.8566)
    assert out[3][1] == pytest.approx(37.7725)


def test_v3_priority_interplay():
    out = _run(
        [
            # Specialized geojson claims the row before text-mention sees the
            # bare decimal pair AND before E2E geohash
            ("https://x.com/1", 'x "coordinates": [2.3522, 48.8566] geohash:ezs42', "en"),
            # E2E quadkey beats Generic gazetteer
            ("https://x.com/2", "at quadkey:120220011 in Paris", "en"),
        ]
    )
    assert out[0][0] == "geojson" and out[0][1] == pytest.approx(48.8566)
    assert out[1][0] == "quadkey"


def test_full_catalog_through_flagship(ray_session, tmp_path):
    """Catalog + flagship e2e: a corpus whose pages hit every catalog rule,
    run with the full registry via the actor-pool PageAnalyzer."""
    import ray

    from core_ray.stages.analyzer import PageAnalyzer

    texts = {
        "map": ("https://maps.x.com/@48.8566,2.3522,12z", "nothing else"),
        "gh": ("https://x.com/gh", "try geohash:u4pruydqqvj today"),
        "plus": ("https://x.com/plus", "at 849VCWC8+R9 now"),
        "utm": ("https://x.com/utm", "grid UTM 10N 552100 4182700"),
        "mgrs": ("https://x.com/mgrs", "ref MGRS 31UDQ4825211717 pos"),
        "apt": ("https://x.com/apt", "lands at SFO Airport"),
        "gaz": ("https://x.com/gaz", "a week in Paris"),
        "geoip": ("https://known.example.com/h", "plain text"),
        "none": ("https://x.com/none", "no geo signal"),
    }
    urls = [u for u, _ in texts.values()]
    htmls = [f"<html><body><p>{t}</p></body></html>".encode() for _, t in texts.values()]
    b = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.full(len(urls), np.datetime64("2025-01-01T00:00:00", "us"))
            ),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    admin = pa.table(
        {
            "admin_id": pa.array(["W0"], pa.string()),
            "level": pa.array([0], pa.int8()),
            "parent_id": pa.array([None], pa.string()),
            "wkt": pa.array(
                ["POLYGON ((-180 -85, 180 -85, 180 85, -180 85, -180 -85))"],
                pa.string(),
            ),
        }
    )
    out = (
        ray.data.from_arrow(b)
        .map_batches(
            PageAnalyzer,
            fn_constructor_args=(GEOIP, admin),
            fn_constructor_kwargs={"registry": full_registry(), "extra_state": STATE},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    by_src = {r["derivation_source"] for r in out}
    assert by_src == {
        "map-url", "geohash", "pluscode", "utm", "mgrs", "airport",
        "gazetteer", "host-geoip", "none",
    }


def test_maidenhead_iso_tile_decoders():
    from core_ray.geo.codes import iso6709_decode, maidenhead_decode, tile_center

    # Maidenhead: Munich subsquare center per the published scheme
    assert maidenhead_decode("JN58td") == pytest.approx((48.1458333, 11.625))
    assert maidenhead_decode("FN31pr")[1] == pytest.approx(-72.7083, abs=0.001)
    assert maidenhead_decode("JN58") == pytest.approx((48.5, 11.0))  # 4-char cell
    for bad in ("ZZ99", "JN5", "JN58zz", ""):
        assert maidenhead_decode(bad) is None
    # ISO 6709 degree strings
    assert iso6709_decode("+48.8577+002.2950/") == (48.8577, 2.295)
    assert iso6709_decode("-33.8688+151.2093") == (-33.8688, 151.2093)
    assert iso6709_decode("48.85+002.29/") is None  # sign required
    assert iso6709_decode("+99.0+002.0/") is None  # out of range
    # slippy-map tile center (published inverse formula)
    lat, lon = tile_center(11, 1050, 674)
    assert lon == pytest.approx((1050.5 / 2048) * 360 - 180)
    assert tile_center(2, 9, 0) is None and tile_center(-1, 0, 0) is None


# ---------------- property tests (hypothesis) ----------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    la=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    lo=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)
def test_geohash_roundtrip_property(la, lo):
    dla, dlo = geohash_decode(geohash_encode(la, lo, 10))
    assert abs(dla - la) < 1e-5 and abs(dlo - lo) < 1e-5


@settings(max_examples=200, deadline=None)
@given(
    la=st.floats(min_value=-79.0, max_value=83.0, allow_nan=False),
    lo=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)
def test_utm_roundtrip_property(la, lo):
    z, h, e, n = lonlat_to_utm(la, lo)
    assert 1 <= z <= 60 and h in ("N", "S") and n >= 0
    bla, blo = utm_to_lonlat(z, h, e, n)
    assert abs(bla - la) < 1e-6 and abs(blo - lo) < 1e-6


@settings(max_examples=100, deadline=None)
@given(code=st.text(alphabet="0123456789bcdefghjkmnpqrstuvwxyz", min_size=1, max_size=12))
def test_geohash_decode_always_in_range(code):
    la, lo = geohash_decode(code)
    assert -90.0 <= la <= 90.0 and -180.0 <= lo <= 180.0


@settings(max_examples=150, deadline=None)
@given(
    la=st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
    lo=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    z=st.integers(min_value=1, max_value=18),
)
def test_quadkey_roundtrip_property(la, lo, z):
    """Published Bing tile math (independent of quadkey_decode) -> quadkey
    -> decode must land at that tile's center, inside the tile bounds."""
    import math

    n = 1 << z
    x = min(int((lo + 180.0) / 360.0 * n), n - 1)
    lr = math.radians(la)
    y = int((1.0 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi) / 2.0 * n)
    y = min(max(y, 0), n - 1)
    qk = "".join(
        str(((x >> (z - 1 - i)) & 1) | (((y >> (z - 1 - i)) & 1) << 1))
        for i in range(z)
    )
    dla, dlo = quadkey_decode(qk)
    # center must lie inside the tile's longitude span
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0
    assert west < dlo < east
    assert -85.06 < dla < 85.06


@settings(max_examples=150, deadline=None)
@given(
    la=st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
    lo=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    level=st.integers(min_value=4, max_value=20),
)
def test_s2_token_roundtrip_property(la, lo, level):
    """lonlat -> cell -> token -> decode: the decoded center must be inside
    the cell (distance bounded by the level's max cell diagonal)."""
    from core_ray.geo.s2 import lonlat_to_cell

    cell = int(lonlat_to_cell(np.array([lo]), np.array([la]), level)[0])
    token = format(cell, "016x").rstrip("0")
    dla, dlo = s2_token_decode(token)
    # max cell edge ~ 90deg / 2^level on a face; diagonal x sqrt(2), plus
    # lon stretch at high latitude
    tol = 1.5 * 90.0 / (1 << level)
    assert abs(dla - la) <= tol
    dlon = abs(dlo - lo)
    dlon = min(dlon, 360.0 - dlon)
    assert dlon * max(0.05, np.cos(np.radians(la))) <= 1.6 * 90.0 / (1 << level)
