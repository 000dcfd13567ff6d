"""Deterministic synthetic corpus (pages / admin_polygons / geoip_ranges) + oracle."""
