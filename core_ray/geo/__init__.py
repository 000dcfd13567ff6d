"""Pure-numpy geometry kernels. No Ray dependency; safe to import in workers."""

from core_ray.geo import coords, geometry, hexgrid, mercator, s2, strtree, wkt  # noqa: F401
