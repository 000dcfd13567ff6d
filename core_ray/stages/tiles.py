"""Tile-pyramid rollup: z/x/y assignment + hierarchical counts.

The A1 analog — the reference's recursive CountTests rollup
(pkg/domain/test.go:32-38, pkg/domain/inventory.go:29-52) re-expressed as the
classic tile-pyramid aggregation:

  1. assign each geocoded row its z12 web-mercator tile (map_batches, numpy)
  2. pre-aggregate (tile12, url) -> mention_count   [the combiner: collapses
     the corpus to distinct (tile, url) pairs BEFORE any wide groupby]
  3. explode each pair to every requested zoom (parent tile = integer shift —
     exact containment, no new shuffle key), re-dedupe (z, tile, url) pairs,
     then count pages (distinct urls) + sum mentions per tile.

All zooms ride ONE shuffle (the exploded pairs), not one shuffle per zoom.
page_count = distinct urls in the tile; mention_count = geocoded rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from core_ray.geo import mercator

BASE_ZOOM = 12


def _assign_tiles(batch: pa.Table) -> pa.Table:
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    x, y = mercator.lonlat_to_tile(lon, lat, BASE_ZOOM)
    return pa.table(
        {
            "url": batch["url"],
            "tile_x": pa.array(x, pa.int64()),
            "tile_y": pa.array(y, pa.int64()),
        }
    )


def tile_rollup(ds, zooms: tuple[int, ...] = (7, 9, 12)):
    """Dataset[joined rows] -> Dataset[(tile_z, tile_x, tile_y, page_count,
    mention_count)] for each z in ``zooms`` (all z <= BASE_ZOOM)."""
    zooms = tuple(zooms)
    for z in zooms:
        if z > BASE_ZOOM:
            raise ValueError(f"zoom {z} exceeds base zoom {BASE_ZOOM}")

    pairs12 = (
        ds.map_batches(_assign_tiles, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y", "url"])
        .aggregate(Count(alias_name="mention_count"))
    )

    def explode_zooms(batch: pa.Table) -> pa.Table:
        x12 = batch["tile_x"].to_numpy(zero_copy_only=False)
        y12 = batch["tile_y"].to_numpy(zero_copy_only=False)
        parts = []
        for z in zooms:
            dz = BASE_ZOOM - z
            parts.append(
                pa.table(
                    {
                        "tile_z": pa.array(
                            np.full(len(x12), z, dtype=np.int32), pa.int32()
                        ),
                        "tile_x": pa.array(x12 >> dz, pa.int64()),
                        "tile_y": pa.array(y12 >> dz, pa.int64()),
                        "url": batch["url"],
                        "mention_count": batch["mention_count"],
                    }
                )
            )
        return pa.concat_tables(parts)

    per_pair = (
        pairs12.map_batches(explode_zooms, batch_format="pyarrow")
        .groupby(["tile_z", "tile_x", "tile_y", "url"])
        .aggregate(Sum("mention_count", alias_name="mention_count"))
    )
    return per_pair.groupby(["tile_z", "tile_x", "tile_y"]).aggregate(
        Count(alias_name="page_count"),
        Sum("mention_count", alias_name="mention_count"),
    )
