"""Cell-encode stage: lat/lon -> hex res-7 + S2 level-12 cell ids.

The ST1 analog (tree-sitter grammar ≙ compiled spatial index encoders,
pkg/parser/tspool/pool.go:40-121): an actor pool whose numpy lookup tables /
constants are import-time state; per-batch work is pure vectorized numpy over
zero-copy Arrow columns. Rows without coordinates (derivation_source='none')
pass through with null cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from core_ray.config import register_stage
from core_ray.geo import hexgrid, s2


@register_stage("cellencode")
class CellEncoder:
    def __init__(self, hex_res: int = 7, s2_level: int = 12, with_s2: bool = True):
        # with_s2=False is the secondary-extraction opt-out (the
        # WithDomainHints analog): the s2_cell column is not computed/emitted
        self.hex_res = hex_res
        self.s2_level = s2_level
        self.with_s2 = with_s2
        # touch the lookup tables once so they're resident per actor
        _ = s2.POS_TO_IJ, s2.IJ_TO_POS

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lat) | np.isnan(lon))
        hexc = np.zeros(len(lat), dtype=np.uint64)
        if valid.any():
            hexc[valid] = hexgrid.lonlat_to_cell(lon[valid], lat[valid], self.hex_res)
        out = batch.append_column("hex_cell", pa.array(hexc, pa.uint64(), mask=~valid))
        if not self.with_s2:
            return out
        s2c = np.zeros(len(lat), dtype=np.uint64)
        if valid.any():
            s2c[valid] = s2.lonlat_to_cell(lon[valid], lat[valid], self.s2_level)
        return out.append_column("s2_cell", pa.array(s2c, pa.uint64(), mask=~valid))
