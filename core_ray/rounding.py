"""SQL-compatible rounding.

numpy / pyarrow / Python all round HALF TO EVEN by default; SQL ROUND
(DuckDB, following C round()) rounds HALF AWAY FROM ZERO. The divergence is
real on exact binary ties: engine 202.125 -> 202.12 vs SQL 202.13, and such
ties occur naturally (ratios with power-of-two denominators like 97/128,
averages over 2^k rows, quantile midpoints). Every value compared against a
DuckDB oracle must round through these helpers.

Golden-diff oracles (pages_*) intentionally keep Python-side rounding on
BOTH sides — there the invariant is engine == our golden, not engine == SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sql_round_np(x, d: int) -> np.ndarray:
    """Half-away-from-zero round of a numpy array / scalar to d decimals."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** d
    s = x * p
    return np.where(s >= 0.0, np.floor(s + 0.5), np.ceil(s - 0.5)) / p


def sql_round(col, d: int):
    """Half-away-from-zero round of a pyarrow column (float64 out)."""
    return pc.round(
        pc.cast(col, pa.float64()), ndigits=d, round_mode="half_towards_infinity"
    )
