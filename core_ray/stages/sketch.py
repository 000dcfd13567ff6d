"""Mergeable quantile sketch (DDSketch-style log-linear histogram).

The scale hatch for per-group percentiles, sibling of the HLL tile sketch
and the Bloom dedup hatch: exact per-group quantiles (queries.py
events_value_quantiles) must hold a whole group's values in one task, which
is fine at test scale and wrong at 10^12 rows. The published DDSketch design
(relative-error-guaranteed quantiles from a log-spaced histogram; bins merge
by addition) fits the engine's canonical combiner shape instead:

    map_batches: per-batch (group, bin) counts         # combiner, vectorized
    -> pack (group_code, bin) into one uint64 key
    -> agg.sum_by_u64                                  # ONE small shuffle
    -> per-group bin walk on the driver (tiny: #groups x #bins rows)

Guarantee (from the construction): for values > min_positive, the returned
quantile q' satisfies |q' - q| <= alpha * q (relative error alpha); values
in [0, min_positive) collapse into a zero bin whose absolute error is
min_positive. Negative values are rejected (the engine's value columns are
non-negative; a two-sided variant would add a mirrored negative store).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


class DDSketchParams:
    def __init__(self, alpha: float = 0.01, min_positive: float = 1e-9):
        if not 0 < alpha < 1:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = alpha
        self.min_positive = min_positive
        self.gamma = (1 + alpha) / (1 - alpha)
        self.log_gamma = math.log(self.gamma)

    def bin_of(self, v: np.ndarray) -> np.ndarray:
        """Vectorized bin index; bin 0 is the zero/underflow bin, positive
        values map to ceil(log_gamma(v)) shifted to stay >= 1."""
        v = np.asarray(v, dtype=np.float64)
        if (v < 0).any():
            raise ValueError("DDSketch store is one-sided (values must be >= 0)")
        out = np.zeros(len(v), dtype=np.int64)
        pos = v >= self.min_positive
        if pos.any():
            raw = np.ceil(np.log(v[pos]) / self.log_gamma).astype(np.int64)
            out[pos] = raw - self._bin_floor
        return out

    @property
    def _bin_floor(self) -> int:
        # lowest representable raw bin (for min_positive), shifted to 1
        return int(math.ceil(math.log(self.min_positive) / self.log_gamma)) - 1

    def value_of(self, bins: np.ndarray) -> np.ndarray:
        """Bin index -> representative value (the bin's geometric midpoint,
        2*gamma^k/(gamma+1) per the published estimator); bin 0 -> 0.0."""
        bins = np.asarray(bins, dtype=np.int64)
        out = np.zeros(len(bins), dtype=np.float64)
        pos = bins > 0
        raw = bins[pos] + self._bin_floor
        out[pos] = 2.0 * np.power(self.gamma, raw.astype(np.float64)) / (self.gamma + 1.0)
        return out


def quantiles_from_bins(bins: np.ndarray, counts: np.ndarray, qs, params: DDSketchParams):
    """Walk one group's merged (bin, count) histogram for each quantile
    (lower-rank rule, matching the sketch's published estimator)."""
    order = np.argsort(bins)
    b, c = bins[order], counts[order]
    cum = np.cumsum(c)
    total = cum[-1]
    out = []
    for q in qs:
        rank = q * (total - 1)
        idx = int(np.searchsorted(cum, rank + 1))
        idx = min(idx, len(b) - 1)
        out.append(float(params.value_of(np.array([b[idx]]))[0]))
    return out


def approx_group_quantiles(ds, group_col: str, val_col: str, qs=(0.5, 0.9),
                           alpha: float = 0.01, max_groups: int = 1 << 20):
    """Dataset -> pyarrow Table (group_col, q_0.5, q_0.9, ...) with
    relative-error-alpha approximate quantiles per group.

    Group names are dictionary-coded per batch and carried as a SMALL
    broadcast-free side: each batch emits (group_name, bin, count) partial
    rows; the group string is hashed into the packed key and the name rides
    one representative row per (group, bin) — exactness of counts is
    preserved because sum_by_u64 keys on (group_hash, bin) and hash
    collisions across groups are rejected by a final name check."""
    import ray

    from core_ray.stages.agg import hash_strings, sum_by_u64

    params = DDSketchParams(alpha=alpha)

    def partial(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False)
        bins = params.bin_of(v)
        gh = hash_strings(b[group_col]) % np.uint64(max_groups)
        key = (gh << np.uint64(20)) | bins.astype(np.uint64)  # 20 bits of bin
        order = np.argsort(key, kind="stable")
        ks = key[order]
        new = np.ones(len(ks), dtype=bool)
        if len(ks):
            new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.append(starts, len(ks)))
        names = np.asarray(b[group_col].to_pylist())[order][starts]
        return pa.table(
            {
                "key": pa.array(ks[starts], pa.uint64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "name": pa.array(names, pa.string()),
            }
        )

    # materialized: BOTH consumers below (the count sum and the key->name
    # side pull) read the same execution — without this the full input scan
    # and bin combiner would run twice
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).materialize()
    # counts: exact sum per (group_hash, bin) key
    sums = sum_by_u64(partials.select_columns(["key", "cnt"]), "key", "cnt")
    sum_tabs = [t for t in ray.get(sums.to_arrow_refs()) if t.num_rows]
    merged = pa.concat_tables(sum_tabs)
    # representative names per key (first wins; dedup driver-side — #keys is
    # #groups x #occupied-bins, small by construction)
    name_tabs = [t for t in ray.get(partials.select_columns(["key", "name"]).to_arrow_refs()) if t.num_rows]
    names = pa.concat_tables(name_tabs)
    # representative name per GROUP HASH (not per key): a collision between
    # two group names on the same hash corrupts the merged histogram, so it
    # must be detected even when the groups occupy disjoint bins
    name_of: dict[int, str] = {}
    collide = set()
    for k, n in zip(names["key"].to_pylist(), names["name"].to_pylist()):
        ghash = int(k) >> 20
        prev = name_of.setdefault(ghash, n)
        if prev != n:
            collide.add(ghash)
    if collide:
        raise ValueError(
            f"group hash collision on {len(collide)} group(s); raise max_groups"
        )

    keys = merged["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnts = merged["cnt"].to_numpy(zero_copy_only=False)
    gh = keys >> np.uint64(20)
    bins = (keys & np.uint64((1 << 20) - 1)).astype(np.int64)
    order = np.argsort(gh, kind="stable")
    gh, bins, cnts, keys = gh[order], bins[order], cnts[order], keys[order]
    new = np.ones(len(gh), dtype=bool)
    new[1:] = gh[1:] != gh[:-1]
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(gh))
    out_names, out_qs = [], [[] for _ in qs]
    for s, e in zip(starts, ends):
        out_names.append(name_of[int(gh[s])])
        vals = quantiles_from_bins(bins[s:e], cnts[s:e], qs, params)
        for i, v in enumerate(vals):
            out_qs[i].append(v)
    cols = {group_col: pa.array(out_names, pa.string())}
    for i, q in enumerate(qs):
        cols[f"q_{q}"] = pa.array(out_qs[i], pa.float64())
    t = pa.table(cols)
    return t.take(pa.compute.sort_indices(t, sort_keys=[(group_col, "ascending")]))
