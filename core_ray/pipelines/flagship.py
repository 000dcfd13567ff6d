"""Flagship pipeline: pages parquet -> joined / errors / knn / tiles / stats.

The Ray Data restatement of the reference's Scan lifecycle (SURVEY.md §3.1)
over the spatial workload (§7.1 dataflow):

  Phase A (sharded, map-only, resumable):
      read_parquet (pruned: url, warc_ts, html, lang — the stored ``text`` is
      never read; the engine recomputes it and tests assert byte-identity)
      -> ExtractText actor pool      (html -> text, drops html immediately)
      -> Geocoder actor pool         (cascade; broadcast geo-IP dict)
      -> CellEncoder actor pool      (hex res-7 + s2 level-12)
      -> PipJoin actor pool          (broadcast STRtree; deepest-wins)
      -> checkpoint  <ckpt>/phaseA/shard=K   (per-shard lineage manifest;
         finished shards are SKIPPED on rerun)

  Phase B (global, wide):
      union of shard checkpoints
      -> exact dedup by (url, mention_idx)   [one url-keyed shuffle; carries
         text exactly once — equivalent to page-level dedup because duplicate
         pages produce byte-identical geocoded rows]
      -> checkpoint "deduped"
      -> joined (source != none) / errors (source == none)
      -> kNN per hex cell (ring-1 expansion, salted hot cells)
      -> tile rollup z in {7, 9, 12}
      -> stats (driver-side small aggregates, the ScanStats/ConfidenceDist
         analog, scanner.go:102-125)

Every stage version is pinned below; bumping one invalidates exactly the
checkpoints it feeds (state/lineage.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from core_ray.config import PipelineConfig
from core_ray.stages.knn import knn_per_cell
from core_ray.stages.tiles import tile_rollup
from core_ray.state.lineage import CheckpointStore, fingerprint_paths

STAGE_VERSIONS = {"phaseA": 1, "deduped": 1, "knn": 1, "tiles": 1}

JOINED_COLUMNS = [
    "url", "warc_ts", "lang", "text", "derivation_source", "mention_idx",
    "lat", "lon", "hex_cell", "s2_cell", "admin_id", "admin_level",
]


@dataclass
class FlagshipResult:
    joined: Any
    errors: Any
    knn: Any
    tiles: Any
    stats: dict = field(default_factory=dict)


def _geoip_dict(geoip_table: pa.Table) -> dict[str, tuple[float, float]]:
    return {
        h: (la, lo)
        for h, la, lo in zip(
            geoip_table["host"].to_pylist(),
            geoip_table["lat"].to_pylist(),
            geoip_table["lon"].to_pylist(),
        )
    }


def _phase_a(page_files: list[str], geoip_ref, admin_ref, cfg: PipelineConfig):
    """One fused per-document actor pool (see stages/analyzer.py for why)."""
    import ray.data

    from core_ray.stages.analyzer import PageAnalyzer

    ds = ray.data.read_parquet(page_files, columns=["url", "warc_ts", "html", "lang"])
    return ds.map_batches(
        PageAnalyzer,
        fn_constructor_args=(
            geoip_ref,
            admin_ref,
            cfg.max_html_bytes,
            cfg.hex_res,
            cfg.s2_level,
        ),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.actor_concurrency,
    )


def _first_row(group: pa.Table) -> pa.Table:
    if group.num_rows <= 1:
        return group
    import pyarrow.compute as pc

    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending")])
    return group.take(order[:1])


def run_flagship(
    page_files: list[str],
    admin_table: pa.Table,
    geoip_table: pa.Table,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    n_shards: int | None = None,
) -> FlagshipResult:
    """Run the flagship pipeline. Ray must already be initialized."""
    import ray

    cfg = cfg or PipelineConfig()
    checkpoint_dir = checkpoint_dir or cfg.checkpoint_dir
    if checkpoint_dir is None:
        import tempfile

        checkpoint_dir = tempfile.mkdtemp(prefix="core_ray_ckpt_")
    store = CheckpointStore(checkpoint_dir)

    geoip_ref = ray.put(_geoip_dict(geoip_table))
    admin_ref = ray.put(admin_table)

    # --- phase A: sharded map-only, per-shard resume ---
    n_shards = n_shards or min(len(page_files), 4)
    shards = [sorted(page_files)[i::n_shards] for i in range(n_shards)]
    shards = [s for s in shards if s]
    shard_outputs = []
    for k, files in enumerate(shards):
        fp = fingerprint_paths(files)
        out = store.load_or_compute(
            "phaseA",
            STAGE_VERSIONS["phaseA"],
            fp,
            lambda files=files: _phase_a(files, geoip_ref, admin_ref, cfg),
            shard=str(k),
        )
        shard_outputs.append(out)
    all_rows = shard_outputs[0]
    for o in shard_outputs[1:]:
        all_rows = all_rows.union(o)

    # --- phase B: global dedup ---
    input_fp = fingerprint_paths(sorted(page_files))
    deduped = store.load_or_compute(
        "deduped",
        STAGE_VERSIONS["deduped"],
        input_fp,
        lambda: all_rows.groupby(["url", "mention_idx"]).map_groups(
            _first_row, batch_format="pyarrow"
        ),
    )

    joined = deduped.filter(expr="derivation_source != 'none'")
    errors = (
        deduped.filter(expr="derivation_source == 'none'")
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t["url"],
                    "phase": pa.array(["geocode"] * t.num_rows, pa.string()),
                    "reason": pa.array(["no-geo-signal"] * t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    knn_input = joined.select_columns(["url", "mention_idx", "lat", "lon", "hex_cell"])
    knn = store.load_or_compute(
        "knn",
        STAGE_VERSIONS["knn"],
        input_fp,
        lambda: knn_per_cell(
            knn_input,
            k=cfg.knn_k,
            hot_threshold=cfg.hot_cell_threshold,
            salt_target=cfg.salt_group_target,
        ),
    )
    tiles_input = joined.select_columns(["url", "lat", "lon"])
    tiles = store.load_or_compute(
        "tiles",
        STAGE_VERSIONS["tiles"],
        input_fp,
        lambda: tile_rollup(tiles_input, cfg.tile_zooms),
    )

    # --- stats (ScanStats/ConfidenceDist analog) — small driver aggregates
    # over the checkpointed deduped parquet (cheap re-reads, no recompute) ---
    rows_geocoded = joined.count()
    rows_no_signal = errors.count()
    hist_ds = (
        joined.filter(expr="mention_idx == 0")  # exactly one such row per page
        .groupby("derivation_source")
        .count()
    )
    hist = {
        r["derivation_source"]: r["count()"] for r in hist_ds.take_all()
    }
    stats = {
        "rows_geocoded": rows_geocoded,
        "rows_no_signal": rows_no_signal,
        "pages_deduped": sum(hist.values()) + rows_no_signal,
        "derivation_source_hist": hist,
    }
    return FlagshipResult(joined=joined, errors=errors, knn=knn, tiles=tiles, stats=stats)
