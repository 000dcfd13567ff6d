"""core_ray — a Ray-Data-native spatial-join + tiling engine over web-page corpora.

A from-scratch engine (NOT a port) re-expressing the capability classes of the
reference document-analysis pipeline (specvital/core, see SURVEY.md) as idiomatic
Ray Data: per-document classification cascades, deterministic per-document
extraction, broadcast containment joins, hierarchical rollup aggregation,
exact/approximate dedup, per-cell kNN, and resumable checkpointed execution.

Layout:
    geo/        pure-numpy geometry kernels (S2 cells, hex grid, mercator tiles,
                WKT, point-in-polygon, STRtree) — no Ray dependency
    fixtures/   deterministic synthetic corpus generator + pure-Python oracle
    stages/     Ray Data stages (map_batches / actor pools / groupby)
    text/       web-text training-data ops (dedup, similarity, quality, lang-id)
    pipelines/  end-to-end pipeline compositions (flagship spatial pipeline)
    state/      checkpoint + per-partition lineage manifest
    queries.py  driver-facing sf_dir-parameterized queries + DuckDB oracle SQL
"""

__version__ = "0.1.0"
