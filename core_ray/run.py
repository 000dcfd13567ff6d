"""CLI driver: ``python -m core_ray.run`` — the scripts/scan.go analog
(SURVEY.md §3.3): corpus in, flagship outputs + JSON summary out.

Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="core_ray flagship pipeline")
    ap.add_argument(
        "--source", default="parquet",
        help="registered source name (core_ray.sources.open_source): "
        "parquet | html-dir | git | any user-registered name",
    )
    ap.add_argument(
        "--source-arg", action="append", default=[], metavar="KEY=VALUE",
        help="extra kwargs for the source factory (repeatable)",
    )
    ap.add_argument("--pages", required=True,
                    help="main source argument (parquet dir/glob, html dir, git url)")
    ap.add_argument("--admin", required=True, help="admin_polygons parquet file")
    ap.add_argument("--geoip", required=True, help="geoip_ranges parquet file")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--out", help="write joined/knn/tiles/errors datasets here")
    ap.add_argument(
        "--format", choices=("parquet", "json", "csv"), default="parquet",
        help="output dataset format (scripts/scan.go JSON-sink analog)",
    )
    ap.add_argument(
        "--include", action="append", default=[], metavar="PATTERN",
        help="doublestar include pattern over page files, repeatable "
        "(WithPatterns analog; default: all files)",
    )
    ap.add_argument(
        "--exclude", action="append", default=[], metavar="PATTERN",
        help="doublestar exclude pattern over page files, repeatable "
        "(WithExcludePatterns analog)",
    )
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args(argv)

    import ray

    # RAY_ADDRESS=local (sandbox default) -> single-node; under
    # `ray job submit` the env points at the cluster and num_cpus is ignored
    address = os.environ.get("RAY_ADDRESS") or "local"
    init_kwargs = dict(
        address=address,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    if address == "local":
        init_kwargs["num_cpus"] = args.num_cpus
    ray.init(**init_kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        import pyarrow.parquet as pq

        from core_ray.config import PipelineConfig
        from core_ray.pipelines.flagship import run_flagship
        from core_ray.sources import open_source

        bad = [kv for kv in args.source_arg if "=" not in kv]
        if bad:
            ap.error(f"--source-arg must be KEY=VALUE, got: {bad[0]!r}")
        src_kwargs = dict(kv.split("=", 1) for kv in args.source_arg)
        # the parquet source owns the root AND the (include-driven) recursive
        # walk, so patterns must filter ITS listing — applying them after the
        # fact could never match nested shards the flat default listing
        # skipped. Other sources produce their own temp page dirs; patterns
        # go through PipelineConfig there (relative to the produced files).
        cfg_kwargs = {}
        if args.include or args.exclude:
            if args.source == "parquet":
                src_kwargs["include_patterns"] = tuple(args.include) or None
                src_kwargs["exclude_patterns"] = tuple(args.exclude)
            else:
                cfg_kwargs = dict(
                    include_patterns=tuple(args.include) or None,
                    exclude_patterns=tuple(args.exclude),
                )
        source = open_source(args.source, args.pages, **src_kwargs)
        try:
            files = source.pages()
            res = run_flagship(
                files,
                pq.read_table(args.admin),
                pq.read_table(args.geoip),
                PipelineConfig(**cfg_kwargs),
                checkpoint_dir=args.checkpoint_dir,
            )
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                write = {
                    "parquet": lambda ds, p: ds.write_parquet(p),
                    "json": lambda ds, p: ds.write_json(p),
                    "csv": lambda ds, p: ds.write_csv(p),
                }[args.format]
                for name, ds in (
                    ("joined", res.joined), ("knn", res.knn),
                    ("tiles", res.tiles), ("errors", res.errors),
                ):
                    write(ds, os.path.join(args.out, name))
            print(
                json.dumps(
                    {
                        "source": source.describe(),
                        "stats": res.stats,
                        "out": args.out,
                        "format": args.format,
                    }
                )
            )
            return 0
        finally:
            source.close()
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
