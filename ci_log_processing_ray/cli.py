"""CLI entry point: the rebuild's analogue of the reference's
``logscraper`` + ``logsender`` console scripts (setup.cfg:25-29).

One command runs the whole parse -> enrich -> route -> write+aggregate
batch (or a --follow polling loop) over a directory/glob of
pre-tokenized Parquet shards:

    python -m ci_log_processing_ray \
        --inputs '/data/corpus/token_sequences/*.parquet' \
        --build-meta /data/corpus/build_meta.parquet \
        --out /data/routed --skip-debug

    # micro-batch streaming (the reference's --follow --wait-time):
    ... --follow --ticks 10 --wait-time 120

This module OWNS a Ray session (guarded init) -- the only places
allowed to, per the driver contract.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ci-log-processing-ray",
        description="Ray-Data-native CI log parse->enrich->route->aggregate")
    p.add_argument("--inputs", required=True,
                   help="glob of token-sequence parquet shards")
    p.add_argument("--build-meta", required=True,
                   help="build_meta parquet path")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--skip-debug", action="store_true",
                   help="drop lines containing DEBUG (logsender --skip-debug)")
    p.add_argument("--fill-mode", choices=["batch", "grouped"],
                   default="batch")
    p.add_argument("--no-resume", action="store_true",
                   help="reprocess inputs even if manifests exist")
    p.add_argument("--follow", action="store_true",
                   help="poll for new inputs (reference --follow)")
    p.add_argument("--ticks", type=int, default=1000000,
                   help="max polling ticks in --follow mode")
    p.add_argument("--wait-time", type=float, default=120.0,
                   help="seconds between ticks (reference default 120)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        from .config import PipelineConfig
        from .pipelines.flagship import run_pipeline
        from .pipelines.follow import run_follow

        cfg = PipelineConfig(skip_debug=args.skip_debug,
                             fill_mode=args.fill_mode)

        def list_inputs():
            return sorted(glob.glob(args.inputs))

        if args.follow:
            results = run_follow(
                list_inputs, args.build_meta, args.out, cfg,
                ticks=args.ticks, wait_seconds=args.wait_time,
                sleep_fn=time.sleep, clock0=time.time(),
                stop_when_idle=False)
        else:
            results = [run_pipeline(list_inputs(), args.build_meta,
                                    args.out, cfg,
                                    resume=not args.no_resume,
                                    clock_now=time.time())]
        last = results[-1]
        print(json.dumps({
            "ticks": len(results),
            "n_pending": last.n_pending,
            "n_skipped": last.n_skipped,
            "routed_dir": last.routed_dir,
            "counts": last.counts.to_pylist(),
        }, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
