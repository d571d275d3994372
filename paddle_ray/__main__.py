"""CLI entry point — the `ray job submit` surface (north_rule).

On a real cluster:

    ray job submit --working-dir . -- python -m paddle_ray run \
        --input s3://bucket/pages/*.parquet --out s3://bucket/extracted

In this sandbox it runs against local parquet. Subcommands:

- ``run``    — the flagship checkpointed extraction JOB: read pages
               parquet -> sniff/partition -> extractor + captioner actor
               pools -> per-partition parquet + manifests (exact resume:
               re-running skips completed partitions).
- ``gen``    — write a deterministic synthetic pages table (FIXTURES.md
               grammar) to parquet, for building job inputs.
- ``status`` — report a checkpoint dir: completed/total partitions, rows.

This module owns a Ray session (guarded init); the driver-facing library
surface (__ray_entry__, paddle_ray.*) never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_init(num_cpus: int | None) -> None:
    from paddle_ray.core.session import init_local_ray

    init_local_ray(num_cpus)


def cmd_run(args: argparse.Namespace) -> int:
    _ray_init(args.cpus)
    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.state import checkpoint as ckpt

    # env layer applies on the job-submit surface (defaults < env < flags):
    # IMAGE_CAPTIONING_ENABLED / MAX_NUM_INPUT_IMGS, ≙ model.py:36-42
    cfg = ExtractConfig.from_env(
        **({"captioning_enabled": False} if args.no_captions else {})
    )
    t0 = time.time()
    inputs = args.input  # read_pages/read_parquet accept a list directly
    manifests = extract_pipeline(
        inputs,
        cfg=cfg,
        out_dir=args.out,
        resume=not args.no_resume,
        with_metrics=args.metrics,
        partitioning="planned" if args.planned_partitions else "streaming",
    ).to_pandas()
    wall = time.time() - t0
    if args.metrics:
        from paddle_ray.state.metrics import write_metrics_parquet

        write_metrics_parquet(args.out)
    done = ckpt.completed_partitions(args.out)
    rows_this_run = int(manifests.row_count.sum()) if len(manifests) else 0
    summary = {
        "out_dir": args.out,
        "partitions_written_this_run": int(len(manifests)),
        "partitions_complete_total": len(done),
        "rows_written_this_run": rows_this_run,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(rows_this_run / wall, 2) if wall > 0 else None,
    }
    print(json.dumps(summary))
    return 0


def cmd_gen(args: argparse.Namespace) -> int:
    from paddle_ray.sources.pages import write_pages_parquet

    expected = write_pages_parquet(
        args.out, args.n, seed=args.seed, pdf_every=args.pdf_every, outlier_every=args.outlier_every
    )
    print(json.dumps({"path": args.out, "n_pages": args.n, "n_expected_texts": len(expected)}))
    return 0


def cmd_mix(args: argparse.Namespace) -> int:
    _ray_init(args.cpus)
    from paddle_ray.pipelines.curate import build_training_mix

    plan = build_training_mix(args.sf_dir, budget=args.budget)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "budget": args.budget,
                "cells": plan.to_dict(orient="records"),
                "quota_total": int(plan.quota.sum()),
            }
        )
    )
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    _ray_init(args.cpus)
    from paddle_ray.pipelines.analysis import validate_orders

    rep = validate_orders(args.sf_dir)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "checks": rep.to_dict(orient="records"),
                "all_passed": bool((rep.passed == 1).all()),
            }
        )
    )
    return 0 if args.no_strict or bool((rep.passed == 1).all()) else 1


def cmd_status(args: argparse.Namespace) -> int:
    from paddle_ray.state import checkpoint as ckpt

    manifests = ckpt.completed_manifests(args.out)
    rows = sum(int(m.get("row_count", 0)) for m in manifests)
    summary = {"out_dir": args.out, "partitions_complete": len(manifests), "rows": rows}
    if args.deep:
        ok, bad = ckpt.verify_output(args.out)
        summary["verified_partitions"] = len(ok)
        summary["corrupt_partitions"] = bad  # ids; empty when clean
        print(json.dumps(summary))
        return 1 if bad else 0
    print(json.dumps(summary))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m paddle_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="checkpointed extraction job")
    pr.add_argument("--input", nargs="+", required=True, help="pages parquet path(s)")
    pr.add_argument("--out", required=True, help="checkpointed output dir")
    pr.add_argument("--cpus", type=int, default=None)
    pr.add_argument("--no-resume", action="store_true", help="recompute completed partitions")
    pr.add_argument("--no-captions", action="store_true")
    pr.add_argument("--metrics", action="store_true", help="write _metrics/metrics.parquet lineage rollup")
    pr.add_argument(
        "--planned-partitions",
        action="store_true",
        help="exact LPT byte-balanced partitions (one extra slim pre-pass) "
        "instead of single-pass streaming assignment",
    )
    pr.set_defaults(fn=cmd_run)

    pg = sub.add_parser("gen", help="write synthetic pages parquet")
    pg.add_argument("--out", required=True)
    pg.add_argument("--n", type=int, default=1000)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--pdf-every", type=int, default=20)
    pg.add_argument("--outlier-every", type=int, default=200)
    pg.set_defaults(fn=cmd_gen)

    pm = sub.add_parser("mix", help="build the (tier, lang) training-mix plan")
    pm.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="tables dir")
    pm.add_argument("--budget", type=int, default=100_000, help="token budget to apportion")
    pm.add_argument("--cpus", type=int, default=None)
    pm.set_defaults(fn=cmd_mix)

    pv = sub.add_parser("validate", help="run the data-quality constraint suite")
    pv.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="tables dir")
    pv.add_argument("--cpus", type=int, default=None)
    pv.add_argument("--no-strict", action="store_true", help="exit 0 even on violations")
    pv.set_defaults(fn=cmd_validate)

    ps = sub.add_parser("status", help="report a checkpoint dir")
    ps.add_argument("--out", required=True)
    ps.add_argument(
        "--deep",
        action="store_true",
        help="recompute content hashes from the written parquet and verify "
        "every complete manifest (exit 1 on any mismatch)",
    )
    ps.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
