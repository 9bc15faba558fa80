"""CLI entrypoint — the ``ray job submit`` surface.

    ray job submit -- python -m json_schema_ray.cli validate \
        --input /data/documents --catalog /data/media_catalog.parquet \
        --out /data/out [--resume] [--baseline /data/profile.json]

Owns a Ray session ONLY when run standalone (guarded init, per the
driver contract in __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="json_schema_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the full validation pipeline")
    v.add_argument("--input", required=True, help="documents dir (hive partition_id=K layout)")
    v.add_argument("--catalog", default=None, help="media catalog parquet")
    v.add_argument("--out", required=True, help="output dir (violations/ verdicts/ manifest/)")
    v.add_argument("--resume", action="store_true", default=True)
    v.add_argument("--no-resume", dest="resume", action="store_false")
    v.add_argument("--baseline", default=None, help="baseline profile.json for drift checks")
    v.add_argument("--concurrency", type=int, default=8)
    v.add_argument("--batch-size", type=int, default=8192)
    v.add_argument("--max-partitions", type=int, default=None)
    v.add_argument("--num-cpus", type=int, default=None, help="only for standalone ray.init")

    g = sub.add_parser("generate", help="write a synthetic interleaved dataset")
    g.add_argument("--out", required=True)
    g.add_argument("--n-docs", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--n-parts", type=int, default=8)
    g.add_argument("--skew", type=float, default=0.0)

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from .sources.interleaved import generate, write_dataset

        data = generate(n_docs=args.n_docs, seed=args.seed, n_parts=args.n_parts, skew=args.skew)
        paths = write_dataset(args.out, data)
        print(json.dumps({"written": paths, "n_docs": args.n_docs}))
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    try:
        from .pipelines.validation import load_profile, run_validation

        baseline = load_profile(args.baseline) if args.baseline else None
        report = run_validation(
            args.input,
            catalog_path=args.catalog,
            out_dir=args.out,
            resume=args.resume,
            baseline_profile=baseline,
            concurrency=args.concurrency,
            batch_size=args.batch_size,
            max_partitions=args.max_partitions,
        )
        print(
            json.dumps(
                {
                    "all_pass": report.all_pass,
                    "n_violations": report.n_violations,
                    "partitions": len(report.verdicts),
                    "skipped_partitions": report.skipped_partitions,
                    "timings": {k: round(v, 3) for k, v in report.timings.items()},
                }
            )
        )
        return 0 if report.all_pass else 3
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
