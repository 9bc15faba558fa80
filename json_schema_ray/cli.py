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

    c = sub.add_parser(
        "check",
        help="validate a JSONL/Parquet file of JSON documents against a schema "
        "(the reference's Schema.apply workload, distributed)",
    )
    c.add_argument("--schema", required=True, help="path to a JSON Schema file")
    c.add_argument("--input", required=True, help=".jsonl/.ndjson/.parquet of documents")
    c.add_argument("--dialect", default=None, choices=["2020-12", "2019-09", "draft7"])
    c.add_argument("--assert-formats", action="store_true")
    c.add_argument("--max-errors", type=int, default=10, help="violation examples to print")
    c.add_argument(
        "--explain", action="store_true",
        help="render each collected example as a hierarchical failure tree "
        "(hierarchyFormat analog) instead of a flat violation line",
    )
    c.add_argument("--num-cpus", type=int, default=None, help="only for standalone ray.init")

    cu = sub.add_parser(
        "curate",
        help="run the training-data curation funnel (filter → PII scrub → "
        "dedup → near-dedup → decontaminate → split → pack → write)",
    )
    cu.add_argument("--input", required=True, help="parquet/lance/JSONL corpus")
    cu.add_argument("--out", required=True, help="stage-output root dir")
    cu.add_argument("--benchmark", default=None, help="held-out eval parquet (decontamination)")
    cu.add_argument("--langs", default="en", help="comma-separated langs to keep")
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--near-dup-threshold", type=float, default=0.6)
    cu.add_argument("--pack-capacity", type=int, default=None, help="tokens per training bin")
    cu.add_argument("--no-redact", dest="redact", action="store_false", default=True)
    cu.add_argument("--resume", action="store_true", default=True)
    cu.add_argument("--no-resume", dest="resume", action="store_false")
    cu.add_argument("--concurrency", type=int, default=4)
    cu.add_argument("--num-cpus", type=int, default=None, help="only for standalone ray.init")

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
        if args.cmd == "check":
            return _check(args)
        if args.cmd == "curate":
            return _curate(args)
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


def _curate(args) -> int:
    import pyarrow.parquet as pq

    from .pipelines.curation import run_curation

    bench = pq.read_table(args.benchmark) if args.benchmark else None
    rep = run_curation(
        args.input,
        args.out,
        langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        near_dup_threshold=args.near_dup_threshold,
        pack_capacity=args.pack_capacity,
        redact=args.redact,
        benchmark_texts=bench,
        resume=args.resume,
        concurrency=args.concurrency,
    )
    row = {k: (v[0].as_py() if hasattr(v[0], "as_py") else v[0]) for k, v in
           zip(rep.to_table().column_names, rep.to_table().columns)}
    row["resumed_stages"] = rep.resumed_stages
    print(json.dumps(row))
    return 0 if row.get("funnel_ok") else 3


def _check(args) -> int:
    """Compile once on the driver, validate many on workers: each batch's
    rows re-assemble into JSON objects (row == one document) and run
    through the compiled closure tree; per-batch partials carry counts
    plus up to ``max_errors`` rendered violation examples."""
    import pyarrow as pa

    from .builder import ConstraintEngineBuilder
    from .sources.reader import read_auto

    with open(args.schema) as f:
        schema = json.load(f)
    b = ConstraintEngineBuilder().use_official_metaschemas()
    if args.dialect:
        b.dialect(args.dialect)
    if args.assert_formats:
        b.assert_formats()
    cs = b.compile(schema)
    cap = args.max_errors
    explain = getattr(args, "explain", False)

    def _example(i: int, out) -> str:
        if explain:
            from .spec.errors import hierarchy_format

            return json.dumps({"row": i, "tree": hierarchy_format(out)})[:2000]
        v = (out.errors or [None])[0]
        return json.dumps({"row": i, "violation": str(v)})[:400]

    def _partial(n: int, n_ok: int, examples: list[str]) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "n_ok": pa.array([n_ok], type=pa.int64()),
                "examples": pa.array([examples], type=pa.list_(pa.string())),
            }
        )

    def validate(batch: pa.Table) -> pa.Table:
        objs = batch.to_pylist()
        n_ok = 0
        examples: list[str] = []
        for i, o in enumerate(objs):
            out = cs.evaluate(o)
            if out.ok:
                n_ok += 1
            elif len(examples) < cap:
                examples.append(_example(i, out))
        return _partial(len(objs), n_ok, examples)

    def validate_lines(batch: pa.Table) -> pa.Table:
        # Raw-text path (reference Schema.apply-on-text semantics,
        # js/Schema.java:41-66): each line IS the document.  Going through
        # an inferred Arrow schema would unify fields across records —
        # missing keys materialize as explicit nulls and keys seen only in
        # other documents get injected — silently flipping `required`,
        # `type`, and `additionalProperties: false` verdicts.
        n = 0
        n_ok = 0
        examples: list[str] = []
        for i, line in enumerate(batch["text"].to_pylist()):
            if line is None or not line.strip():
                continue
            n += 1
            out = cs.apply(line)
            if out.ok:
                n_ok += 1
            elif len(examples) < cap:
                examples.append(_example(i, out))
        return _partial(n, n_ok, examples)

    if args.input.endswith((".jsonl", ".ndjson")):
        import ray

        ds = ray.data.read_text(args.input).map_batches(
            validate_lines, batch_format="pyarrow"
        )
    else:
        ds = read_auto(args.input).map_batches(validate, batch_format="pyarrow")
    parts = ds.take_all()
    n = sum(r["n"] for r in parts)
    n_ok = sum(r["n_ok"] for r in parts)
    examples = [e for r in parts for e in r["examples"]][:cap]
    print(json.dumps({"n_docs": n, "n_valid": n_ok, "n_invalid": n - n_ok, "examples": examples}))
    return 0 if n_ok == n else 3


if __name__ == "__main__":
    sys.exit(main())
