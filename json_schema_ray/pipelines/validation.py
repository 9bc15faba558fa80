"""Flagship pipeline: full validation of an interleaved document table.

Physical plan (Ray-Data-first; SURVEY.md §3 target lifecycle):

1. WIDE SCAN (one pass, streaming): ``read_parquet`` over the pending
   hive partitions → ``map_batches(SpanValidator)`` actor pool emits the
   narrow results stream (violations + per-partition partials + sketch
   partials).  Only this small stream is materialized — never the input.
2. NARROW SCAN: ``read_parquet(columns=[doc_id])`` (column pruning) →
   salted two-phase groupby → duplicate doc_ids (stages/shuffle.py).
3. SKETCH MERGE: partial HLL / t-digest blobs merge (two-level tree on
   Ray for large runs, driver-side below the threshold).
4. DRIFT: merged t-digests vs baseline profile → KS / PSI verdicts.
5. WRITE: violations parquet partitioned by ``partition_id``
   (idempotent: stale dirs of uncompleted partitions are cleared first),
   per-partition verdicts, then atomic manifest completion entries with
   lineage + metrics (state/checkpoint.py) — a rerun skips completed
   partitions at the read.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.drift import drift_table, merge_sketch_rows, merge_sketches_distributed
from ..stages.shuffle import find_duplicate_keys
from ..stages.validate import SpanValidator
from ..state.checkpoint import Manifest

PLAN_FINGERPRINT = "span-plan-v1"  # bump when compiled constraints change

# per-worker-process cache: a broadcast object is ray.get + pa.array-built
# once per worker, then reused by every task that lands there
_WORKER_VALIDATORS: dict = {}


def _task_validator(catalog_ref):
    """Stateless-task flavor of the SpanValidator stage: same kernels, but
    scheduled as plain tasks over the (already warm) worker pool instead
    of a fresh actor pool.  State amortization comes from the per-worker
    module cache keyed by the broadcast ObjectRef."""

    def validate_batch(batch: pa.Table) -> pa.Table:
        key = catalog_ref.hex() if catalog_ref is not None else None
        sv = _WORKER_VALIDATORS.get(key)
        if sv is None:
            sv = SpanValidator(catalog_ref=catalog_ref)
            _WORKER_VALIDATORS[key] = sv
        return sv(batch)

    return validate_batch


@dataclass
class ValidationReport:
    verdicts: pa.Table
    violations_path: str | None
    n_violations: int
    profile: dict = field(default_factory=dict)  # feature -> (kind, blob)
    drift: pa.Table | None = None
    skipped_partitions: list[int] = field(default_factory=list)
    timings: dict = field(default_factory=dict)

    @property
    def all_pass(self) -> bool:
        if len(self.verdicts) == 0:
            return True
        ok = not pa.compute.any(pa.compute.invert(self.verdicts["pass"])).as_py()
        if self.drift is not None and len(self.drift):
            ok = ok and not pa.compute.any(self.drift["drifted"]).as_py()
        return ok


def discover_partitions(docs_dir: str) -> dict[int, list[str]]:
    """Map partition_id -> parquet files (hive layout ``partition_id=K/``).
    A flat directory/file is treated as a single partition 0."""
    parts: dict[int, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(docs_dir, "partition_id=*"))):
        m = re.search(r"partition_id=(\d+)", d)
        if m:
            parts[int(m.group(1))] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not parts:
        files = sorted(glob.glob(os.path.join(docs_dir, "*.parquet"))) if os.path.isdir(docs_dir) else [docs_dir]
        parts[0] = files
    return parts


def run_validation(
    docs_dir: str,
    catalog_path: str | None = None,
    out_dir: str | None = None,
    resume: bool = True,
    baseline_profile: dict | None = None,
    max_partitions: int | None = None,  # fault-injection: stop after K partitions
    concurrency: int | None = None,
    batch_size: int = 8192,
    n_salts: int = 16,
    distributed_sketch_merge: bool = False,
    check_unique: bool = True,
    use_actors: bool = False,
    referential_strategy: str = "broadcast",  # "broadcast" | "hash" (large catalogs)
) -> ValidationReport:
    """Run the full validation job.  Ray must already be initialized
    (callers own the session; see __ray_entry__.py contract)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    t0 = time.time()
    timings: dict[str, float] = {}

    parts = discover_partitions(docs_dir)
    manifest = Manifest(out_dir, PLAN_FINGERPRINT) if out_dir else None
    skipped: list[int] = []
    todo: dict[int, list[str]] = {}
    for pid, files in parts.items():
        if resume and manifest is not None and manifest.is_done(pid, files):
            skipped.append(pid)
        else:
            todo[pid] = files
    if max_partitions is not None:
        todo = dict(sorted(todo.items())[:max_partitions])

    viol_root = os.path.join(out_dir, "violations") if out_dir else None
    if viol_root:
        # idempotent restart: clear stale outputs of partitions being (re)run
        for pid in todo:
            shutil.rmtree(os.path.join(viol_root, f"partition_id={pid}"), ignore_errors=True)

    if not todo:
        verdicts = _load_verdicts_from_manifest(manifest)
        return ValidationReport(verdicts, viol_root, 0, skipped_partitions=skipped, timings=timings)

    all_files = [f for files in todo.values() for f in files]

    # broadcast the media catalog once (ray.put), read per worker; with
    # referential_strategy="hash" the scan skips the check and the
    # hash-partitioned semi-join stage supplies the dangling rows instead
    catalog_ref = None
    if catalog_path and referential_strategy == "broadcast":
        cat_refs = pq.read_table(catalog_path, columns=["media_ref"])["media_ref"].to_pylist()
        catalog_ref = ray.put(cat_refs)

    # ---------------- stage 1: wide scan -------------------------------
    t = time.time()
    ds = rd.read_parquet(all_files)
    # hive layouts carry partition_id in the path (no schema fetch needed)
    hive_layout = all(("partition_id=" in f) for f in all_files)
    if not hive_layout and "partition_id" not in ds.schema().names:
        # flat (non-hive) layout: single-partition fallback — tag constant 0
        def tag_partition(batch: pa.Table) -> pa.Table:
            if "partition_id" in batch.column_names:
                return batch
            return batch.append_column(
                "partition_id", pa.array(np.zeros(len(batch), dtype=np.int32))
            )

        ds = ds.map_batches(tag_partition, batch_format="pyarrow")

    # uniqueness runs CONCURRENTLY with the wide scan (independent narrow
    # read, column-pruned to doc_id): the streaming executor interleaves
    # both dataset executions, so the shuffle's latency hides behind the
    # read-bound scan instead of serializing after it.
    uniq_future = None
    if check_unique:
        from concurrent.futures import ThreadPoolExecutor

        _uniq_pool = ThreadPoolExecutor(max_workers=1)

        def _run_uniqueness():
            key_ds = rd.read_parquet(all_files, columns=["doc_id"])
            return find_duplicate_keys(key_ds, "doc_id", n_salts=n_salts)

        uniq_start = time.time()
        uniq_future = _uniq_pool.submit(_run_uniqueness)

    if use_actors:
        # actor pool: catalog loaded once per actor in __init__
        results_ds = ds.map_batches(
            SpanValidator,
            fn_constructor_kwargs={"catalog_ref": catalog_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or 4,
            num_cpus=1,
        )
    else:
        # task pool (default): elastic over all CPUs, reuses the warm worker
        # processes (no per-actor cold start); the broadcast catalog is
        # ray.get-cached per worker process (module-level cache)
        results_ds = ds.map_batches(
            _task_validator(catalog_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    # results ∝ violations + per-batch partials: small by design — pull it
    # to the driver ONCE and split locally (three Ray passes over a tiny
    # dataset would cost 3× stage-launch latency)
    res_df = results_ds.to_pandas()
    timings["scan_validate"] = time.time() - t

    partials = res_df[res_df["record_type"] == "partial"]
    viol_df = res_df[res_df["record_type"] == "violation"]

    # -------- hash-partitioned referential semi-join (large catalogs) ----
    if catalog_path and referential_strategy == "hash":
        from ..stages.referential import hash_referential_dangling

        dangling = hash_referential_dangling(ds, catalog_path).to_pandas()
        if len(dangling):
            add = dangling.assign(
                record_type="violation",
                constraint_id="spans[].media_ref/referential",
                error_type="REFERENTIAL",
                actual=dangling["media_ref"],
                n_docs=0, n_bad=0, feature=None, sketch_kind=None, blob=None,
            ).drop(columns=["media_ref"])
            viol_df = pd.concat([viol_df, add[viol_df.columns]], ignore_index=True)
            # partial adjustments: per-constraint counts + __all__ union
            # (docs not already flagged by another constraint)
            already_bad = set(
                zip(res_df.loc[res_df["record_type"] == "violation", "partition_id"],
                    res_df.loc[res_df["record_type"] == "violation", "doc_id"])
            )
            extra_rows = []
            per_part = dangling.groupby("partition_id")
            for p, g in per_part:
                docs = set(g["doc_id"])
                newly_bad = {d for d in docs if (p, d) not in already_bad}
                extra_rows.append(
                    {"record_type": "partial", "partition_id": p,
                     "constraint_id": "spans[].media_ref/referential",
                     "n_docs": 0, "n_bad": len(docs)}
                )
                if newly_bad:
                    extra_rows.append(
                        {"record_type": "partial", "partition_id": p,
                         "constraint_id": "__all__", "n_docs": 0, "n_bad": len(newly_bad)}
                    )
            partials = pd.concat(
                [partials, pd.DataFrame(extra_rows)], ignore_index=True
            )
    n_viol = len(viol_df)

    # ---------------- stage 2: uniqueness shuffle (join) ----------------
    dup_tbl = None
    if uniq_future is not None:
        t = time.time()
        dup_tbl = uniq_future.result()
        _uniq_pool.shutdown(wait=False)
        timings["uniqueness_join_wait"] = time.time() - t
        timings["uniqueness_shuffle"] = time.time() - uniq_start

    # ---------------- stage 3: sketch merge ----------------------------
    t = time.time()
    sk_df = res_df[res_df["record_type"] == "sketch"][["feature", "sketch_kind", "blob"]]
    if distributed_sketch_merge and len(sk_df):
        profile = merge_sketches_distributed(rd.from_pandas(sk_df.reset_index(drop=True)))
    else:
        profile = merge_sketch_rows(sk_df) if len(sk_df) else {}
    timings["sketch_merge"] = time.time() - t

    # ---------------- stage 4: drift -----------------------------------
    drift = None
    if baseline_profile:
        drift = drift_table(profile, baseline_profile)

    # ---------------- stage 5: write + verdicts + manifest --------------
    t = time.time()
    if viol_root and n_viol:
        import pyarrow.dataset as pads

        viol_cols = ["partition_id", "doc_id", "span_index", "constraint_id", "error_type", "actual"]
        viol_tbl = pa.Table.from_pandas(viol_df[viol_cols].reset_index(drop=True), preserve_index=False)
        # violation volume is capped per (constraint × batch) → driver-side
        # partitioned write; layout identical to a distributed writer's
        pads.write_dataset(
            viol_tbl,
            viol_root,
            format="parquet",
            partitioning=pads.partitioning(pa.schema([("partition_id", pa.int32())]), flavor="hive"),
            existing_data_behavior="overwrite_or_ignore",
        )

    verdicts, per_part_metrics = _build_verdicts(partials, dup_tbl, todo.keys())

    if out_dir:
        pq.write_table(verdicts, os.path.join(out_dir, "verdicts.parquet"))
        _save_profile(profile, os.path.join(out_dir, "profile.json"))
        if drift is not None:
            pq.write_table(drift, os.path.join(out_dir, "drift.parquet"))
    if manifest is not None:
        for pid, files in todo.items():
            manifest.complete(pid, files, per_part_metrics.get(pid, {}))
    timings["write"] = time.time() - t
    timings["total"] = time.time() - t0

    return ValidationReport(
        verdicts, viol_root, n_viol, profile, drift, skipped, timings
    )


def _pid_from_path(p: str) -> int:
    m = re.search(r"partition_id=(\d+)", p)
    return int(m.group(1)) if m else 0


def _build_verdicts(partials: pd.DataFrame, dup_tbl: pa.Table | None, pids) -> tuple[pa.Table, dict]:
    rows = []
    metrics: dict[int, dict] = {}
    dup_docs_total = 0
    if dup_tbl is not None and len(dup_tbl):
        dup_docs_total = len(set(dup_tbl["doc_id"].to_pylist()))
    agg = (
        partials[partials["constraint_id"] == "__all__"]
        .groupby("partition_id")[["n_docs", "n_bad"]]
        .sum()
        if len(partials)
        else pd.DataFrame(columns=["n_docs", "n_bad"])
    )
    by_constraint = (
        partials[partials["constraint_id"] != "__all__"]
        .groupby(["partition_id", "constraint_id"])["n_bad"]
        .sum()
        if len(partials)
        else pd.Series(dtype=np.int64)
    )
    for pid in sorted(pids):
        n_docs = int(agg["n_docs"].get(pid, 0)) if len(agg) else 0
        n_bad = int(agg["n_bad"].get(pid, 0)) if len(agg) else 0
        cons = {}
        if len(by_constraint):
            sub = by_constraint.loc[by_constraint.index.get_level_values(0) == pid]
            cons = {cid: int(v) for (_, cid), v in sub.items()}
        has_dup = dup_docs_total > 0  # dataset-level: uniqueness is cross-partition
        rows.append(
            {
                "partition_id": int(pid),
                "n_docs": n_docs,
                "n_bad_docs": n_bad,
                "n_dup_doc_ids": dup_docs_total,
                "pass": bool(n_bad == 0 and not has_dup),
                "constraints": json.dumps(cons, sort_keys=True),
            }
        )
        metrics[pid] = {"n_docs": n_docs, "n_bad_docs": n_bad, "constraints": cons}
    t = pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "partition_id": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_bad_docs": pa.array([], type=pa.int64()),
            "n_dup_doc_ids": pa.array([], type=pa.int64()),
            "pass": pa.array([], type=pa.bool_()),
            "constraints": pa.array([], type=pa.string()),
        }
    )
    return t, metrics


def _load_verdicts_from_manifest(manifest: Manifest | None) -> pa.Table:
    rows = []
    if manifest is not None:
        for pid, e in sorted(manifest.completed().items()):
            m = e.get("metrics", {})
            rows.append(
                {
                    "partition_id": pid,
                    "n_docs": m.get("n_docs", 0),
                    "n_bad_docs": m.get("n_bad_docs", 0),
                    "n_dup_doc_ids": 0,
                    "pass": m.get("n_bad_docs", 0) == 0,
                    "constraints": json.dumps(m.get("constraints", {}), sort_keys=True),
                }
            )
    return pa.Table.from_pylist(rows) if rows else pa.table({"partition_id": pa.array([], type=pa.int64())})


def _save_profile(profile: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump({k: {"kind": kind, "blob": blob.hex()} for k, (kind, blob) in profile.items()}, f)


def load_profile(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    return {k: (v["kind"], bytes.fromhex(v["blob"])) for k, v in raw.items()}
