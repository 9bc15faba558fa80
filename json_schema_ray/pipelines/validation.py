"""Flagship pipeline: full validation of an interleaved document table.

Physical plan (Ray-Data-first; SURVEY.md §3 target lifecycle):

1. WIDE SCAN (ONE streaming pass; FUSED with the read when the layout
   has ≥2 files per CPU — decode + validate in a single task, no
   object-store materialization of the decoded corpus): ``read_parquet``
   over the pending hive partitions → span-validator tasks.  Each task
   runs the vectorized span kernels, WRITES its own violation rows into
   the hive-partitioned output (side output; content-derived filenames →
   task retries overwrite, idempotent), and emits per-partition count
   partials + HLL/t-digest partials + per-batch ``value_counts(doc_id)``
   uniqueness partials — the driver never holds a violation row.
   (``referential_strategy="hash"`` keeps the violation stream instead,
   since the semi-join's dangling rows merge in later.)
2. UNIQUENESS, folded (fresh full runs): one raw-task pass over the
   scan's own output blocks splits driver-bound aux rows from
   hash-bucketed (doc_id, cnt) partials → per-bucket reduce
   (stages/shuffle.find_duplicate_keys_folded) — ZERO extra dataset
   executions.  Resume runs (scan skips completed partitions) fall back
   to the concurrent NARROW SCAN: ``read_parquet(columns=[doc_id])``
   over ALL partitions → per-block ``value_counts`` combiner → explicit
   hash-bucket map-reduce (measured 5-7× the sort-based groupby).
3. SKETCH MERGE: partial HLL / t-digest blobs merge (Ray tree above
   ~2000 partials, driver-side below — stage-launch latency dominates
   small merges).
4. DRIFT: merged t-digests vs baseline profile → KS / PSI verdicts.
5. VERDICTS + MANIFEST: per-partition verdict rows (manifest rows of
   completed partitions merged back in on resume), dataset-level
   duplicate count persisted, atomic completion entries with lineage +
   metrics (state/checkpoint.py) — a rerun prunes completed partitions
   at the read.
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
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.drift import drift_table, merge_sketch_rows, merge_sketches_distributed
from ..stages.shuffle import find_duplicate_keys
from ..stages.validate import SpanValidator
from ..state.checkpoint import Manifest

PLAN_FINGERPRINT = "span-plan-v1"  # bump when compiled constraints change


def _auto_blocks(all_files: list[str], n_cpus: int) -> int:
    """Read-split width: ~16 blocks/CPU on large inputs (load-balance
    granularity against stragglers; measured 4.7× on the 6M-doc corpus),
    but BYTE-CLAMPED so small inputs don't pay 512 tasks of per-task
    overhead for kilobyte blocks — a 60k-doc corpus at 32 CPUs measured
    4.18 s at the flat 16/CPU split vs 2.48 s byte-clamped (the per-task
    scheduling+result overhead is ~4 ms, pure fixed cost at that size).
    The clamp leaves ≥2 waves per CPU so the streaming executor can still
    pipeline, and never splits below the file count."""
    bpc = int(os.environ.get("JSR_BLOCKS_PER_CPU", "16"))
    target = int(os.environ.get("JSR_TARGET_BLOCK_BYTES", str(256 * 1024)))
    try:
        total_bytes = sum(os.path.getsize(f) for f in all_files)
    except OSError:
        total_bytes = None
    cap = n_cpus * bpc
    if total_bytes is not None:
        cap = min(cap, total_bytes // target + 1)
    return max(len(all_files), n_cpus * 2, cap)

# per-worker-process cache: a broadcast object is ray.get + pa.array-built
# once per worker, then reused by every task that lands there
_WORKER_VALIDATORS: dict = {}


def _apply_cpu_headroom(frac: float = 0.75, threshold: int = 16):
    """Cap Ray Data execution CPU below the advertised core count on wide
    sessions (≥ ``threshold`` CPUs → use ``frac`` of them).  Returns a
    restore callable so the caller can scope the cap to its own run (the
    DataContext is process-global).

    Rationale (measured, see BASELINE.md round 3): on an overcommitted /
    virtualized host, claiming every vCPU creates a STEAL CONVOY — a
    worker holding a page-table lock or servicing a TLB-shootdown IPI
    gets descheduled by the hypervisor and every other vCPU stalls
    behind it.  Interleaved A/B at the same host load, compute-weighted
    corpus: 32-way 20.9 s / 43.3 s vs 24-way **10.5 s / 7.8 s** — 2-5.5×
    from LEAVING A QUARTER of the cores idle.  Narrow sessions (8-way)
    show no such friction, so they keep every core.  This is the
    single-VM analog of leaving cores for system daemons on a real
    cluster node; disable with ``JSR_CPU_HEADROOM=0``.
    """
    frac_env = os.environ.get("JSR_CPU_HEADROOM")
    if frac_env is not None:
        f = float(frac_env)
        if f <= 0:
            return _noop_restore
        frac = f
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return _noop_restore
    if n < threshold:
        return _noop_restore
    from ray.data import DataContext, ExecutionResources

    opts = DataContext.get_current().execution_options
    prev = opts.resource_limits
    opts.resource_limits = ExecutionResources(cpu=max(threshold - 1, int(n * frac)))

    def restore() -> None:
        opts.resource_limits = prev

    return restore


def _noop_restore() -> None:
    return None


def _task_validator(
    catalog_ref, viol_dir: str | None = None, extended: bool = False,
    fault_marker: str | None = None, emit_uniq: bool = False,
):
    """Stateless-task flavor of the SpanValidator stage: same kernels, but
    scheduled as plain tasks over the (already warm) worker pool instead
    of a fresh actor pool.  State amortization comes from the per-worker
    module cache keyed by (broadcast ObjectRef, violation output dir,
    check profile)."""

    def validate_batch(batch: pa.Table) -> pa.Table:
        if fault_marker is not None:
            # chaos hook: the FIRST task to get here kills its worker — a
            # machine-loss simulation; Ray re-executes from lineage and the
            # idempotent side-output overwrites itself
            from ..state.checkpoint import chaos_kill_once

            chaos_kill_once(fault_marker)
        key = (
            catalog_ref.hex() if catalog_ref is not None else None,
            viol_dir, extended, emit_uniq,
        )
        sv = _WORKER_VALIDATORS.get(key)
        if sv is None:
            if len(_WORKER_VALIDATORS) >= 4:
                # long-lived workers serve many runs; each cached validator
                # pins a catalog array — bound the cache instead of leaking
                _WORKER_VALIDATORS.clear()
            sv = SpanValidator(
                catalog_ref=catalog_ref, viol_dir=viol_dir,
                extended_checks=extended, emit_uniq=emit_uniq,
            )
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
    distributed_sketch_merge: bool | str = "auto",
    check_unique: bool = True,
    use_actors: bool = False,
    referential_strategy: str = "broadcast",  # | "hash" | "hash_distinct" (large catalogs)
    extended_checks: bool | str = False,  # compute-weighted content battery (quality/tokens/winnow); "regex" skips the bandwidth-bound winnow pass
    fault_marker: str | None = None,  # chaos hook: first scan task to reach it kills its worker (os._exit) exactly once — exercises lineage re-execution (tests/test_fault_tolerance.py)
) -> ValidationReport:
    """Run the full validation job.  Ray must already be initialized
    (callers own the session; see __ray_entry__.py contract)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    t0 = time.time()
    timings: dict[str, float] = {}

    # scoped: restored at each return (on exception the cap persists for
    # the process — harmless, it is a performance knob, not a semantic one).
    # The cap is a decode-profile mitigation: the extended (compute) battery
    # keeps cores in userspace arithmetic, where idling a quarter of them
    # just loses throughput — calm-phase same-phase A/B at 32 CPUs measured
    # 8.4–9.2 s capped vs 7.0–7.2 s uncapped (round 4), so extended runs
    # default the cap OFF (JSR_CPU_HEADROOM still overrides either way).
    _restore_headroom = (
        _noop_restore
        if (extended_checks and os.environ.get("JSR_CPU_HEADROOM") is None)
        else _apply_cpu_headroom()
    )

    from ..sources.reader import is_lance_dataset, read_auto

    # Lance input (BASELINE.json input_hint): partition_id is a COLUMN of
    # the versioned table, not a hive path — file-level partition
    # discovery / resume pruning are parquet-layout features and don't
    # apply (a Lance-native resume would key the manifest on the dataset
    # version; that needs the lance package).  The scan, verdicts,
    # violations and sketches all work unchanged off the column.
    lance_input = isinstance(docs_dir, str) and is_lance_dataset(docs_dir)

    parts = {} if lance_input else discover_partitions(docs_dir)
    manifest = Manifest(out_dir, PLAN_FINGERPRINT) if (out_dir and not lance_input) else None
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
        if lance_input:
            shutil.rmtree(viol_root, ignore_errors=True)
        for pid in todo:
            shutil.rmtree(os.path.join(viol_root, f"partition_id={pid}"), ignore_errors=True)

    if not todo and not lance_input:
        # no-op resume: reload verdicts WITH the persisted dataset-level
        # duplicate count — a run that failed on duplicate doc_ids must not
        # flip to all_pass just because nothing was re-scanned
        dup_prev = int(manifest.dataset_metrics().get("n_dup_doc_ids", 0)) if manifest else 0
        verdicts = _load_verdicts_from_manifest(manifest, dup_prev)
        _restore_headroom()
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
    # Block-split heuristic: Ray's default read parallelism follows the
    # file count (hive layouts often have few, large files — 64 × 100k-row
    # blocks here), which leaves CPUs in coarse waves with straggler tails
    # and giant per-task working sets.  Splitting to ~16 blocks per CPU
    # measured 4.7× on the 6M-doc corpus at 32 CPUs (50.5 s → 10.7 s scan).
    t = time.time()
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    if lance_input:
        # Lance scan: the dataset carries partition_id as a column and the
        # fragment planner owns block sizing (read_lance has no
        # override_num_blocks); column projection is pushed down.
        ds = read_auto(docs_dir)
        hive_layout = True  # partition_id arrives as a real column
        fused_scan = False  # Lance fragment planner owns block sizing
    else:
        # FUSED SCAN (default when the layout has ≥2 files per CPU): one
        # read block per file and no map-side batch_size lets Ray Data fuse
        # ReadParquet->MapBatches(validate) into ONE task — decode +
        # validate in-process, no intermediate materialization of the
        # decoded corpus through the object store.  Fusion is blocked by
        # either an additional read split factor (override_num_blocks >
        # file count) or a batch_size (min_rows_per_bundled_input), so the
        # fused path sets neither; block size stays bounded by the parquet
        # row-group size × DataContext.target_max_block_size.  Measured
        # same-phase at mult=2/regex: T32 6.0→4.5 s, T8 14.6→11.4 s (the
        # saved pass over ~2.8 GB decoded text is the memory bandwidth this
        # host doesn't scale).  Few-large-file layouts keep the auto-split
        # plan: per-file tasks would leave CPUs idle, which costs more than
        # the extra pass (the round-2 4.7× straggler measurement).
        env = os.environ.get("JSR_FUSED_SCAN")
        fused_scan = (env != "0") if env is not None else (
            len(all_files) >= 2 * n_cpus
        )
        timings["fused_scan"] = float(fused_scan)  # plan flag (tested)
        if fused_scan:
            nblocks = len(all_files)
            batch_size = None  # any batch_size would re-split the stages
        else:
            nblocks = _auto_blocks(all_files, n_cpus)
        ds = rd.read_parquet(all_files, override_num_blocks=nblocks)
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

    # direct-write mode (default with an out_dir): each scan task writes its
    # violation rows itself into the hive layout (side output, idempotent
    # content-named files) — ONE pass over the input, tiny result stream,
    # driver memory independent of violation count.  The hash-referential
    # strategy keeps the stream mode because its dangling rows join the
    # violation stream after the scan.
    direct_write = viol_root is not None and referential_strategy == "broadcast"
    viol_dir = viol_root if direct_write else None

    # FOLDED uniqueness (the default full-run path): the scan itself emits
    # per-batch value_counts(doc_id) partials ('uniq' rows), and one raw-task
    # pass over the scan's OUTPUT blocks routes them to hash-bucket reducers
    # (stages/shuffle.find_duplicate_keys_folded).  Kills the second parquet
    # read and its whole dataset execution — on a resume that skips
    # partitions the fold is invalid (uniqueness is a cross-partition
    # property and must also cover files the scan won't re-read), so the
    # concurrent narrow-read path below remains for that case.
    fold_uniq = (
        check_unique
        and direct_write
        and not lance_input
        and set(todo) == set(parts)
        and os.environ.get("JSR_FOLD_UNIQ", "1") != "0"  # A/B kill-switch
    )

    # non-fold path: uniqueness runs CONCURRENTLY with the wide scan
    # (independent narrow read, column-pruned to doc_id): the streaming
    # executor interleaves both dataset executions, so the shuffle's latency
    # hides behind the read-bound scan instead of serializing after it.
    # It scans ALL partitions' files (not just the pending ones): uniqueness
    # is a cross-partition dataset property, and a resume that read only the
    # pending files would miss duplicates spanning completed partitions.
    uniq_future = None
    if check_unique and not fold_uniq:
        from concurrent.futures import ThreadPoolExecutor

        _uniq_pool = ThreadPoolExecutor(max_workers=1)
        uniq_files = [f for files in parts.values() for f in files]

        def _run_uniqueness():
            if lance_input:
                key_ds = read_auto(docs_dir, columns=["doc_id"])
            else:
                key_ds = rd.read_parquet(uniq_files, columns=["doc_id"])
            return find_duplicate_keys(key_ds, "doc_id", n_salts=n_salts)

        uniq_start = time.time()
        uniq_future = _uniq_pool.submit(_run_uniqueness)

    if use_actors:
        # actor pool: catalog loaded once per actor in __init__
        results_ds = ds.map_batches(
            SpanValidator,
            fn_constructor_kwargs={
                "catalog_ref": catalog_ref,
                "viol_dir": viol_dir,
                "extended_checks": extended_checks,
                "emit_uniq": fold_uniq,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency or 4,
            num_cpus=1,
        )
    else:
        # task pool (default): elastic over all CPUs, reuses the warm worker
        # processes (no per-actor cold start); the broadcast catalog is
        # ray.get-cached per worker process (module-level cache)
        results_ds = ds.map_batches(
            _task_validator(catalog_ref, viol_dir, extended_checks, fault_marker,
                            emit_uniq=fold_uniq),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )

    n_viol = 0
    viol_ds = None
    dup_tbl_fold = None
    if direct_write:
        if fold_uniq:
            # single pass: the streaming scan's output blocks feed the
            # uniqueness mappers as they are produced; aux rows come back
            # with the same tasks — no second dataset execution at all
            from ..stages.shuffle import find_duplicate_keys_folded

            uniq_start = time.time()
            dup_tbl_fold, aux_tbl, scan_done = find_duplicate_keys_folded(
                results_ds, key="doc_id", cnt_col="n_docs",
                group_size=1 if fused_scan else 8,
            )
            timings["scan_validate"] = scan_done - t
            timings["uniqueness_shuffle"] = time.time() - uniq_start
            timings["uniqueness_join_wait"] = time.time() - scan_done
            aux = aux_tbl.to_pandas() if aux_tbl is not None else pd.DataFrame()
        else:
            aux = results_ds.to_pandas()  # partials + sketches only: tiny
            timings["scan_validate"] = time.time() - t
        if aux.empty and "record_type" not in aux.columns:  # zero-row input
            aux = pd.DataFrame(
                columns=["record_type", "partition_id", "constraint_id", "n_docs",
                         "n_bad", "feature", "sketch_kind", "blob"]
            )
        partials = aux[aux["record_type"] == "partial"][
            ["partition_id", "constraint_id", "n_docs", "n_bad"]
        ]
        sk_df = aux[aux["record_type"] == "sketch"][["feature", "sketch_kind", "blob"]]
        n_viol = int(partials.loc[partials["constraint_id"] == "__viol_rows__", "n_bad"].sum())
        partials = partials[partials["constraint_id"] != "__viol_rows__"]
    else:
        # stream mode: materialize the results ONCE, split by record type;
        # violations stay a distributed Dataset written by Ray workers
        res = results_ds.materialize()
        timings["scan_validate"] = time.time() - t

        def _kind(ds_, k):
            return ds_.map_batches(
                lambda b, _k=k: b.filter(pc.equal(b["record_type"], _k)),
                batch_format="pyarrow",
            )

        aux = res.map_batches(
            lambda b: b.filter(pc.not_equal(b["record_type"], "violation")).select(
                ["record_type", "partition_id", "constraint_id", "n_docs", "n_bad",
                 "feature", "sketch_kind", "blob"]
            ),
            batch_format="pyarrow",
        ).to_pandas()
        partials = aux[aux["record_type"] == "partial"][
            ["partition_id", "constraint_id", "n_docs", "n_bad"]
        ]
        sk_df = aux[aux["record_type"] == "sketch"][["feature", "sketch_kind", "blob"]]
        viol_ds = _kind(res, "violation").materialize()

    # -------- hash-partitioned referential semi-join (large catalogs) ----
    if catalog_path and referential_strategy in ("hash", "hash_distinct"):
        from ..stages.referential import (
            hash_referential_dangling,
            hash_referential_dangling_distinct,
        )
        from ..stages.validate import CONSTRAINT_META

        REF_CID = "spans[].media_ref/referential"
        meta = CONSTRAINT_META[REF_CID]
        _ref_fn = (
            hash_referential_dangling_distinct
            if referential_strategy == "hash_distinct"
            else hash_referential_dangling
        )
        dangling_ds = _ref_fn(ds, catalog_path, collect=False).materialize()
        scan_viol_ds = viol_ds  # scan-only violations (pre-union, materialized)

        def to_viol(b: pa.Table) -> pa.Table:
            k = len(b)
            msg = pc.binary_join_element_wise(
                pa.array([meta[2]] * k),
                b["media_ref"].fill_null("null"),
                pa.array([meta[3]] * k),
                "",
            )
            return pa.table(
                {
                    "record_type": pa.array(["violation"] * k),
                    "partition_id": pc.cast(b["partition_id"], pa.int32()),
                    "doc_id": b["doc_id"],
                    "span_index": pc.cast(b["span_index"], pa.int32()),
                    "constraint_id": pa.array([REF_CID] * k),
                    "error_type": pa.array([meta[0]] * k),
                    "expected": pa.array([meta[1]] * k),
                    "actual": pc.cast(b["media_ref"], pa.string()),
                    "message": msg,
                    "n_docs": pa.array(np.zeros(k, dtype=np.int64)),
                    "n_bad": pa.array(np.zeros(k, dtype=np.int64)),
                    "feature": pa.array([None] * k, type=pa.string()),
                    "sketch_kind": pa.array([None] * k, type=pa.string()),
                    "blob": pa.array([None] * k, type=pa.binary()),
                }
            )

        viol_ds = viol_ds.union(dangling_ds.map_batches(to_viol, batch_format="pyarrow"))

        # partial adjustments, computed DISTRIBUTED (the dangling/bad doc
        # sets can be huge): union the narrow (partition, doc, src) keys,
        # per-doc groupby decides "newly bad", per-partition Sum reduces to
        # one tiny row per partition for the driver.  (Scan-side doc set is
        # derived from the cap-bounded violation rows — same approximation
        # the driver-side version had.)
        def _keys(ds_, src):
            return ds_.map_batches(
                lambda b, _s=src: pa.table(
                    {
                        "partition_id": pc.cast(b["partition_id"], pa.int32()),
                        "doc_id": b["doc_id"],
                        "src": pa.array([_s] * len(b)),
                    }
                ),
                batch_format="pyarrow",
            )

        def add_bucket(b: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(b["doc_id"].to_pandas(), index=False).to_numpy()
            return b.append_column("bucket", pa.array((h % 64).astype(np.int32)))

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized pandas pass per 64-way bucket — NOT one tiny
            # group per (partition, doc), which melts at violation scale
            flags = (
                g.assign(is_ref=g["src"] == "ref", is_scan=g["src"] == "scan")
                .groupby(["partition_id", "doc_id"], sort=False)[["is_ref", "is_scan"]]
                .any()
            )
            flags["new_bad"] = flags["is_ref"] & ~flags["is_scan"]
            out = (
                flags.reset_index()
                .groupby("partition_id", sort=False)
                .agg(ref=("is_ref", "sum"), new_bad=("new_bad", "sum"))
                .reset_index()
            )
            return out.astype({"ref": np.int64, "new_bad": np.int64})

        per_part = (
            _keys(scan_viol_ds, "scan")
            .union(_keys(dangling_ds, "ref"))
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("partition_id")
            .aggregate(Sum("ref", alias_name="n_ref"), Sum("new_bad", alias_name="n_new"))
            .to_pandas()
        )
        extra_rows = []
        for _, r in per_part.iterrows():
            if r["n_ref"]:
                extra_rows.append(
                    {"partition_id": int(r["partition_id"]), "constraint_id": REF_CID,
                     "n_docs": 0, "n_bad": int(r["n_ref"])}
                )
            if r["n_new"]:
                extra_rows.append(
                    {"partition_id": int(r["partition_id"]), "constraint_id": "__all__",
                     "n_docs": 0, "n_bad": int(r["n_new"])}
                )
        if extra_rows:
            partials = pd.concat([partials, pd.DataFrame(extra_rows)], ignore_index=True)
    if viol_ds is not None:
        n_viol = viol_ds.count()

    # ---------------- stage 2: uniqueness shuffle (join) ----------------
    dup_tbl = None
    if fold_uniq:
        dup_tbl = dup_tbl_fold  # already reduced alongside the scan
    elif uniq_future is not None:
        t = time.time()
        dup_tbl = uniq_future.result()
        _uniq_pool.shutdown(wait=False)
        timings["uniqueness_join_wait"] = time.time() - t
        timings["uniqueness_shuffle"] = time.time() - uniq_start

    # ---------------- stage 3: sketch merge ----------------------------
    # "auto": two-level Ray tree merge only when the partial-blob count
    # justifies a distributed job; below that the driver merge is faster
    # (no stage-launch latency)
    t = time.time()
    if distributed_sketch_merge == "auto":
        distributed_sketch_merge = len(sk_df) > 2000
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
    if viol_root and n_viol and viol_ds is not None:
        # stream mode: distributed partitioned write — Ray workers write
        # hive-layout parquet per partition_id; the driver never holds
        # violation rows.  (Direct-write mode already wrote them in-scan.)
        viol_cols = [
            "partition_id", "doc_id", "span_index", "constraint_id",
            "error_type", "expected", "actual", "message",
        ]
        viol_ds.map_batches(
            lambda b: b.select(viol_cols), batch_format="pyarrow"
        ).write_parquet(viol_root, partition_cols=["partition_id"])

    dup_docs_total = 0
    if dup_tbl is not None and len(dup_tbl):
        dup_docs_total = len(set(dup_tbl["doc_id"].to_pylist()))
    elif not check_unique and manifest is not None:
        dup_docs_total = int(manifest.dataset_metrics().get("n_dup_doc_ids", 0))

    verdict_pids = (
        sorted(int(p) for p in partials["partition_id"].unique())
        if lance_input and len(partials)
        else todo.keys()
    )
    verdicts, per_part_metrics = _build_verdicts(partials, dup_docs_total, verdict_pids)
    # merge with the completed partitions' manifest rows (with the FRESH
    # dup count — the uniqueness scan covered all files) so a resumed run's
    # verdicts.parquet keeps every partition instead of dropping finished ones
    if manifest is not None and skipped:
        prev = _load_verdicts_from_manifest(manifest, dup_docs_total, exclude=set(todo))
        if len(prev):
            verdicts = pa.concat_tables([verdicts, prev]).sort_by("partition_id")

    if out_dir:
        pq.write_table(verdicts, os.path.join(out_dir, "verdicts.parquet"))
        _save_profile(profile, os.path.join(out_dir, "profile.json"))
        if drift is not None:
            pq.write_table(drift, os.path.join(out_dir, "drift.parquet"))
    if manifest is not None:
        for pid, files in todo.items():
            manifest.complete(pid, files, per_part_metrics.get(pid, {}))
        if check_unique:
            manifest.set_dataset_metrics({"n_dup_doc_ids": dup_docs_total})
    timings["write"] = time.time() - t
    timings["total"] = time.time() - t0

    _restore_headroom()
    return ValidationReport(
        verdicts, viol_root, n_viol, profile, drift, skipped, timings
    )


def _pid_from_path(p: str) -> int:
    m = re.search(r"partition_id=(\d+)", p)
    return int(m.group(1)) if m else 0


def _build_verdicts(partials: pd.DataFrame, dup_docs_total: int, pids) -> tuple[pa.Table, dict]:
    rows = []
    metrics: dict[int, dict] = {}
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


def _load_verdicts_from_manifest(
    manifest: Manifest | None, dup_docs_total: int = 0, exclude: set | None = None
) -> pa.Table:
    """Verdict rows for manifest-completed partitions.  ``dup_docs_total``
    is the (dataset-level) duplicate-doc_id count — persisted across runs
    in the manifest's dataset metrics, so a no-op resume of a run that
    failed on duplicates still reports ``pass=False``."""
    rows = []
    if manifest is not None:
        for pid, e in sorted(manifest.completed().items()):
            if exclude and pid in exclude:
                continue
            m = e.get("metrics", {})
            rows.append(
                {
                    "partition_id": int(pid),
                    "n_docs": int(m.get("n_docs", 0)),
                    "n_bad_docs": int(m.get("n_bad_docs", 0)),
                    "n_dup_doc_ids": int(dup_docs_total),
                    "pass": bool(m.get("n_bad_docs", 0) == 0 and dup_docs_total == 0),
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
